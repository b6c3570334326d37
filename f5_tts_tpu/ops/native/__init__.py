"""ctypes bindings for the native C++ WAV decoder (libf5native.so).

Auto-builds with g++ on first import when the shared library is missing (a
few hundred ms, cached next to the sources). Importing this module raises
ImportError when no toolchain/library is available — callers fall back to the
pure-Python decoder (see data/libritts.py:_read_audio)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libf5native.so"


def _ensure_built() -> Path:
    if _SO.exists():
        return _SO
    tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
             "-o", str(tmp), str(_DIR / "wav_decoder.cpp")],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _SO)  # atomic: concurrent builders can't corrupt the .so
    except (OSError, subprocess.CalledProcessError) as e:
        tmp.unlink(missing_ok=True)
        raise ImportError(f"could not build libf5native.so: {e}") from e
    return _SO


try:
    _lib = ctypes.CDLL(str(_ensure_built()))
except OSError as e:  # corrupt/foreign-arch .so: surface as "unavailable"
    raise ImportError(f"libf5native.so unusable: {e}") from e

_lib.f5_wav_decode.restype = ctypes.c_int
_lib.f5_wav_decode.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.f5_wav_decode_batch.restype = ctypes.c_int
_lib.f5_wav_decode_batch.argtypes = [
    ctypes.POINTER(ctypes.c_char_p),
    ctypes.c_int32,
    ctypes.c_int32,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.f5_free.argtypes = [ctypes.POINTER(ctypes.c_float)]


def _take(ptr, num_frames: int, channels: int) -> np.ndarray:
    count = num_frames * channels
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    _lib.f5_free(ptr)
    if channels > 1:
        arr = arr.reshape(num_frames, channels)
    return arr


def wav_decode(path: str) -> tuple[np.ndarray, int]:
    """Decode one WAV -> (float32 samples [n] or [n, c], sample_rate)."""
    samples = ctypes.POINTER(ctypes.c_float)()
    num_frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    sample_rate = ctypes.c_int32()
    rc = _lib.f5_wav_decode(
        str(path).encode(), ctypes.byref(samples), ctypes.byref(num_frames),
        ctypes.byref(channels), ctypes.byref(sample_rate),
    )
    if rc != 0:
        raise ValueError(f"failed to decode {path} (rc={rc})")
    return _take(samples, num_frames.value, channels.value), sample_rate.value


def wav_decode_batch(
    paths: list[str], num_threads: int = 8
) -> list[tuple[np.ndarray, int] | None]:
    """Threaded batch decode; failed entries come back as None."""
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    samples = (ctypes.POINTER(ctypes.c_float) * n)()
    num_frames = (ctypes.c_int64 * n)()
    channels = (ctypes.c_int32 * n)()
    rates = (ctypes.c_int32 * n)()
    _lib.f5_wav_decode_batch(c_paths, n, num_threads, samples, num_frames, channels, rates)
    out: list[tuple[np.ndarray, int] | None] = []
    for i in range(n):
        if num_frames[i] < 0 or not samples[i]:
            out.append(None)
        else:
            out.append((_take(samples[i], num_frames[i], channels[i]), rates[i]))
    return out
