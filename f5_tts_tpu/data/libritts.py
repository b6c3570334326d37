"""LibriTTS-R dataset: download, extraction, directory scanning, decode.

Behavioral parity with reference: data.py:27-213 (openslr URLs + md5
validation, sibling `.normalized.txt` transcripts, file-size duration filter,
byte-level transcript ids)."""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tarfile
import urllib.request
from pathlib import Path

import numpy as np

from f5_tts_tpu.data.loader import BYTE_VOCAB, SAMPLE_RATE, Stream
from f5_tts_tpu.utils.tokenizer import list_str_to_idx

CACHE_DIR = Path(os.environ.get("F5_TTS_CACHE", Path.home() / ".cache" / "f5_tts_tpu"))

SPLITS = {
    "dev-clean": (
        "https://www.openslr.org/resources/141/dev_clean.tar.gz",
        "2c1f5312914890634cc2d15783032ff3",
    ),
    "dev-other": (
        "https://www.openslr.org/resources/141/dev_other.tar.gz",
        "62d3a80ad8a282b6f31b3904f0507e4f",
    ),
    "test-clean": (
        "https://www.openslr.org/resources/141/test_clean.tar.gz",
        "4d373d453eb96c0691e598061bbafab7",
    ),
    "test-other": (
        "https://www.openslr.org/resources/141/test_other.tar.gz",
        "dbc0959d8bdb6d52200595cabc9995ae",
    ),
    "train-clean-100": (
        "https://www.openslr.org/resources/141/train_clean_100.tar.gz",
        "6df668d8f5f33e70876bfa33862ad02b",
    ),
    "train-clean-360": (
        "https://www.openslr.org/resources/141/train_clean_360.tar.gz",
        "382eb3e64394b3da6a559f864339b22c",
    ),
    "train-other-500": (
        "https://www.openslr.org/resources/141/train_other_500.tar.gz",
        "a37a8e9f4fe79d20601639bf23d1add8",
    ),
}


def _md5(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def load_libritts_r_tarfile(
    root=None, split: str = "dev-clean", quiet: bool = False, validate_download: bool = True
) -> Path:
    """Fetch the LibriTTS-R tar for a split; returns the decompressed tar path
    (reference: data.py:123-166)."""
    if split not in SPLITS:
        raise ValueError(
            f"Unknown libritts_r split '{split}'. It should be one of [{', '.join(SPLITS)}]"
        )
    root = Path(root) if root is not None else CACHE_DIR / "libritts_r"
    root.mkdir(parents=True, exist_ok=True)

    url, target_hash = SPLITS[split]
    filename = Path(url).name
    target_compressed = root / filename
    target = root / filename.replace(".gz", "")

    if not target.is_file():
        if not target_compressed.is_file():
            if not quiet:
                print(f"Downloading {url} ...")
            urllib.request.urlretrieve(url, target_compressed)
            if validate_download and _md5(target_compressed) != target_hash:
                raise RuntimeError(
                    f"[libritts_r] File download corrupted: md5sums don't match. "
                    f"Please manually delete {target_compressed}."
                )
        with gzip.open(target_compressed, "rb") as fin, open(target, "wb") as fout:
            shutil.copyfileobj(fin, fout)
        target_compressed.unlink()
    return target


def load_libritts_r(
    root=None,
    split: str = "dev-clean",
    quiet: bool = False,
    validate_download: bool = True,
    max_duration: float = 30,
) -> tuple[Stream, Path]:
    """Download + extract + scan a LibriTTS-R split (reference: data.py:169-194)."""
    target = load_libritts_r_tarfile(
        root=root, split=split, quiet=quiet, validate_download=validate_download
    )
    path = target.parent / "LibriTTS_R" / split
    if not path.exists():
        with tarfile.open(target) as tar:
            tar.extractall(path=target.parent)
    return load_dir(path, max_duration=max_duration), path


def wav_duration_from_size(path: Path) -> float:
    """File-size duration heuristic: 16-bit mono 24 kHz assumed
    (reference: data.py:36-47)."""
    bytes_per_second = SAMPLE_RATE * 2
    return os.path.getsize(path) / bytes_per_second


def scan_samples(dir: Path, max_duration: float = 30) -> list[dict]:
    """All .wav files with sibling .normalized.txt transcripts, duration-filtered."""
    out = []
    for wav in sorted(Path(dir).rglob("*.wav")):
        transcript = wav.with_suffix(".normalized.txt")
        if not transcript.exists():
            continue
        if wav_duration_from_size(wav) > max_duration:
            continue
        out.append({"file": wav, "transcript_file": transcript})
    return out


def decode_sample(sample: dict) -> dict | None:
    """Decode one scanned sample into {"audio", "transcript"} arrays.

    Uses the native C++ decoder when built (ops/native), else the stdlib WAV
    reader. Transcripts become byte-level ids (reference: data.py:52,65)."""
    try:
        text = Path(sample["transcript_file"]).read_text().strip()
        audio, sr = _read_audio(sample["file"])
    except (OSError, ValueError):
        return None
    if sr != SAMPLE_RATE:
        return None
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    transcript = list_str_to_idx(text, BYTE_VOCAB)[0]
    return {"audio": audio.astype(np.float32), "transcript": transcript.astype(np.int32)}


def _read_audio(path) -> tuple[np.ndarray, int]:
    try:
        from f5_tts_tpu.ops.native import wav_decode

        return wav_decode(str(path))
    except ImportError:
        from f5_tts_tpu.audio.io import read_wav

        return read_wav(path)


def load_dir(dir, max_duration: float = 30) -> Stream:
    """Scanned-sample stream for a directory tree (reference: data.py:197-213).
    Pipe through data.loader.make_training_pipeline for batches."""
    samples = scan_samples(Path(dir).expanduser(), max_duration=max_duration)
    print(f"Found {len(samples)} files at {dir}")
    return Stream.from_list(samples)
