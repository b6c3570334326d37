"""STFT / log-mel front-end, XLA-native.

Behavioral parity with reference: audio.py (torch-compatible HTK filterbank,
Hann window computed as np.hanning(n+1)[:-1], constant-pad of n_fft//2 on both
sides, drop-last-frame quirk at audio.py:202, log floor 1e-5). The reference
loops over the batch in Python (audio.py:195-206); here the batch is vmapped
and everything runs on device through `jnp.fft.rfft`, which lowers to the
native XLA TPU FFT.

Output layout is [b, frames, n_mels] — the layout every real call site in the
reference consumes (cfm.py:283-286 asserts last dim == n_mels; the data
pipeline produces [1, frames, mels], data.py:81-86).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import AudioConfig


@lru_cache(maxsize=None)
def mel_filters(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    norm: str | None = None,
    mel_scale: str = "htk",
) -> np.ndarray:
    """Torch-compatible mel filterbank, shape [n_mels, n_fft//2 + 1]
    (reference: audio.py:12-98). Computed host-side once and cached."""

    def hz_to_mel(freq: float) -> float:
        if mel_scale == "htk":
            return 2595.0 * math.log10(1.0 + freq / 700.0)
        f_sp = 200.0 / 3
        mels = freq / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        if freq >= min_log_hz:
            mels = min_log_mel + math.log(freq / min_log_hz) / logstep
        return mels

    def mel_to_hz(mels: np.ndarray) -> np.ndarray:
        if mel_scale == "htk":
            return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
        f_sp = 200.0 / 3
        freqs = f_sp * mels
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = math.log(6.4) / 27.0
        log_t = mels >= min_log_mel
        freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
        return freqs

    f_max = f_max or sample_rate / 2
    n_freqs = n_fft // 2 + 1
    # note: integer-division nyquist endpoint, matching the reference
    # (audio.py:71) and torchaudio.
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs, dtype=np.float32)

    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2, dtype=np.float32)
    f_pts = mel_to_hz(m_pts).astype(np.float32)

    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]

    down_slopes = (-slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]

    return np.ascontiguousarray(fb.T.astype(np.float32))  # [n_mels, n_freqs]


@lru_cache(maxsize=None)
def hanning(size: int) -> np.ndarray:
    """Periodic Hann window (reference: audio.py:101-112)."""
    return np.hanning(size + 1)[:-1].astype(np.float32)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Overlapping frames of a 1D signal -> [num_frames, frame_length].

    The TPU-native replacement for the reference's `mx.as_strided` framing
    (audio.py:155-158): a static gather XLA turns into efficient dynamic
    slices. num_frames follows the reference arithmetic
    t = (len - frame_length + hop) // hop.
    """
    num_frames = (x.shape[0] - frame_length + hop) // hop
    idx = jnp.arange(num_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
    return x[idx]


def stft(
    x: jax.Array,
    window: jax.Array,
    nperseg: int = 256,
    noverlap: int | None = None,
    nfft: int | None = None,
) -> jax.Array:
    """STFT of a 1D signal -> complex [frames, nfft//2 + 1]
    (reference: audio.py:115-159; constant zero padding of nperseg//2)."""
    if nfft is None:
        nfft = nperseg
    if noverlap is None:
        noverlap = nfft // 4
    padding = nperseg // 2
    x = jnp.pad(x, (padding, padding))
    frames = frame_signal(x, nperseg, noverlap)
    if nfft > nperseg:
        frames = jnp.pad(frames, ((0, 0), (0, nfft - nperseg)))
    return jnp.fft.rfft(frames * window[None, :nperseg].astype(frames.dtype))


def _log_mel_one(audio: jax.Array, filters: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    window = jnp.asarray(hanning(n_fft))
    freqs = stft(audio, window, nperseg=n_fft, noverlap=hop_length)
    # drop-last-frame quirk kept for bit-parity (reference: audio.py:202)
    magnitudes = jnp.abs(freqs[:-1, :])
    mel_spec = magnitudes @ filters.T
    return jnp.log(jnp.maximum(mel_spec, 1e-5))


@partial(jax.jit, static_argnames=("sample_rate", "n_mels", "n_fft", "hop_length", "padding"))
def log_mel_spectrogram(
    audio: jax.Array,
    sample_rate: int = 24_000,
    n_mels: int = 100,
    n_fft: int = 1024,
    hop_length: int = 256,
    padding: int = 0,
) -> jax.Array:
    """Batched log-mel spectrogram: [t] or [b, t] -> [b, frames, n_mels]
    (reference: audio.py:162-210, vmapped instead of the per-item Python loop).

    frames == len(audio) // hop_length for the reference arithmetic.
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    if padding > 0:
        audio = jnp.pad(audio, ((0, 0), (0, padding)))
    filters = jnp.asarray(
        mel_filters(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels, norm=None, mel_scale="htk")
    )
    return jax.vmap(lambda a: _log_mel_one(a, filters, n_fft, hop_length))(audio)


class MelSpec:
    """Callable front-end bound to an AudioConfig (reference: audio.py:213-230)."""

    def __init__(
        self,
        sample_rate: int = 24_000,
        n_fft: int = 1024,
        hop_length: int = 256,
        n_mels: int = 100,
    ):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels

    @classmethod
    def from_config(cls, cfg: AudioConfig) -> "MelSpec":
        return cls(cfg.sample_rate, cfg.n_fft, cfg.hop_length, cfg.n_mels)

    def __call__(self, audio: jax.Array) -> jax.Array:
        return log_mel_spectrogram(
            audio,
            sample_rate=self.sample_rate,
            n_mels=self.n_mels,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
        )
