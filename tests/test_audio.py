"""DSP front-end tests: mel filterbank and STFT against independent golden
references (torch/scipy), plus the reference implementation's shape quirks."""

import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.audio.mel import MelSpec, hanning, log_mel_spectrogram, mel_filters, stft


def test_mel_filters_match_torchaudio_formula():
    """HTK filterbank must match the torch-compatible construction."""
    torch = pytest.importorskip("torch")
    fb = mel_filters(24_000, 1024, 100, norm=None, mel_scale="htk")
    assert fb.shape == (100, 513)

    # independent torch reconstruction (same math as torchaudio.functional)
    all_freqs = torch.linspace(0, 24_000 // 2, 513)
    m_min = 2595.0 * np.log10(1.0 + 0 / 700.0)
    m_max = 2595.0 * np.log10(1.0 + 12_000 / 700.0)
    m_pts = torch.linspace(m_min, m_max, 102)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = (-slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    golden = torch.clamp(torch.min(down, up), min=0.0).T.numpy()

    np.testing.assert_allclose(fb, golden, atol=3e-5)


def test_hanning_periodic():
    w = hanning(1024)
    assert w.shape == (1024,)
    np.testing.assert_allclose(w, np.hanning(1025)[:-1], atol=1e-7)
    assert w[0] == 0.0


def test_stft_matches_scipy():
    scipy_signal = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    window = jnp.asarray(hanning(1024))
    got = np.asarray(stft(jnp.asarray(x), window, nperseg=1024, noverlap=256))

    # scipy reference: constant zero-padding of nperseg//2, hop 256
    xp = np.pad(x, (512, 512))
    frames = np.lib.stride_tricks.sliding_window_view(xp, 1024)[::256]
    golden = np.fft.rfft(frames * np.hanning(1025)[:-1], axis=-1)
    n = min(len(golden), len(got))
    np.testing.assert_allclose(got[:n], golden[:n], atol=1e-2, rtol=1e-4)


def test_log_mel_shapes_and_batch():
    """frames == len // hop with the reference's drop-last-frame arithmetic
    (reference: audio.py:202)."""
    rng = np.random.default_rng(1)
    for length in (24_000, 24_000 + 100, 4096):
        audio = jnp.asarray(rng.standard_normal(length).astype(np.float32))
        mel = log_mel_spectrogram(audio)
        assert mel.shape == (1, length // 256, 100)

    batch = jnp.asarray(rng.standard_normal((3, 8192)).astype(np.float32))
    mel = log_mel_spectrogram(batch)
    assert mel.shape == (3, 8192 // 256, 100)
    # batch items are independent
    single = log_mel_spectrogram(batch[1])
    np.testing.assert_allclose(mel[1], single[0], atol=1e-5)


def test_log_mel_floor():
    mel = log_mel_spectrogram(jnp.zeros(4096))
    np.testing.assert_allclose(np.asarray(mel), np.log(1e-5), atol=1e-6)


def test_log_mel_matches_torch_pipeline():
    """End-to-end parity with a torch STFT+mel reconstruction of the reference
    semantics (center-pad constant, hann window, drop last frame, log 1e-5)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(24_000).astype(np.float32)

    got = np.asarray(log_mel_spectrogram(jnp.asarray(x)))[0]

    xt = torch.from_numpy(np.pad(x, (512, 512)))
    frames = xt.unfold(0, 1024, 256)  # [t, 1024]
    win = torch.from_numpy(np.hanning(1025)[:-1].astype(np.float32))
    spec = torch.fft.rfft(frames * win, dim=-1)
    mag = spec.abs()[:-1]
    fb = torch.from_numpy(mel_filters(24_000, 1024, 100))
    golden = torch.log(torch.clamp(mag @ fb.T, min=1e-5)).numpy()

    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, atol=2e-4, rtol=1e-4)


def test_melspec_class():
    m = MelSpec()
    out = m(jnp.zeros((2, 5120)))
    assert out.shape == (2, 20, 100)
