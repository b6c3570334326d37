"""Vocos vocoder and ISTFT tests."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.audio.istft import istft
from f5_tts_tpu.audio.mel import hanning, stft
from f5_tts_tpu.config import VocosConfig
from f5_tts_tpu.models.vocos import Vocos, init_vocos, vocos_decode

TINY = VocosConfig(dim=64, intermediate_dim=128, num_layers=2)


def test_istft_roundtrip():
    """stft -> istft must reconstruct the signal (COLA holds for hann @ hop=n/4)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    window = jnp.asarray(hanning(1024))
    spec = stft(jnp.asarray(x), window, nperseg=1024, noverlap=256)  # [t, 513]
    y = istft(spec[None], window, n_fft=1024, hop_length=256)
    y = np.asarray(y)[0]
    assert y.shape == (4096,)
    np.testing.assert_allclose(y, x, atol=1e-3, rtol=1e-3)


def test_istft_matches_torch():
    torch = None
    try:
        import torch
    except ImportError:
        import pytest

        pytest.skip("torch unavailable")
    rng = np.random.default_rng(1)
    frames = 24
    spec_np = (
        rng.standard_normal((1, frames, 513)) + 1j * rng.standard_normal((1, frames, 513))
    ).astype(np.complex64)
    window = hanning(1024)

    got = np.asarray(istft(jnp.asarray(spec_np), jnp.asarray(window), 1024, 256))

    golden = torch.istft(
        torch.from_numpy(spec_np).transpose(1, 2),  # torch wants [b, freq, frames]
        n_fft=1024,
        hop_length=256,
        win_length=1024,
        window=torch.from_numpy(window),
        center=True,
    ).numpy()
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, atol=1e-4, rtol=1e-3)


def test_vocos_output_shape_and_finite():
    v = Vocos.init(jax.random.key(0), TINY)
    mel = jax.random.normal(jax.random.key(1), (2, 32, 100))
    wave = v.decode(mel)
    assert wave.shape == (2, 31 * 256)
    assert np.isfinite(np.asarray(wave)).all()


def test_vocos_batch_independence():
    v = Vocos.init(jax.random.key(0), TINY)
    mel = jax.random.normal(jax.random.key(2), (2, 16, 100))
    both = np.asarray(v.decode(mel))
    one = np.asarray(v.decode(mel[1:]))
    np.testing.assert_allclose(both[1], one[0], atol=1e-4)


def test_vocos_jit_cache():
    """decode is jitted on (params, cfg, shape) — same shape shouldn't retrace."""
    v = Vocos.init(jax.random.key(0), TINY)
    mel = jax.random.normal(jax.random.key(3), (1, 16, 100))
    v.decode(mel)
    n0 = vocos_decode._cache_size()
    v.decode(mel + 1)
    v.decode(mel * 2)
    assert vocos_decode._cache_size() == n0


def test_istft_valid_frames_matches_trimmed():
    """istft(padded spec, valid_frames=k) == istft(spec[:, :k]) over the
    first (k-1)*hop samples — the invariant the fused bucket-length vocoder
    path relies on (models/cfm.cfm_sample_e2e)."""
    rng = np.random.default_rng(3)
    frames, k = 24, 17
    spec = jnp.asarray(
        rng.standard_normal((2, frames, 513)) + 1j * rng.standard_normal((2, frames, 513))
    )
    window = jnp.asarray(hanning(1024))
    full = istft(spec, window, 1024, 256, valid_frames=jnp.int32(k))
    trimmed = istft(spec[:, :k], window, 1024, 256)
    np.testing.assert_allclose(
        np.asarray(full)[:, : (k - 1) * 256], np.asarray(trimmed), atol=1e-10
    )


def test_vocos_valid_frames_matches_trimmed_decode():
    """Bucket-padded decode with valid_frames reproduces the trimmed decode
    exactly: zero-padding past k matches SAME conv padding, and the ISTFT
    envelope is masked.

    The layer norms get NONZERO biases first: pretrained checkpoints have
    them, and a bias turns masked-zero tail rows back into `bias` — if the
    mask is applied before a norm instead of after, the first dwconv leaks
    the tail into the last valid frames (init zeroes biases, which would hide
    exactly that bug)."""
    voc = Vocos.init(jax.random.key(2), TINY)
    rng = np.random.default_rng(1)

    def bias_norms(p):
        if isinstance(p, dict):
            if "scale" in p and "bias" in p:
                p["bias"] = jnp.asarray(rng.standard_normal(p["bias"].shape, np.float32) * 0.1)
            else:
                for v in p.values():
                    bias_norms(v)
        elif isinstance(p, list):
            for v in p:
                bias_norms(v)

    bias_norms(voc.params["norm"])
    bias_norms(voc.params["final_layer_norm"])
    for block in voc.params["convnext"]:
        bias_norms(block["norm"])

    k, padded = 19, 32
    mel = rng.standard_normal((2, padded, 100)).astype(np.float32)
    mel[:, k:] = 0.0
    full = voc.decode(jnp.asarray(mel), valid_frames=jnp.int32(k))
    trimmed = voc.decode(jnp.asarray(mel[:, :k]))
    np.testing.assert_allclose(
        np.asarray(full)[:, : (k - 1) * 256], np.asarray(trimmed), atol=1e-6, rtol=1e-5
    )
