"""Flash-attention wrapper tests (CPU: exercises the XLA fallback path and the
custom-VJP wiring; kernel-vs-XLA equivalence on real TPU is covered by the
bench/verify drives and the wrapper's gradient contract here)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.ops.attention import scaled_dot_product_attention, sdpa_reference
from f5_tts_tpu.ops.flash_attention import flash_attention, flash_supported


def _qkv(b=2, h=2, n=48, d=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(0), 3)
    return tuple(jax.random.normal(k, (b, h, n, d), dtype) for k in ks)


def test_flash_not_supported_on_cpu():
    q, _, _ = _qkv()
    assert not flash_supported(q)  # tests force the CPU platform


def test_dispatch_falls_back_cleanly():
    q, k, v = _qkv()
    mask = jnp.arange(48)[None, :] < jnp.array([30, 48])[:, None]
    out = scaled_dot_product_attention(q, k, v, 0.125, key_mask=mask, use_flash=True)
    ref = sdpa_reference(q, k, v, 0.125, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_custom_vjp_matches_reference_grads():
    """flash_attention's custom VJP (XLA rematerialized backward) must match
    grads of the plain XLA attention — this is the contract that makes
    training safe on TPU where pallas_call has no reverse-mode rule."""
    q, k, v = _qkv(n=32)
    mask = jnp.arange(32)[None, :] < jnp.array([20, 32])[:, None]

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, 0.125, mask) ** 2).sum()

    def loss_ref(q, k, v):
        return (sdpa_reference(q, k, v, 0.125, mask) ** 2).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_padding_to_block_multiple():
    """Odd sequence lengths pad internally; results must match unpadded XLA."""
    q, k, v = _qkv(n=37)
    out = flash_attention(q, k, v, 0.125, None)
    ref = sdpa_reference(q, k, v, 0.125, None)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
