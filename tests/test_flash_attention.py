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


def _rope_tables(n, d):
    from f5_tts_tpu.models.rope import rotary_freqs

    raw = rotary_freqs(n, d)
    return jnp.cos(raw), jnp.sin(raw)


def test_rope_perm_matrix_identity():
    """x @ P must equal rotate_half(x) exactly — the algebraic identity the
    in-kernel rotation relies on (reference: rope.py:87-91)."""
    from f5_tts_tpu.models.rope import rotate_half
    from f5_tts_tpu.ops.flash_attention import rope_perm_matrix

    x = jax.random.normal(jax.random.key(3), (4, 64))
    P = jnp.asarray(rope_perm_matrix(64))
    np.testing.assert_array_equal(np.asarray(x @ P), np.asarray(rotate_half(x)))


def test_fused_rope_matches_external_rotation():
    """The kernel's in-kernel RoPE (interpret mode on CPU) must equal applying
    apply_rotary_pos_emb outside then attending (reference: rope.py:94-107)."""
    from f5_tts_tpu.models.rope import apply_rotary_pos_emb

    for n in (48, 37):  # block-aligned and internally-padded
        q, k, v = _qkv(n=n)
        cos, sin = _rope_tables(n, 64)
        mask = jnp.arange(n)[None, :] < jnp.array([n - 10, n])[:, None]
        out = flash_attention(q, k, v, 0.125, mask, rope=(cos, sin))
        qr = apply_rotary_pos_emb(q, (cos, sin))
        kr = apply_rotary_pos_emb(k, (cos, sin))
        ref = sdpa_reference(qr, kr, v, 0.125, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_rope_grads_match_external_rotation():
    from f5_tts_tpu.models.rope import apply_rotary_pos_emb

    q, k, v = _qkv(n=32)
    cos, sin = _rope_tables(32, 64)

    def loss_fused(q, k, v):
        return (flash_attention(q, k, v, 0.125, None, rope=(cos, sin)) ** 2).sum()

    def loss_ref(q, k, v):
        qr = apply_rotary_pos_emb(q, (cos, sin))
        kr = apply_rotary_pos_emb(k, (cos, sin))
        return (sdpa_reference(qr, kr, v, 0.125, None) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grouped_conv_tapsum_matches_lax_conv():
    """The tap-sum grouped-conv path must match lax.conv_general_dilated
    (reference: dit.py:34-36 semantics)."""
    from f5_tts_tpu.utils.modules import conv1d, conv1d_init

    p = conv1d_init(jax.random.key(7), 64, 64, 31, groups=4)
    x = jax.random.normal(jax.random.key(8), (2, 50, 64))
    got = conv1d(p, x, groups=4)  # tap-sum path (groups>1, not depthwise)
    ref = jax.lax.conv_general_dilated(
        x, p["kernel"], (1,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=4,
    ) + p["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
