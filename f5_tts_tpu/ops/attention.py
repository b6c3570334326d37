"""Scaled dot-product attention for TPU.

The reference delegates to MLX's fused Metal kernel
(`mx.fast.scaled_dot_product_attention`, reference: dit.py:166). Here the hot
path is a Pallas flash-attention kernel (ops/flash_attention.py) with an XLA
fallback; both are non-causal with an optional key padding mask, which is the
only masking the model needs (reference: dit.py:160-166).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa_reference(
    q: jax.Array,  # [b, h, n, d]
    k: jax.Array,  # [b, h, n, d]
    v: jax.Array,  # [b, h, n, d]
    scale: float,
    key_mask: jax.Array | None = None,  # [b, n] bool, True = keep
) -> jax.Array:
    """XLA attention: softmax in float32, output in input dtype."""
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(key_mask[:, None, None, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    key_mask: jax.Array | None = None,
    use_flash: bool = True,
    rope: tuple[jax.Array, jax.Array] | None = None,  # (cos, sin) [n, d]
) -> jax.Array:
    """Dispatch to the Pallas flash kernel on TPU when shapes allow, else the
    XLA fallback.

    `rope` carries rotary tables for IN-KERNEL application (the hot path —
    see ops/flash_attention.py); the fallback applies the identical rotation
    with XLA ops first, so both paths compute the same function."""
    if use_flash:
        try:
            from f5_tts_tpu.ops.flash_attention import flash_attention, flash_supported

            if flash_supported(q):
                return flash_attention(q, k, v, scale=scale, key_mask=key_mask, rope=rope)
        except ImportError:
            pass
    if rope is not None:
        from f5_tts_tpu.models.rope import apply_rotary_pos_emb

        q = apply_rotary_pos_emb(q, rope)
        k = apply_rotary_pos_emb(k, rope)
    return sdpa_reference(q, k, v, scale, key_mask)
