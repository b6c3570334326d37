"""Rotary position embeddings.

Behavioral parity with reference: rope.py. Two distinct uses in the model:
  - interleaved-pair rotary embedding applied to attention q/k
    (reference: rope.py:42-60, 87-107); the frequency layout duplicates each
    frequency into adjacent lanes ((d r) with r=2), and rotate_half swaps
    within pairs.
  - a precomputed [cos|sin] table used as an *absolute* positional embedding
    for the text branch (reference: rope.py:63-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rotary_freqs(
    seq_len: int,
    dim: int,
    base: float = 10000.0,
    interpolation_factor: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Interleaved rotary frequency table [seq_len, dim]
    (reference: rope.py:42-50): freqs[t, 2j] == freqs[t, 2j+1] == t * base^{-2j/dim}.
    """
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=dtype) / dim))
    t = jnp.arange(seq_len, dtype=dtype)
    freqs = jnp.einsum("i,j->ij", t, inv_freq) / interpolation_factor
    return jnp.repeat(freqs, 2, axis=-1)  # (d r) interleave, r=2


def rotate_half(x: jax.Array) -> jax.Array:
    """Pairwise rotation (x0, x1) -> (-x1, x0) on the last axis
    (reference: rope.py:87-91)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary_pos_emb(t: jax.Array, freqs, scale=1.0) -> jax.Array:
    """Rotate the first rot_dim channels of t [..., n, d] by freqs [n', rot_dim],
    using the *last* seq_len rows of freqs (reference: rope.py:94-107).

    `freqs` may be a raw frequency table or a precomputed (cos, sin) pair —
    callers in the sampling hot path precompute once instead of re-evaluating
    the transcendentals in all layers."""
    if isinstance(freqs, tuple):
        cos, sin = freqs
    else:
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    rot_dim, seq_len = cos.shape[-1], t.shape[-2]
    cos = cos[-seq_len:, :].astype(t.dtype)
    sin = sin[-seq_len:, :].astype(t.dtype)
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    t_rot = (t_rot * cos * scale) + (rotate_half(t_rot) * sin * scale)
    if t_pass.shape[-1] == 0:
        return t_rot
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def precompute_freqs_cis(
    dim: int, end: int, theta: float = 10000.0
) -> np.ndarray:
    """Absolute sin/cos positional table [end, dim] = concat[cos, sin]
    (reference: rope.py:63-73). Host-side, cached in the param tree as a
    constant."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float32) / dim))
    t = np.arange(end)
    freqs = np.outer(t, freqs).astype(np.float32)
    return np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1)


def get_pos_embed_indices(
    start: jax.Array, length: int, max_pos: int, scale: float = 1.0
) -> jax.Array:
    """Clamped position indices [b, length] (reference: rope.py:76-84)."""
    pos = start[:, None] + (jnp.arange(length)[None, :] * scale).astype(jnp.int32)
    return jnp.where(pos < max_pos, pos, max_pos - 1)
