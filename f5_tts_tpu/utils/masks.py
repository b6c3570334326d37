"""Mask and padding utilities (behavioral parity with reference: utils.py:39-109).

All functions are pure and jit-safe given static `length` arguments; random-span
masking takes an explicit PRNG key instead of the reference's global RNG state
(reference: utils.py:69 uses `mx.random.uniform` on implicit global state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lens_to_mask(t: jax.Array, length: int | None = None) -> jax.Array:
    """Boolean [b, n] mask with True for positions < lens (reference: utils.py:39-47).

    `length` must be a static int under jit; outside jit it defaults to max(t).
    """
    if length is None:
        length = int(t.max())
    seq = jnp.arange(length)
    return seq[None, :] < t[:, None]


def mask_from_start_end_indices(
    start: jax.Array, end: jax.Array, max_length: int
) -> jax.Array:
    """[b, n] mask True on [start, end) (reference: utils.py:50-58)."""
    seq = jnp.arange(max_length, dtype=jnp.int32)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(
    key: jax.Array,
    seq_len: jax.Array,
    frac_lengths: jax.Array,
    max_length: int,
) -> jax.Array:
    """Random contiguous span covering `frac_lengths` of each sequence
    (reference: utils.py:61-79). Used for the infill training mask.
    """
    lengths = (frac_lengths * seq_len).astype(jnp.int32)
    max_start = seq_len - lengths
    rand = jax.random.uniform(key, frac_lengths.shape)
    start = jnp.maximum((max_start * rand).astype(jnp.int32), 0)
    end = start + lengths
    return mask_from_start_end_indices(start, end, max_length)


def maybe_masked_mean(t: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Mean over the sequence axis, restricted to `mask` when given
    (reference: utils.py:82-90). t: [b, n, d], mask: [b, n] -> [b, d].
    """
    if mask is None:
        return t.mean(axis=1)
    t = jnp.where(mask[..., None], t, 0.0)
    num = t.sum(axis=1)
    den = mask.astype(jnp.int32).sum(axis=-1)
    return num / jnp.maximum(den, 1)[:, None]


def pad_to_length(t: jax.Array, length: int, value=0) -> jax.Array:
    """Pad (or truncate) the last axis to `length` (reference: utils.py:93-103)."""
    seq_len = t.shape[-1]
    if length > seq_len:
        pad = [(0, 0)] * (t.ndim - 1) + [(0, length - seq_len)]
        t = jnp.pad(t, pad, constant_values=value)
    return t[..., :length]


def pad_sequence(ts: list[jax.Array], padding_value=0) -> jax.Array:
    """Stack 1D+ arrays padded on the last axis to the longest
    (reference: utils.py:106-109)."""
    max_len = max(t.shape[-1] for t in ts)
    return jnp.stack([pad_to_length(t, max_len, padding_value) for t in ts])
