"""Pallas TPU attention kernel (non-causal, key-padding mask).

Replaces the XLA attention for the DiT hot path (the reference's equivalent is
MLX's fused Metal SDPA, reference: dit.py:166). The win on TPU is keeping the
[n_q, n_k] logits in VMEM: XLA's unfused path writes the full [b, h, n, n]
score tensor to HBM twice per layer, which at n=1024 is ~the same traffic as
all the matmul weights combined.

Design for this model family (n <= 4096, d_head 64, non-causal, at most a
key-padding mask): the whole K/V for one (batch, head) fits VMEM comfortably
(4096 x 64 bf16 = 512 KB each), so each grid step computes one q-block against
ALL keys in a single pass — no online-softmax state, one exp, two MXU matmuls.
Softmax statistics are computed in float32.

Grid: (b, h, n // BLOCK_Q); K/V block indices are constant in the q-block
dimension, so Pallas's pipeline skips re-fetching them between q blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

BLOCK_Q = 1024  # whole-sequence blocks benchmarked fastest for n <= 4096 on v5e
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def flash_supported(q: jax.Array) -> bool:
    """Use the kernel on real TPU backends for supported head dims."""
    if not _HAS_PLTPU:
        return False
    platform = jax.devices()[0].platform.lower()
    if platform not in ("tpu", "axon"):
        return False
    d = q.shape[-1]
    return d in (64, 128, 256) and q.shape[-2] >= 8


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]  # [BQ, d]
    k = k_ref[0, 0]  # [n, d]
    v = v_ref[0, 0]  # [n, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # [BQ, n] in VMEM, float32

    if mask_ref is not None:
        keep = mask_ref[0] != 0  # [1, n] (kept 2D: TPU vector layout needs >=2D)
        s = jnp.where(keep, s, _NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_attention_call(q, k, v, mask, scale: float, block_q: int):
    b, h, n, d = q.shape
    grid = (b, h, n // block_q)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
    ]
    args = [q, k, v]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, n), lambda bi, hi, qi: (bi, 0, 0)))
        args.append(mask.astype(jnp.int8)[:, None, :])
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, scale: _attn_kernel(qr, kr, vr, None, orf, scale=scale),
            scale=scale,
        )

    # interpret mode keeps the kernel testable on CPU
    interpret = jax.devices()[0].platform.lower() not in ("tpu", "axon")
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jax.Array,  # [b, h, n, d]
    k: jax.Array,
    v: jax.Array,
    scale: float,
    key_mask: jax.Array | None = None,  # [b, n] bool, True = keep
) -> jax.Array:
    """Fused attention; pads the sequence to a BLOCK_Q multiple internally
    (padded keys are masked out, padded query rows are discarded).

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes attention with XLA ops (flash-style rematerialization — no
    probs are saved) and differentiates that, so training works on TPU where
    pallas_call has no reverse-mode rule.
    """
    b, h, n, d = q.shape
    block_q = min(BLOCK_Q, max(_next_multiple(n, 8), 8))
    n_pad = _next_multiple(n, block_q)

    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if key_mask is None:
            key_mask = jnp.arange(n_pad)[None, :] < n
            key_mask = jnp.broadcast_to(key_mask, (b, n_pad))
        else:
            key_mask = jnp.pad(key_mask, [(0, 0), (0, n_pad - n)])

    out = _flash_attention_call(q, k, v, key_mask, float(scale), block_q)
    return out[:, :, :n, :]


def _xla_attention(q, k, v, scale, key_mask):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _flash_fwd(q, k, v, scale, key_mask):
    return flash_attention(q, k, v, scale, key_mask), (q, k, v, key_mask)


def _flash_bwd(scale, residuals, g):
    q, k, v, key_mask = residuals
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale, key_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _next_multiple(x: int, m: int) -> int:
    return -(-x // m) * m
