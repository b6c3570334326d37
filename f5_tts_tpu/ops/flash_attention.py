"""Pallas TPU attention kernel (non-causal, key-padding mask, fused RoPE).

Replaces the XLA attention for the DiT hot path (the reference's equivalent is
MLX's fused Metal SDPA, reference: dit.py:166). The win on TPU is keeping the
[n_q, n_k] logits in VMEM: XLA's unfused path writes the full [b, h, n, n]
score tensor to HBM twice per layer, which at n=1024 is ~the same traffic as
all the matmul weights combined.

RoPE is fused into the kernel: the interleaved-pair rotation
(reference: rope.py:87-107) is algebraically `x * cos + (x @ P) * sin` where P
is the constant pair-swap-with-sign matrix (P[2j, 2j+1]=1, P[2j+1, 2j]=-1), an
exact identity (see tests). On the MXU the [n, d] @ [d, d] rotation matmul is
essentially free, while the XLA-side rotate_half (strided pair shuffle on the
lane dimension) costs more than the attention kernel itself — fusing it in
nearly halves the measured per-layer attention time (docs/PERFORMANCE.md).

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
import numpy as np
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


@functools.lru_cache(maxsize=None)
def rope_perm_matrix(d: int) -> np.ndarray:
    """P with x @ P == rotate_half(x) for the interleaved-pair rotary layout
    (reference: rope.py:87-91): even lane 2j receives -x[2j+1], odd lane 2j+1
    receives x[2j]."""
    P = np.zeros((d, d), np.float32)
    for j in range(0, d, 2):
        P[j + 1, j] = -1.0
        P[j, j + 1] = 1.0
    return P


def _make_kernel(scale: float, block_q: int, has_mask: bool, has_rope: bool):
    def kernel(*refs):
        i = 3
        q_ref, k_ref, v_ref = refs[:3]
        mask_ref = None
        cos_ref = sin_ref = p_ref = None
        if has_mask:
            mask_ref = refs[i]
            i += 1
        if has_rope:
            cos_ref, sin_ref, p_ref = refs[i : i + 3]
            i += 3
        o_ref = refs[i]

        q = q_ref[0, 0]  # [BQ, d]
        k = k_ref[0, 0]  # [n, d]
        v = v_ref[0, 0]  # [n, d]

        if has_rope:
            sin_all = sin_ref[...].astype(q.dtype)  # [n, d]
            cos_all = cos_ref[...].astype(q.dtype)
            P = p_ref[...].astype(q.dtype)
            qi = pl.program_id(2)
            cos_q = cos_ref[pl.ds(qi * block_q, block_q), :].astype(q.dtype)
            sin_q = sin_ref[pl.ds(qi * block_q, block_q), :].astype(q.dtype)
            # P is a signed permutation (one +-1 per row), so the rotation
            # matmul is exact for bf16 inputs at any precision; HIGHEST keeps
            # it exact for float32 inputs too (default MXU precision would
            # truncate the f32 mantissa). Mosaic rejects fp32 contract
            # precision on bf16 operands, so request it only for f32.
            hi = (
                jax.lax.Precision.HIGHEST
                if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            q = q * cos_q + jax.lax.dot(
                q, P, precision=hi, preferred_element_type=jnp.float32
            ).astype(q.dtype) * sin_q
            k = k * cos_all + jax.lax.dot(
                k, P, precision=hi, preferred_element_type=jnp.float32
            ).astype(k.dtype) * sin_all

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale  # [BQ, n] in VMEM, float32

        if has_mask:
            # additive f32 masking rather than an i1 select: Mosaic's AOT
            # compiler (used when executing deserialized jax.export artifacts,
            # export.py) rejects the i1 [1, n] -> [BQ, n] broadcast relayout
            # that `jnp.where(mask != 0, ...)` needs, while f32 broadcasts are
            # routine. Post-softmax this is bit-identical: dropped logits sit
            # at ~-1e30, so exp(s - m) underflows to exactly 0.0 in float32 —
            # the same 0.0 the select produced ([1, n], kept 2D: TPU vector
            # layout needs >= 2D).
            drop = 1.0 - mask_ref[0].astype(jnp.float32)  # [1, n]
            s = s - drop * 1e30

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)

        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, 0] = (o / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_attention_call(q, k, v, mask, rope, scale: float, block_q: int):
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
    if rope is not None:
        cos, sin = rope
        tab_spec = pl.BlockSpec((n, d), lambda bi, hi, qi: (0, 0))
        in_specs += [tab_spec, tab_spec, pl.BlockSpec((d, d), lambda bi, hi, qi: (0, 0))]
        args += [cos, sin, jnp.asarray(rope_perm_matrix(d))]

    kernel = _make_kernel(scale, block_q, mask is not None, rope is not None)

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
    rope: tuple[jax.Array, jax.Array] | None = None,  # (cos, sin), each [n, d]
) -> jax.Array:
    """Fused attention; pads the sequence to a BLOCK_Q multiple internally
    (padded keys are masked out, padded query rows are discarded).

    When `rope` is given, the interleaved-pair rotary embedding
    (reference: rope.py:94-107) is applied to q and k INSIDE the kernel, so
    callers skip two full HBM round-trips per layer. The tables must cover
    exactly n rows and the full head dim.

    Differentiable: the forward runs the Pallas kernel; the backward
    recomputes attention (including the rotation, which is linear) with XLA
    ops and differentiates that (flash-style rematerialization — no probs are
    saved), so training works on TPU where pallas_call has no reverse rule.
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
        if rope is not None:
            cos, sin = rope
            rope = (
                jnp.pad(cos, [(0, n_pad - n), (0, 0)]),
                jnp.pad(sin, [(0, n_pad - n), (0, 0)]),
            )

    out = _flash_attention_call(q, k, v, key_mask, rope, float(scale), block_q)
    return out[:, :, :n, :]


def _make_bwd_kernel(scale: float, block_q: int, has_mask: bool, has_rope: bool):
    """Flash backward: recomputes the softmax row statistics in VMEM (same
    whole-K design as the forward — no online state) and never materializes
    the [n, n] probabilities to HBM. dK/dV accumulate across q-blocks in
    their f32 output refs, which stay VMEM-resident because the q-block grid
    dimension is innermost and their index map is constant in it."""

    def kernel(*refs):
        i = 5
        q_ref, k_ref, v_ref, g_ref, delta_ref = refs[:5]
        mask_ref = None
        cos_ref = sin_ref = p_ref = None
        if has_mask:
            mask_ref = refs[i]
            i += 1
        if has_rope:
            cos_ref, sin_ref, p_ref = refs[i : i + 3]
            i += 3
        dq_ref, dk_ref, dv_ref = refs[i : i + 3]

        qi = pl.program_id(2)

        @pl.when(qi == 0)
        def _init():
            dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
            dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

        q = q_ref[0, 0]  # [BQ, d] (pre-rotation)
        k = k_ref[0, 0]  # [n, d]
        v = v_ref[0, 0]  # [n, d]
        g = g_ref[0, 0]  # [BQ, d] cotangent of the output
        delta = delta_ref[0, 0]  # [BQ, 1] f32 rowsum(g * out)

        if has_rope:
            P = p_ref[...].astype(q.dtype)
            cos_all = cos_ref[...].astype(q.dtype)
            sin_all = sin_ref[...].astype(q.dtype)
            cos_q = cos_ref[pl.ds(qi * block_q, block_q), :].astype(q.dtype)
            sin_q = sin_ref[pl.ds(qi * block_q, block_q), :].astype(q.dtype)
            hi = (
                jax.lax.Precision.HIGHEST
                if q.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            q = q * cos_q + jax.lax.dot(
                q, P, precision=hi, preferred_element_type=jnp.float32
            ).astype(q.dtype) * sin_q
            k = k * cos_all + jax.lax.dot(
                k, P, precision=hi, preferred_element_type=jnp.float32
            ).astype(k.dtype) * sin_all

        # recompute the probabilities for this q block (f32 stats, as forward)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if has_mask:
            drop = 1.0 - mask_ref[0].astype(jnp.float32)  # [1, n]
            s = s - drop * 1e30
        m = jnp.max(s, axis=-1, keepdims=True)
        p_un = jnp.exp(s - m)
        denom = jnp.sum(p_un, axis=-1, keepdims=True)
        probs = p_un / denom  # [BQ, n] f32

        # dV += P^T g
        dv_ref[0, 0] += jax.lax.dot_general(
            probs.astype(v.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = g V^T ; dS = P * (dP - delta) * scale
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, n]
        ds = probs * (dp - delta) * scale  # masked keys have P == 0 -> ds == 0
        ds = ds.astype(q.dtype)

        # dQ' = dS K' ; dK' += dS^T Q'
        dq_rot = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_rot = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        if has_rope:
            # x' = x*cos + (x @ P)*sin  =>  dx = g*cos + (g*sin) @ P^T; P is a
            # signed permutation so P^T contraction is exact at any precision
            Pf = p_ref[...].astype(jnp.float32)
            cq, sq = cos_q.astype(jnp.float32), sin_q.astype(jnp.float32)
            ca, sa = cos_all.astype(jnp.float32), sin_all.astype(jnp.float32)
            dq_rot = dq_rot * cq + jax.lax.dot_general(
                dq_rot * sq, Pf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_rot = dk_rot * ca + jax.lax.dot_general(
                dk_rot * sa, Pf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        dq_ref[0, 0] = dq_rot
        dk_ref[0, 0] += dk_rot

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_attention_bwd_call(q, k, v, g, delta, mask, rope, scale: float, block_q: int):
    b, h, n, d = q.shape
    grid = (b, h, n // block_q)

    qspec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0))
    kspec = pl.BlockSpec((1, 1, n, d), lambda bi, hi, qi: (bi, hi, 0, 0))
    in_specs = [
        qspec, kspec, kspec, qspec,
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
    ]
    args = [q, k, v, g, delta]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, n), lambda bi, hi, qi: (bi, 0, 0)))
        args.append(mask.astype(jnp.int8)[:, None, :])
    if rope is not None:
        cos, sin = rope
        tab_spec = pl.BlockSpec((n, d), lambda bi, hi, qi: (0, 0))
        in_specs += [tab_spec, tab_spec, pl.BlockSpec((d, d), lambda bi, hi, qi: (0, 0))]
        args += [cos, sin, jnp.asarray(rope_perm_matrix(d))]

    kernel = _make_bwd_kernel(scale, block_q, mask is not None, rope is not None)
    interpret = jax.devices()[0].platform.lower() not in ("tpu", "axon")
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _apply_rope_xla(x, rope):
    """XLA-side equivalent of the in-kernel rotation (used by the backward)."""
    cos, sin = rope
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    P = jnp.asarray(rope_perm_matrix(x.shape[-1])).astype(x.dtype)
    return x * cos + (x @ P) * sin


def _xla_attention(q, k, v, scale, key_mask):
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _flash_fwd(q, k, v, scale, key_mask, rope):
    out = flash_attention(q, k, v, scale, key_mask, rope)
    return out, (q, k, v, key_mask, rope, out)


def _flash_bwd(scale, residuals, g):
    """Pallas flash backward: dK/dV accumulated across q-blocks in VMEM, the
    [n, n] probabilities recomputed per block and never written to HBM — the
    previous XLA rematerialized backward materialized them (plus the f32
    logits) per layer, which dominated training-step HBM traffic. Runs
    wherever the forward kernel ran (interpret mode off-TPU, so the CPU
    suite exercises the same code path the chip does)."""
    q, k, v, key_mask, rope, out = residuals
    b, h, n, d = q.shape

    # delta_i = sum_d g_i * out_i — the softmax-backward row correction
    # (rowsum(dP * P) without forming dP): cheap in XLA, saves the kernel
    # one [BQ, n] x [n, d] matmul recomputing out
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )

    block_q = min(BLOCK_Q, max(_next_multiple(n, 8), 8))
    n_pad = _next_multiple(n, block_q)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q, k, v, g = (jnp.pad(x, pad) for x in (q, k, v, g))
        delta = jnp.pad(delta, pad)
        if key_mask is None:
            key_mask = jnp.broadcast_to(jnp.arange(n_pad)[None, :] < n, (b, n_pad))
        else:
            key_mask = jnp.pad(key_mask, [(0, 0), (0, n_pad - n)])
        if rope is not None:
            cos, sin = rope
            rope = (
                jnp.pad(cos, [(0, n_pad - n), (0, 0)]),
                jnp.pad(sin, [(0, n_pad - n), (0, 0)]),
            )

    dq, dk, dv = _flash_attention_bwd_call(
        q, k, v, g, delta, key_mask, rope, float(scale), block_q
    )
    return dq[:, :, :n], dk[:, :, :n], dv[:, :, :n], None, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _next_multiple(x: int, m: int) -> int:
    return -(-x // m) * m
