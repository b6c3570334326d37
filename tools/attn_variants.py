"""Benchmark flash-attention kernel variants on the real TPU.

Explores the d_head=64 lane-packing question (VERDICT round-1 item 5): with
d=64 the QK^T contraction uses half the MXU depth and the PV output half the
lanes. Variants:

  current   one (batch, head, q-block) per grid step        [BQ,64]x[64,n]
  pack2     two heads per grid step, batched dot            [2,BQ,64]
  fused_ln  current + fused fp32 LN+modulation epilogue inputs (measures
            whether feeding pre-normed bf16 changes anything)

Run alone on the chip:  python tools/attn_variants.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from f5_tts_tpu.ops.flash_attention import flash_attention
from f5_tts_tpu.utils.profiling import device_sync

B, H, N, D = 2, 16, 1024, 64
SCALE = 1.0 / np.sqrt(D)
REPS = 30


def timed(fn, *args) -> float:
    out = fn(*args)
    device_sync(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


# ------------------------------------------------------- pack2 variant


def _attn_kernel_pack2(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [2, BQ, d]
    k = k_ref[0]  # [2, n, d]
    v = v_ref[0]  # [2, n, d]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [2, BQ, n]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def attn_pack2(q, k, v, scale: float):
    b, h, n, d = q.shape
    qp = q.reshape(b * h // 2, 2, n, d)
    kp = k.reshape(b * h // 2, 2, n, d)
    vp = v.reshape(b * h // 2, 2, n, d)
    grid = (b * h // 2,)
    spec = pl.BlockSpec((1, 2, n, d), lambda i: (i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_pack2, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, n, d)


# ------------------------------------------------------- pack2 via fold into q rows
# one dot per pair by stacking the two heads' q rows: [2*BQ, d] x [d, n] is
# wrong across heads, so instead fold heads into the GRID but use a single
# flat batch axis (removes the 3-level grid overhead of the current kernel)


def _attn_kernel_flat(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def attn_flat(q, k, v, scale: float):
    b, h, n, d = q.shape
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_flat, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


# ------------------------------------------------------- XLA reference


@functools.partial(jax.jit, static_argnames=("scale",))
def attn_xla(q, k, v, scale: float):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.jit, static_argnames=("scale",))
def attn_jaxnn(q, k, v, scale: float):
    return jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        scale=scale,
    ).transpose(0, 2, 1, 3)


def main() -> None:
    key = jax.random.key(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)

    cur = functools.partial(flash_attention, scale=SCALE, key_mask=None)
    variants = {
        "current (b,h,q grid)": lambda q, k, v: flash_attention(q, k, v, SCALE, None),
        "flat (b*h grid)": lambda q, k, v: attn_flat(q, k, v, SCALE),
        "pack2 (2 heads/step)": lambda q, k, v: attn_pack2(q, k, v, SCALE),
        "xla unfused": lambda q, k, v: attn_xla(q, k, v, SCALE),
        "jax.nn.dpa": lambda q, k, v: attn_jaxnn(q, k, v, SCALE),
    }
    ref = np.asarray(attn_xla(q, k, v, SCALE), np.float32)
    for name, fn in variants.items():
        out = np.asarray(fn(q, k, v), np.float32)
        err = np.abs(out - ref).max()
        t = timed(fn, q, k, v)
        print(f"{name:24} {t:7.3f} ms   maxerr {err:.4f}")


if __name__ == "__main__":
    main()
