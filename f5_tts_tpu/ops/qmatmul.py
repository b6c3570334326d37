"""Pallas dequantize-in-kernel matmul for weight-only int4/int8 linears.

The XLA fallback (models/quant.py) materializes the dequantized kernel in HBM
every call, so the quantized model reads MORE weight bytes than the float one.
This kernel reads the uint8 codes + per-group affine params (2-4x less HBM
traffic than bf16 weights), dequantizes group-wise in VMEM, and feeds the MXU
directly — the quantization equivalent of what MLX's fused quantized matmul
does on Metal (reference: nn.quantize usage at cfm.py:510-515).

Layout (see models/quant.py): q int8 [k, n] (offset-centered codes),
scales/biases f32 [k/64, n];
dequant(w)[i, j] = q[i, j] * scales[i//64, j] + biases[i//64, j].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from f5_tts_tpu.utils.modules import Params

GROUP_SIZE = 64
BLOCK_M = 256
BLOCK_N = 512
# measured on v5e: the kernel wins in the memory-bound regime (small token
# counts, ~1.13x at m=64); at large m the matmul is compute-bound and XLA's
# dequant-then-dot overlaps the dequant, so the fallback is used there
_MIN_M = 8
_MAX_M = 128


def qmatmul_supported(x: jax.Array, p: Params) -> bool:
    platform = jax.devices()[0].platform.lower()
    if platform not in ("tpu", "axon"):
        return False
    k, n = p["q"].shape
    m = int(jnp.size(x) // x.shape[-1])
    return (
        x.shape[-1] == k
        and k % GROUP_SIZE == 0
        and n % 128 == 0
        and _MIN_M <= m <= _MAX_M
    )


def _qmm_kernel(x_ref, q_ref, s_ref, b_ref, o_ref):
    x = x_ref[...]  # [BM, k]
    q = q_ref[...].astype(jnp.float32)  # [k, BN]
    k = q.shape[0]
    s = s_ref[...]  # [k/64, BN]
    b = b_ref[...]
    # group-broadcast via reshape: [k/64, BN] -> [k, BN]
    w = q.reshape(k // GROUP_SIZE, GROUP_SIZE, -1) * s[:, None, :] + b[:, None, :]
    w = w.reshape(k, -1).astype(x.dtype)
    o_ref[...] = jax.lax.dot(
        x, w, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def _qmm_call(x2d, q, scales, biases, block_m: int, block_n: int):
    m, k = x2d.shape
    n = q.shape[1]
    grid = (m // block_m, n // block_n)
    interpret = jax.devices()[0].platform.lower() not in ("tpu", "axon")
    return pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((k, block_n), lambda mi, ni: (0, ni)),
            pl.BlockSpec((k // GROUP_SIZE, block_n), lambda mi, ni: (0, ni)),
            pl.BlockSpec((k // GROUP_SIZE, block_n), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        interpret=interpret,
    )(x2d, q, scales, biases)


def qmatmul(x: jax.Array, p: Params) -> jax.Array:
    """x [..., k] @ dequant(p) -> [..., n]."""
    k, n = p["q"].shape
    lead = x.shape[:-1]
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]

    block_m = min(BLOCK_M, _next_multiple(m, 8))
    # block_n must DIVIDE n: the grid is n // block_n, so a non-divisor would
    # silently leave trailing output columns unwritten
    block_n = next(bn for bn in (BLOCK_N, 256, 128) if n % bn == 0)
    m_pad = _next_multiple(m, block_m)
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))

    out = _qmm_call(x2d, p["q"], p["scales"], p["biases"], block_m, block_n)
    return out[:m].reshape(*lead, n)


def _next_multiple(x: int, mult: int) -> int:
    return -(-x // mult) * mult
