"""Minimal functional NN primitives over parameter pytrees.

The model core is pure-functional: parameters live in nested dicts of
`jnp.ndarray` leaves, and these helpers implement the forward math. This keeps
jit/scan/shard_map trivially applicable and makes the PyTorch->JAX weight
mapping explicit (see models/convert.py).

Layout conventions (differ from torch on purpose, for MXU-friendly layouts):
  - linear kernel:   [d_in, d_out]       (torch: [d_out, d_in])
  - conv1d kernel:   [k, in/groups, out] (torch: [out, in/groups, k])
  - embedding table: [vocab, dim]        (same as torch)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Params = dict


# ---------------------------------------------------------------- init helpers


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    """Matches torch/MLX nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in))."""
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"kernel": _uniform(kkey, (d_in, d_out), bound)}
    if bias:
        p["bias"] = _uniform(bkey, (d_out,), bound)
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    if "q" in p:  # weight-only quantized leaf (see models/quant.py)
        from f5_tts_tpu.models.quant import quantized_matmul

        y = quantized_matmul(x, p)
    elif "w8" in p:  # int8-COMPUTE leaf (W8A8 speed path, models/quant.py)
        y = _w8a8_matmul(x, p["w8"], p["w8_scale"])
    else:
        y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _w8a8_matmul(x: jax.Array, w8: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric W8A8 matmul: dynamic per-token activation quantization, an
    int8 x int8 -> int32 MXU dot, f32 rescale. ~1.6-1.75x the bf16 matmul at
    serving shapes on v5e (v5e int8 pipe is ~2x bf16; tools/int8_probe.py).
    Inference-only — the training path keeps float kernels."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, w8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * (sx * scale.astype(jnp.float32))).astype(x.dtype)


def embedding_init(key, vocab: int, dim: int) -> Params:
    return {"embedding": jax.random.normal(key, (vocab, dim)) * 1.0}


def embedding(p: Params, ids: jax.Array, dtype=None) -> jax.Array:
    table = p["embedding"]
    if dtype is not None:
        table = table.astype(dtype)
    # mode="clip": jax's default fills out-of-bounds gathers with NaN under
    # jit, which silently poisons the whole sequence through attention if a
    # token id ever exceeds the vocab; clipping gives defined behavior
    return jnp.take(table, ids, axis=0, mode="clip")


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(x: jax.Array, p: Params | None = None, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis; affine iff params given. Statistics are
    computed in float32 for bf16 stability."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if p is not None:
        y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y


def rms_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,))}


def rms_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt((xf * xf).mean(axis=-1, keepdims=True) + eps)
    return (y.astype(x.dtype)) * p["scale"].astype(x.dtype)


def conv1d_init(
    key, d_in: int, d_out: int, kernel_size: int, groups: int = 1, bias: bool = True
) -> Params:
    """Matches torch nn.Conv1d default init: U(-k, k), k=1/sqrt(in/groups * ks)."""
    kkey, bkey = jax.random.split(key)
    fan_in = (d_in // groups) * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": _uniform(kkey, (kernel_size, d_in // groups, d_out), bound)}
    if bias:
        p["bias"] = _uniform(bkey, (d_out,), bound)
    return p


# Trace-time switch for the tap-sum grouped-conv lowering (A/B probe handle;
# see tools/train_bench.py --no-tapsum and docs/PERFORMANCE.md).
TAPSUM_GROUPED_CONV = True


def conv1d(
    p: Params,
    x: jax.Array,
    groups: int = 1,
    padding: int | str = "SAME",
    dilation: int = 1,
) -> jax.Array:
    """1D convolution on [b, n, c] inputs (the TPU-native lowering of the
    reference's grouped/depthwise nn.Conv1d, reference: dit.py:34-36,
    convnext_v2.py:35-37).

    Grouped-but-not-depthwise convs (the k31/g16 conv position embedding) use
    a tap-sum of per-group einsums instead of XLA's feature_group_count
    lowering, which measures ~2.5x slower on v5e (tools/fusion_probe.py);
    the einsum form keeps each tap a dense [b, n, g, in] x [g, in, out]
    contraction on the MXU, accumulated in float32."""
    kernel = p["kernel"].astype(x.dtype)
    ks, in_pg, d_out = kernel.shape
    known_padding = isinstance(padding, int) or padding in ("SAME", "VALID")
    if groups > 1 and in_pg > 1 and dilation == 1 and TAPSUM_GROUPED_CONV and known_padding:
        return _grouped_conv_tapsum(kernel, p.get("bias"), x, groups, padding)
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _grouped_conv_tapsum(
    kernel: jax.Array,  # [k, in_per_group, d_out]
    bias: jax.Array | None,
    x: jax.Array,  # [b, n, c]
    groups: int,
    padding: int | str,
) -> jax.Array:
    ks = kernel.shape[0]
    if padding == "SAME":
        lo = (ks - 1) // 2
        hi = ks - 1 - lo
    elif padding == "VALID":
        lo = hi = 0
    else:
        lo = hi = int(padding)
    y = _grouped_conv(x, kernel, groups, lo, hi)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _tapsum_impl(x, kernel, groups: int, lo: int, hi: int) -> jax.Array:
    ks, in_pg, d_out = kernel.shape
    b, n, c = x.shape
    out_pg = d_out // groups
    # [g, k, in, out]: group g's output channels read only group g's inputs
    wg = jnp.transpose(kernel.reshape(ks, in_pg, groups, out_pg), (2, 0, 1, 3))
    xg = x.reshape(b, n, groups, in_pg)
    xp = jnp.pad(xg, ((0, 0), (lo, hi), (0, 0), (0, 0)))
    n_out = n + lo + hi - ks + 1
    y = jnp.zeros((b, n_out, groups, out_pg), jnp.float32)
    for k in range(ks):
        y = y + jnp.einsum(
            "bngi,gio->bngo",
            xp[:, k : k + n_out],
            wg[:, k],
            preferred_element_type=jnp.float32,
        )
    return y.astype(x.dtype).reshape(b, n_out, d_out)


def _xla_grouped_conv(x, kernel, groups: int, lo: int, hi: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(lo, hi)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _grouped_conv(x, kernel, groups: int, lo: int, hi: int) -> jax.Array:
    """Grouped conv with a split lowering: tap-sum einsums forward (2.5x the
    XLA feature_group_count lowering on v5e, tools/fusion_probe.py), XLA conv
    gradients backward (the unrolled tap-sum's backward costs ~27 ms/step on
    the base train step, tools/train_bench.py --no-tapsum A/B). The op is
    bilinear, so the backward's jax.vjp needs no primal value and XLA DCEs
    the redundant forward conv."""
    return _tapsum_impl(x, kernel, groups, lo, hi)


def _grouped_conv_fwd(x, kernel, groups: int, lo: int, hi: int):
    return _tapsum_impl(x, kernel, groups, lo, hi), (x, kernel)


def _grouped_conv_bwd(groups: int, lo: int, hi: int, res, g):
    x, kernel = res
    _, vjp = jax.vjp(lambda x_, k_: _xla_grouped_conv(x_, k_, groups, lo, hi), x, kernel)
    return vjp(g.astype(x.dtype))


_grouped_conv.defvjp(_grouped_conv_fwd, _grouped_conv_bwd)


# ---------------------------------------------------------------- activations


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def gelu(x: jax.Array, approximate: bool = False) -> jax.Array:
    return jax.nn.gelu(x, approximate=approximate)
