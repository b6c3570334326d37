"""Weight-only int4/int8 quantization, MLX-compatible (group size 64).

The reference ships 4/8-bit model variants quantized with `mlx.nn.quantize`
(reference: cfm.py:450-453, 510-515): per-64-element affine groups along the
input dimension of every nn.Linear whose in_features % 64 == 0, packed into
uint32 words. This module

  - unpacks those published checkpoints into uint8 + scales/biases pytrees,
  - quantizes float trees the same way (for parity round-trips and local use),
  - provides the dequantizing matmul used by utils.modules.linear; the hot
    dequant-in-kernel path lives in ops/qmatmul.py (Pallas).

Quantized linear param layout (kernel is [in, out] in this codebase):
  q:      int8  [in, out]        (codes centered by -2^(bits-1); the offset is
                                  absorbed into `biases`, so Pallas/MXU paths
                                  get a natively supported signed dtype)
  scales: f32   [in/64, out]
  biases: f32   [in/64, out]     (= group_min + 2^(bits-1) * scales)
  dequant(w) = q * repeat(scales, 64, 0) + repeat(biases, 64, 0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.utils.modules import Params

GROUP_SIZE = 64


def unpack_mlx_uint32(w: np.ndarray, bits: int) -> np.ndarray:
    """MLX packed uint32 [out, in*bits/32] -> uint8 [out, in]
    (least-significant element first within each word)."""
    per = 32 // bits
    shifts = (np.arange(per, dtype=np.uint32) * bits).astype(np.uint32)
    vals = (w[..., None] >> shifts) & np.uint32((1 << bits) - 1)
    return vals.reshape(*w.shape[:-1], w.shape[-1] * per).astype(np.uint8)


def pack_mlx_uint32(q: np.ndarray, bits: int) -> np.ndarray:
    """uint8 [out, in] -> MLX packed uint32 [out, in*bits/32]."""
    per = 32 // bits
    # order="C": astype defaults to order='K', which propagates F-ordering
    # from transposed views into the output — and non-contiguous arrays get
    # silently corrupted by safetensors serialization downstream
    q = q.astype(np.uint32, order="C").reshape(*q.shape[:-1], q.shape[-1] // per, per)
    shifts = (np.arange(per, dtype=np.uint32) * bits).astype(np.uint32)
    return (q << shifts).sum(axis=-1, dtype=np.uint32)


def quantize_kernel(kernel: np.ndarray, bits: int, group_size: int = GROUP_SIZE) -> Params:
    """Quantize a [in, out] kernel into the affine-group format above,
    matching mlx.nn.quantize semantics (per-group min/max affine)."""
    d_in, d_out = kernel.shape
    if d_in % group_size != 0:
        raise ValueError(f"in dim {d_in} not divisible by group size {group_size}")
    levels = (1 << bits) - 1
    g = kernel.reshape(d_in // group_size, group_size, d_out)
    w_min = g.min(axis=1)  # [groups, out]
    w_max = g.max(axis=1)
    offset = 1 << (bits - 1)
    scales = (w_max - w_min) / levels
    scales = np.where(scales == 0, 1e-8, scales).astype(np.float32)
    w_min = w_min.astype(np.float32)
    codes = np.rint((g - w_min[:, None, :]) / scales[:, None, :])
    codes = np.clip(codes, 0, levels)
    q = (codes - offset).astype(np.int8).reshape(d_in, d_out)
    # host numpy leaves: the tree moves to the device in ONE batch at the
    # first jit call. Returning jnp arrays here costs a device put per tensor
    # (and the save path immediately pulls them back), which serializes
    # catastrophically through the axon TPU tunnel.
    return {
        "q": q,
        "scales": scales,
        "biases": (w_min + offset * scales).astype(np.float32),
    }


def dequantize_kernel(p: Params, dtype=jnp.float32) -> jax.Array:
    """[in, out] float kernel from quantized params."""
    q = p["q"].astype(dtype)
    scales = jnp.repeat(p["scales"].astype(dtype), GROUP_SIZE, axis=0)
    biases = jnp.repeat(p["biases"].astype(dtype), GROUP_SIZE, axis=0)
    return q * scales + biases


def quantized_matmul(x: jax.Array, p: Params, use_kernel: bool = True) -> jax.Array:
    """x [.., in] @ dequant(p) -> [.., out].

    Dispatches to the Pallas dequant-in-kernel matmul when available; the
    fallback materializes the dequantized kernel (XLA fuses the affine into
    the matmul prologue where it can).
    """
    if use_kernel:
        try:
            from f5_tts_tpu.ops.qmatmul import qmatmul, qmatmul_supported

            if qmatmul_supported(x, p):
                return qmatmul(x, p)
        except ImportError:
            pass
    return x @ dequantize_kernel(p, x.dtype)


def quantizable(kernel_shape: tuple[int, ...]) -> bool:
    """Eligibility rule kept identical to the reference: in_features % 64 == 0
    (reference: cfm.py:510-515)."""
    return len(kernel_shape) == 2 and kernel_shape[0] % GROUP_SIZE == 0


def quantize_tree(params: Params, bits: int) -> Params:
    """Quantize every eligible linear leaf-dict of a param tree
    (functionally): a leaf-dict {kernel[, bias]} with a 2D kernel whose input
    dim is a multiple of 64 becomes a quantized dict.

    Conv kernels (3D) and norms are never quantized — same effective behavior
    as the reference's nn.Linear class predicate. The scan-stacked "blocks"
    subtree (leading depth axis on every leaf) is unstacked, quantized per
    layer, and restacked so lax.scan slices quantized leaves naturally.

    The whole tree is pulled to the host in ONE bulk device_get first; the
    quantization math and the unstack/restack then run on numpy (per-leaf
    device slices serialize catastrophically through the axon TPU tunnel),
    and the quantized tree moves back to the device in one batch at the
    first jit call.
    """
    return _quantize_tree_host(jax.device_get(params), bits)


def _quantize_tree_host(params: Params, bits: int) -> Params:
    if isinstance(params, dict):
        if "kernel" in params and quantizable(np.shape(params["kernel"])):
            out = quantize_kernel(np.asarray(params["kernel"]), bits)
            if "bias" in params:
                out["bias"] = params["bias"]
            return out
        out = {}
        for k, v in params.items():
            if k == "blocks" and isinstance(v, dict):
                depth = jax.tree_util.tree_leaves(v)[0].shape[0]
                layers = [
                    _quantize_tree_host(jax.tree.map(lambda x, i=i: np.asarray(x[i]), v), bits)
                    for i in range(depth)
                ]
                out[k] = jax.tree.map(lambda *xs: np.stack(xs), *layers)
            else:
                out[k] = _quantize_tree_host(v, bits)
        return out
    if isinstance(params, list):
        return [_quantize_tree_host(v, bits) for v in params]
    return params


def quantize_flat_mlx(flat: dict[str, np.ndarray], bits: int) -> dict[str, np.ndarray]:
    """Quantize an MLX-named flat dict into the published model_v1_{4,8}b
    convention: every eligible 2-D linear weight becomes packed uint32 codes
    plus per-group 'scales'/'biases' siblings (reference: cfm.py:510-515);
    embeddings, convs, and the 712-wide input proj stay float."""
    qflat: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if k.endswith(".weight") and v.ndim == 2 and quantizable(v.T.shape) \
                and not k.endswith("text_embed.text_embed.weight"):
            qp = quantize_kernel(v.T.astype(np.float32), bits)
            offset = 1 << (bits - 1)
            codes = (np.asarray(qp["q"]).astype(np.int16) + offset).astype(np.uint8).T
            qflat[k] = pack_mlx_uint32(codes, bits)
            qflat[k[:-7] + ".scales"] = np.ascontiguousarray(np.asarray(qp["scales"]).T)
            qflat[k[:-7] + ".biases"] = np.ascontiguousarray(
                np.asarray(qp["biases"] - offset * qp["scales"]).T)
        else:
            qflat[k] = v
    return qflat


def convert_quantized_dit_state(raw: dict[str, np.ndarray], cfg, bits: int) -> Params:
    """Load an MLX-quantized published checkpoint (model_v1_{4,8}b.safetensors).

    MLX stores, per quantized linear: 'weight' (packed uint32), 'scales',
    'biases'. The conversion path in models/convert.py detects the '.scales'
    sibling and emits quantized leaves directly (no dequant round-trip, so the
    stored grid is preserved bit-exactly).
    """
    from f5_tts_tpu.models.convert import convert_dit_state

    return convert_dit_state(raw, cfg, quant_bits=bits)


# ------------------------------------------------- int8-COMPUTE (W8A8) path

# Weight-only quantization above trades HBM bytes for dequant work; this is
# the orthogonal SPEED path: symmetric per-output-column int8 weights that
# feed the MXU's int8 pipe directly (v5e int8 throughput is ~2x bf16;
# measured 341-363 TOPS vs 161-184 TF/s, and 1.6-1.75x end-to-end including
# the per-token activation quantization — tools/int8_probe.py). Opt-in via
# DiTConfig.int8_compute; applied to the DiT blocks' large linears by
# F5TTS._inference_params. The matmul itself lives in utils.modules.linear.


def w8a8_from_kernel(kernel: jax.Array) -> Params:
    """[..., in, out] float kernel -> {"w8" int8 same shape, "w8_scale" f32
    [..., out]}: symmetric absmax per output column (and per stacked layer)."""
    kf = kernel.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=-2), 1e-12) * (1.0 / 127.0)
    w8 = jnp.clip(jnp.round(kf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return {"w8": w8, "w8_scale": scale}


_W8A8_TARGETS = (("attn", "to_q"), ("attn", "to_k"), ("attn", "to_v"),
                 ("attn", "to_out"), ("ff", "w1"), ("ff", "w2"))


def w8a8_blocks(params: Params) -> Params:
    """Replace the DiT blocks' hot linears (attention projections + FF) with
    int8-compute leaves. Everything outside the per-layer blocks — AdaLN
    modulation, embeddings, proj_out — stays in the float path (tiny share of
    the FLOPs; keeps the conditioning math exact).

    Refuses weight-only-quantized trees (group-64 {q, scales, biases} leaves,
    the --q artifacts): silently skipping them would run the dequant path
    while the config claims int8 compute — re-quantizing group-quantized
    weights to per-channel W8A8 would also compound two quantization errors.
    Load the float snapshot for int8_compute."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for mod, name in _W8A8_TARGETS:
        sub = dict(blocks[mod])
        leaf = dict(sub[name])
        if "kernel" in leaf:
            kernel = leaf.pop("kernel")
            leaf.update(w8a8_from_kernel(kernel))
        elif "q" in leaf:
            raise ValueError(
                "int8_compute (W8A8) requires float kernels, but "
                f"blocks[{mod!r}][{name!r}] is weight-only quantized "
                "({q, scales, biases}). The --q snapshots and --w8a8 are "
                "separate paths: load the float snapshot for int8 compute."
            )
        sub[name] = leaf
        blocks[mod] = sub
    out["blocks"] = blocks
    return out
