"""Device-mesh parallelism: data-parallel batches + Megatron-style tensor
parallelism over attention heads and FF hidden units + optional sequence
(context) parallelism over the frame axis for training.

The reference is strictly single-device (SURVEY.md §2c: no distributed
backend of any kind); this module is the TPU-idiomatic scale-out: a
`Mesh(("data", "model"))` — or ("data", "seq", "model") with `seq > 1` —
`NamedSharding` annotations on the param pytree, and GSPMD-inserted
collectives over ICI. The same jitted step runs unchanged on 1 chip (1x1
mesh) or a pod slice.

TP layout (the classic two-collective pattern):
  - attn to_q/to_k/to_v and ff w1: output dim sharded  -> heads/hidden split
  - attn to_out and ff w2: input dim sharded           -> one psum each
  - embeddings, norms, AdaLN modulation, convs: replicated (tiny)
Scan-stacked block leaves carry a leading depth axis, so their specs shift
right by one.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from f5_tts_tpu.utils.modules import Params


def create_mesh(
    data: int | None = None, model: int = 1, seq: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "model") mesh — or ("data", "seq", "model") when
    `seq` > 1. Defaults to all devices on the data axis. Works with any
    device count including 1.

    The "seq" axis is sequence/context parallelism for the TRAINING step:
    activations are sharded along the frame axis and GSPMD inserts the
    collectives (halo exchanges for the convs, k/v all-gathers for
    attention); params stay replicated over it. Useful when long sequences x
    rematerialized activations dominate memory — the weights of this model
    family fit one chip, so "seq" is the axis that buys context headroom
    beyond the reference's 4096-frame cap (SURVEY.md §5 long-context)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * seq)
    if data < 1 or data * model * seq > n:
        raise ValueError(
            f"mesh {data}x{seq}x{model} needs {max(1, data) * model * seq} "
            f"devices, have {n}"
        )
    if seq == 1:
        arr = mesh_utils.create_device_mesh((data, model), devices=devices[: data * model])
        return Mesh(arr, ("data", "model"))
    arr = mesh_utils.create_device_mesh(
        (data, seq, model), devices=devices[: data * seq * model]
    )
    return Mesh(arr, ("data", "seq", "model"))


# ------------------------------------------------------------- spec rules


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


# leaf-name patterns -> (spec axis position of the "model"-sharded dim),
# counted from the END of the shape so stacked depth axes don't matter.
# -1 = last dim (output), -2 = second-to-last (input).
_COL_SHARDED = ("attn/to_q", "attn/to_k", "attn/to_v", "ff/w1")  # out-dim
_ROW_SHARDED = ("attn/to_out", "ff/w2")  # in-dim


def _spec_for(path: str, leaf) -> P:
    ndim = np.ndim(leaf)
    for pat in _COL_SHARDED:
        if pat in path:
            if path.endswith(("kernel", "q", "w8")):
                return P(*([None] * (ndim - 1) + ["model"]))
            if path.endswith(("bias", "scales", "biases", "w8_scale")):
                return P(*([None] * (ndim - 1) + ["model"]))
    for pat in _ROW_SHARDED:
        if pat in path:
            if path.endswith(("kernel", "q", "w8")):
                return P(*([None] * (ndim - 2) + ["model", None]))
            if path.endswith(("scales", "biases")):
                # group axis (in/64) is sharded alongside the input dim
                return P(*([None] * (ndim - 2) + ["model", None]))
            return P()  # output-side bias: replicated
    return P()  # everything else replicated


# Scan-stacked leaves live under a dict-valued "blocks" subtree (DiT /
# duration backbones): the component AFTER "blocks" is a field name. The
# text embedding's ConvNeXt stack is a plain Python LIST named "blocks"
# (not stacked — it is unrolled, not scanned), so there the next component
# is a list index. The lookahead distinguishes the two; prefix-agnostic so
# optimizer-moment paths that mirror the param tree match as well.
_STACKED_RE = re.compile(r"(^|/)blocks/(?!\d+(/|$))")

# The whole text embedding stays OFF FSDP: its depthwise convs interleave
# matrices along the frame (SP) axis, and ANY "data"-sharded leaf whose
# gradient flows through that stack (the pointwise matrices, and — measured —
# even just the vocab table at the stack's input) makes GSPMD re-shard the
# conv kernels inconsistently between forward and backward use sites under
# FSDP x SP. Observed as SPMD "Involuntary full rematerialization" warnings
# on f32[7,1,C] kernels in the 8-device dryrun; bisected 2026-08-19: present
# iff fsdp AND seq>1 AND any text_embed leaf data-sharded, independent of
# grad accumulation. The subtree is ~3% of base params and runs once per
# step (outside the depth scan), so ZeRO buys ~nothing there; prefix-
# agnostic so mirrored optimizer-moment paths match too.
_FSDP_EXEMPT_RE = re.compile(r"(^|/)text_embed/")


def _with_fsdp(spec: P, path: str, leaf, data_size: int) -> P:
    """Upgrade a TP spec with fully-sharded-data-parallel placement: shard the
    largest still-unsharded weight dim over "data" (ZeRO — params AND the
    optimizer moments that mirror them live 1/data-th per device; GSPMD
    all-gathers each layer's weights at its use site and reduce-scatters its
    gradients, riding ICI).

    Never shards the leading depth axis of scan-stacked leaves (any leaf
    under the stacked "blocks" subtree, including 2D stacked biases):
    `lax.scan` dynamic-slices that axis every layer, and slicing a sharded
    axis would all-gather the whole stack per iteration instead of one
    layer's worth. FSDP applies only to weight MATRICES — per-layer 2D
    leaves, possibly scan-stacked: 1D leaves (biases, norms) are noise next
    to the matrices and uneven splits aren't worth the layout churn, and 3D
    conv kernels / broadcast params ([k, in/g, out], GRN's [1, 1, dim])
    stay replicated because their fwd/bwd use-site shardings disagree with
    a "data"-sharded storage layout — measured on the 8-device dryrun as
    SPMD "Involuntary full rematerialization" warnings in the conv backward
    — while holding ~1% of the params (ZeRO buys nothing there). The text
    embedding is exempt wholesale (see _FSDP_EXEMPT_RE).
    Dims not divisible by the data-axis size stay unsharded."""
    shape = np.shape(leaf)
    ndim = len(shape)
    if data_size <= 1:
        return spec
    if _FSDP_EXEMPT_RE.search(path):
        return spec
    start = 1 if _STACKED_RE.search(path) else 0
    if ndim - start != 2:  # only [in, out]-shaped weight matrices
        return spec
    entries = list(spec) + [None] * (ndim - len(spec))
    cands = [
        i
        for i in range(start, ndim)
        if entries[i] is None and shape[i] % data_size == 0 and shape[i] >= data_size
    ]
    if not cands:
        return spec
    entries[max(cands, key=lambda i: shape[i])] = "data"
    return P(*entries)


def _tree_specs(tree, fsdp_data_size: int | None):
    def spec(path, leaf):
        p = _path_str(path)
        s = _spec_for(p, leaf)
        if fsdp_data_size is not None:
            s = _with_fsdp(s, p, leaf, fsdp_data_size)
        return s

    return jax.tree_util.tree_map_with_path(spec, tree)


def param_specs(params: Params, fsdp_data_size: int | None = None) -> Any:
    """PartitionSpec pytree matching a DiT/duration param tree. With
    `fsdp_data_size` (the mesh's data-axis size), weight matrices are
    additionally sharded over "data" (see _with_fsdp)."""
    return _tree_specs(params, fsdp_data_size)


def state_specs(state: dict, fsdp_data_size: int | None = None) -> dict:
    """Specs for a full train state: params + optimizer moments (which mirror
    the param tree paths AND shapes, so the same rules shard them identically
    — under FSDP this is the ZeRO win: Adam's mu/nu are 2x the params and
    never need gathering at all) + scalars."""
    return _tree_specs(state, fsdp_data_size)


def _named(mesh: Mesh, spec_tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def _fsdp_size(mesh: Mesh, fsdp: bool) -> int | None:
    return int(mesh.shape["data"]) if fsdp else None


def shard_params(params: Params, mesh: Mesh, fsdp: bool = False) -> Params:
    return jax.device_put(
        params, _named(mesh, param_specs(params, _fsdp_size(mesh, fsdp)))
    )


def shard_state(state: dict, mesh: Mesh, fsdp: bool = False) -> dict:
    return jax.device_put(
        state, _named(mesh, state_specs(state, _fsdp_size(mesh, fsdp)))
    )


def grad_shardings(params: Params, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree mirroring a param tree's placement — pass to
    `make_train_step(grad_shardings=...)` so the gradient-accumulation scan
    carry is pinned to the params' layout instead of whatever GSPMD
    propagation picks. Under FSDP this is the ZeRO-correct accumulator: the
    f32 carry is params-sized, so a propagation-chosen replicated layout
    would cost the full f32 param footprint PER DEVICE (1.3 GB at base
    scale), while the pinned layout keeps 1/data-th and feeds the optimizer
    update in-place."""
    return _named(mesh, param_specs(params, _fsdp_size(mesh, fsdp)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """For [b, n, ...] batches: batch over "data" AND frames over "seq" when
    the mesh has a seq axis (identity with batch_sharding otherwise)."""
    if "seq" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "seq"))
    return NamedSharding(mesh, P("data"))


def shard_train_step(
    step_fn, mesh: Mesh, state_example: dict, grad_accum: int = 1,
    fsdp: bool = False,
):
    """Jit a (state, mel, text, lens, key) -> (state, loss) step with
    DP(+SP)+TP shardings. The state is donated (in-place update on device).

    mel [b, n, d] and text [b, n] take the sequence sharding (frame axis over
    "seq" when present); per-sample lens stays batch-only. No model-code
    annotations are needed: GSPMD propagates the input shardings through the
    whole loss/grad/update graph and inserts the collectives.

    With grad_accum > 1 the inputs carry a leading microbatch axis
    ([k, b, ...]); that axis is replicated (the scan iterates it serially)
    and the per-microbatch dims shard exactly as the k=1 case — every device
    holds its slice of EVERY microbatch, so no resharding happens between
    scan iterations.

    With fsdp=True the state (params + Adam moments) is additionally sharded
    over the data axis (see _with_fsdp) — pass the SAME flag to shard_state
    so the in/out shardings match the state's actual placement."""
    state_sh = _named(mesh, state_specs(state_example, _fsdp_size(mesh, fsdp)))
    data_sh = batch_sharding(mesh)
    seq_sh = sequence_sharding(mesh)
    if grad_accum > 1:
        data_sh = NamedSharding(mesh, P(None, *data_sh.spec))
        seq_sh = NamedSharding(mesh, P(None, *seq_sh.spec))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, seq_sh, seq_sh, data_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def shard_model_for_inference(model, mesh: Mesh):
    """Re-place a model's params with TP sharding; batched sampling inputs get
    DP sharding automatically via jit's sharding propagation when callers
    device_put their batches with `batch_sharding(mesh)`."""
    model.params = shard_params(model.params, mesh)
    return model
