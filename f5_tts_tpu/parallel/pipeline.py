"""Pipeline parallelism over the DiT's scan-stacked depth axis.

The reference is strictly single-device (SURVEY.md §2c); `parallel/mesh.py`
provides the DP / SP / TP decompositions. This module adds the fourth:
GPipe-style pipeline parallelism. The DiT's depth dimension is already a
stacked parameter pytree driven by `lax.scan` (models/dit.py), so a stage
shard is just a contiguous slice of that leading depth axis: a
`Mesh(("data", "stage"))` places depth/S consecutive blocks on each stage
device, and microbatches stream through the stages over ICI with
`jax.lax.ppermute` — the canonical TPU pipelining pattern (one collective
per tick, riding neighbor links; no NCCL-style send/recv, which is the
point of doing this the XLA way).

This model family does not NEED pipeline parallelism to fit (335M params fit
one chip comfortably — see __graft_entry__'s scope note); the module exists
because the framework round-trips arbitrary model sizes through
`config.json` snapshots, and a DiT deep enough to exceed one chip's HBM
wants its depth axis sharded. It is also the completeness row of the
parallelism menu: DP (batch), SP (frames), TP (heads/hidden), PP (depth)
all compose on one mesh.

Schedule: classic GPipe fill-and-drain. With S stages and M microbatches,
the loop runs M + S - 1 ticks; at tick t, stage s runs microbatch (t - s)
through its local block scan and ppermutes the activation to stage s + 1.
Bubble fraction = (S-1)/(M+S-1), so throughput efficiency approaches 1 as
M grows. Within a tick every stage computes concurrently — each on its own
microbatch — which XLA expresses as fully parallel per-device programs with
one neighbor permute between ticks.

Math note: chaining S local scans of depth/S blocks is the SAME op order as
one scan over depth blocks, so the pipelined forward is numerically
identical to `dit_forward` (the equality test asserts bitwise-level
closeness in float32). AdaLN time modulations are precomputed OUTSIDE the
pipeline as a [depth, b, 6*dim] tensor and stage-sharded alongside the
blocks — identical math to in-block computation (blocks.py:adaln_zero),
and it keeps the tiny time-MLP matmuls off the pipeline's critical path
(same hoist the ODE sampler uses, models/dit.py:dit_time_mods).

The forward is differentiable end to end: `ppermute`'s transpose is the
inverted permutation and the tick scan's cotangent flows the reverse
pipeline schedule, so `jax.grad` through this forward IS pipeline-parallel
backprop (tested against the sequential gradient). Dropout IS plumbed
(`dropout_key=`, rate from cfg.dropout like models/dit.py): keys are
pre-split per (layer, microbatch) outside the pipeline, stage-sharded
alongside the blocks, and folded with the data-axis index so DP replicas
draw independent masks. Masks cannot bit-match the sequential forward's
(which draws one mask over the FULL batch per layer; microbatching slices
the batch differently) — dropout is random regularization, and the tests
pin determinism-under-key and rate-0 equivalence instead.

reference: dit.py:374-401 (the backbone being pipelined); no reference
counterpart for the parallelism itself (SURVEY.md §2c: none exists).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if hasattr(jax, "shard_map"):  # jax >= 0.8 top-level API (check_vma kwarg)

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )

else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from f5_tts_tpu.config import DiTConfig
from f5_tts_tpu.models import blocks as B
from f5_tts_tpu.models.dit import dit_text_embed
from f5_tts_tpu.models.rope import rotary_freqs
from f5_tts_tpu.utils.modules import Params, linear


def create_pipeline_mesh(stages: int, data: int = 1, devices=None) -> Mesh:
    """A ("data", "stage") mesh: DP over the batch axis composes with PP over
    the depth axis. Works with any device count >= data * stages."""
    devices = list(devices if devices is not None else jax.devices())
    if data * stages > len(devices):
        raise ValueError(
            f"pipeline mesh {data}x{stages} needs {data * stages} devices, "
            f"have {len(devices)}"
        )
    arr = mesh_utils.create_device_mesh((data, stages), devices=devices[: data * stages])
    return Mesh(arr, ("data", "stage"))


def pipeline_param_specs(params: Params) -> Params:
    """PartitionSpecs: depth-stacked block leaves shard their leading axis
    over "stage"; every other leaf (embeddings, final norm, projections) is
    replicated."""

    def spec(leaf):
        return P("stage", *([None] * (np.ndim(leaf) - 1)))

    return {
        k: (jax.tree.map(spec, v) if k == "blocks" else jax.tree.map(lambda x: P(), v))
        for k, v in params.items()
    }


def shard_params_for_pipeline(params: Params, mesh: Mesh) -> Params:
    """Place a DiT param tree on a pipeline mesh (stage-sharded blocks)."""
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        pipeline_param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)


def _stage_pipeline(
    cfg: DiTConfig, stages: int, num_microbatches: int, has_mask: bool,
    has_dropout: bool, has_data_axis: bool,
):
    """The per-device stage program run under shard_map.

    Receives this stage's block slice [d_local, ...] and mod slice
    [d_local, b, 6*dim] (plus, when training, this stage's per-(layer,
    microbatch) dropout key data [d_local, M, 2]), plus the (data-sharded,
    stage-replicated) hidden states, and executes the fill-and-drain
    schedule."""
    M = num_microbatches

    def local_scan(blocks, mods, keys, h, mask, freqs):
        def body(carry, xs):
            bp, mod, kd = xs
            out = B.dit_block(
                bp, carry, None, cfg.heads,
                mask=mask, rope_freqs=freqs,
                use_flash=cfg.use_flash_attention, mod=mod,
                dropout_rate=cfg.dropout if has_dropout else 0.0,
                dropout_key=jax.random.wrap_key_data(kd) if has_dropout else None,
            )
            return out, None

        if keys is None:  # keep the scan xs a pure-array pytree
            keys = jnp.zeros((mods.shape[0], 2), jnp.uint32)
        h, _ = jax.lax.scan(body, h, (blocks, mods, keys))
        return h

    def stage_fn(blocks, mods, keys, h, mask, cos, sin):
        # h: [b_local, n, dim]; mods: [d_local, b_local, 6*dim]
        b_local = h.shape[0]
        if b_local % M:
            raise ValueError(
                f"per-data-shard batch {b_local} not divisible by "
                f"num_microbatches={M}"
            )
        mb = b_local // M
        h_mbs = h.reshape(M, mb, *h.shape[1:])
        mask_mbs = mask.reshape(M, mb, mask.shape[-1]) if has_mask else None
        # mods' batch axis microbatches too: [d_local, M, mb, 6*dim]
        mods_mbs = mods.reshape(mods.shape[0], M, mb, mods.shape[-1])
        if has_dropout:
            # DP replicas draw independent masks (sequential semantics give
            # every sample an independent mask; folding the data index keeps
            # that across shards)
            data_ix = jax.lax.axis_index("data") if has_data_axis else 0
            keys = jax.vmap(jax.vmap(
                lambda kd: jax.random.key_data(
                    jax.random.fold_in(jax.random.wrap_key_data(kd), data_ix)
                )
            ))(keys)  # [d_local, M, 2]
        idx = jax.lax.axis_index("stage")
        freqs = (cos, sin)
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def tick(carry, t):
            buf, outs = carry
            # stage s works on microbatch t - s (clipped during fill/drain)
            m_idx = jnp.clip(t - idx, 0, M - 1)
            h_in = jnp.where(idx == 0, h_mbs[m_idx], buf)
            m = mask_mbs[m_idx] if has_mask else None
            k = keys[:, m_idx] if has_dropout else None
            y = local_scan(blocks, mods_mbs[:, m_idx], k, h_in, m, freqs)
            valid = (t - idx >= 0) & (t - idx < M)
            is_last = idx == stages - 1
            outs = outs.at[m_idx].set(jnp.where(is_last & valid, y, outs[m_idx]))
            buf = jax.lax.ppermute(y, "stage", perm)
            return (buf, outs), None

        init = (jnp.zeros_like(h_mbs[0]), jnp.zeros_like(h_mbs))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + stages - 1))
        # outputs accumulated on the last stage only; replicate across stages
        outs = jax.lax.psum(
            jnp.where(idx == stages - 1, outs, jnp.zeros_like(outs)), "stage"
        )
        return outs.reshape(b_local, *h.shape[1:])

    return stage_fn


def dit_forward_pipelined(
    params: Params,
    cfg: DiTConfig,
    x: jax.Array,  # [b, n, mel]
    cond: jax.Array,  # [b, n, mel]
    text: jax.Array,  # [b, nt] int ids padded with -1
    time: jax.Array,  # [b] or scalar in [0, 1]
    *,
    mesh: Mesh,
    num_microbatches: int | None = None,
    drop_audio_cond=False,
    drop_text=False,
    mask: jax.Array | None = None,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """`dit_forward` with the block stack executed as a GPipe pipeline over
    the mesh's "stage" axis -> [b, n, mel] float32. Same math, same
    signature surface (incl. dropout via `dropout_key`, rate from
    cfg.dropout — masks are drawn per (layer, microbatch, data shard), see
    module docstring); params must be placed with
    `shard_params_for_pipeline`. Jit-compatible (jit the caller; shard_map
    composes)."""
    if "stage" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'stage' axis")
    stages = mesh.shape["stage"]
    depth = cfg.depth
    if depth % stages:
        raise ValueError(f"depth {depth} not divisible by {stages} stages")
    M = num_microbatches if num_microbatches is not None else max(1, stages)

    dtype = jnp.dtype(cfg.compute_dtype)
    batch, seq = x.shape[0], x.shape[1]

    text_embed = dit_text_embed(params, cfg, text, seq, drop_text=drop_text)
    time = jnp.asarray(time)
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (batch,))
    t_emb = B.timestep_embedding(params["time_embed"], time, dtype=dtype)  # [b, dim]

    h = B.input_embedding(
        params["input_embed"], x.astype(dtype), cond.astype(dtype), text_embed,
        drop_audio_cond=drop_audio_cond,
    )
    # whole-depth AdaLN schedule, stage-sharded alongside the blocks
    block_mods = jax.vmap(lambda bp: B.adaln_mods(bp, t_emb))(
        params["blocks"]["attn_norm"]
    )  # [depth, b, 6*dim]
    raw = rotary_freqs(seq, cfg.dim_head)
    cos, sin = jnp.cos(raw), jnp.sin(raw)

    has_mask = mask is not None
    has_dropout = dropout_key is not None and cfg.dropout > 0.0
    data_ax = "data" if "data" in mesh.axis_names else None

    key_data = None
    if has_dropout:
        # per-(layer, microbatch) keys, pre-split outside the pipeline and
        # stage-sharded alongside the blocks (as raw uint32 key data —
        # typed key arrays don't cross shard_map specs)
        key_data = jax.random.key_data(
            jax.random.split(dropout_key, depth * M)
        ).reshape(depth, M, -1)

    stage_fn = _stage_pipeline(
        cfg, stages, M, has_mask, has_dropout, data_ax is not None
    )

    # shard_map wants array args; bind away whichever of (keys, mask) is None
    args = [params["blocks"], block_mods]
    specs = [
        jax.tree.map(lambda _: P("stage"), params["blocks"]),  # leading depth axis
        P("stage", data_ax),  # block_mods [depth, b, 6*dim]
    ]
    if has_dropout:
        args.append(key_data)
        specs.append(P("stage"))  # [depth, M, 2]
    args.append(h)
    specs.append(P(data_ax))  # h [b, n, dim]
    if has_mask:
        args.append(mask)
        specs.append(P(data_ax))  # mask [b, n]
    args += [cos, sin]
    specs += [P(), P()]

    def fn(*xs):
        it = iter(xs)
        blocks_, mods_ = next(it), next(it)
        keys_ = next(it) if has_dropout else None
        h_ = next(it)
        mask_ = next(it) if has_mask else None
        return stage_fn(blocks_, mods_, keys_, h_, mask_, next(it), next(it))

    h = shard_map(
        fn, mesh=mesh, in_specs=tuple(specs), out_specs=P(data_ax),
        check_rep=False,
    )(*args)

    h = B.adaln_zero_final(params["norm_out"], h, t_emb)
    out = linear(params["proj_out"], h)
    return out.astype(jnp.float32)
