"""Measurable multichip evidence: numerical equivalence + collective counts.

Runs the sharded DP(+TP) train step and batched TP-sharded sampling on
N-virtual-device CPU meshes (N in {1, 2, 4, 8} by default), asserting
per-step numerical equivalence against the single-device run and reporting
the XLA collectives GSPMD inserted (counted in the compiled HLO), so the
DP/TP claims in docs/PERFORMANCE.md carry checked-in evidence.

Run:  python tools/scaling.py [--out docs/SCALING.md]
(self-provisions an 8-virtual-CPU platform; do not pre-initialize JAX.)

Reference point: the reference has no parallelism at all (SURVEY.md §2c);
this validates the TPU-idiomatic scale-out path end to end.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import cfm_sample_mel
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    sequence_sharding,
    shard_params,
    shard_state,
    shard_train_step,
    state_specs,
)
from f5_tts_tpu.training.trainer import init_train_state, make_optimizer, make_train_step

CFG = DiTConfig(
    dim=128, depth=2, heads=4, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=64, text_dim=64, conv_layers=1,
    use_flash_attention=False, compute_dtype="float32",
)
CFM_CFG = CFMConfig()
GLOBAL_BATCH = 8
SEQ = 64
STEPS = 3

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all")

# everything from this heading down in docs/SCALING.md is hand-maintained
# (usage guide + multi-host notes) and preserved across --out regenerations
_TAIL_MARKER = "## Gradient accumulation + FSDP (ZeRO)"


def count_collectives(hlo: str) -> dict[str, int]:
    return {
        c: len(re.findall(rf"\b{re.escape(c)}(?:-start|-done)?\(", hlo)) for c in COLLECTIVES
    }


def fmt_collectives(counts: dict[str, int]) -> str:
    nz = {k: v for k, v in counts.items() if v}
    return ", ".join(f"{k}×{v}" for k, v in nz.items()) if nz else "none"


def train_batch():
    mel = jax.random.normal(jax.random.key(1), (GLOBAL_BATCH, SEQ, CFG.mel_dim))
    text = jnp.zeros((GLOBAL_BATCH, SEQ), jnp.int32)
    lens = jnp.full((GLOBAL_BATCH,), SEQ, jnp.int32)
    return mel, text, lens


def run_training(
    n: int, devices, seq_par: int = 1, fsdp: bool = False
) -> tuple[list[float], dict[str, int]]:
    model_par = 2 if n >= 2 else 1
    mesh = create_mesh(
        data=n // (model_par * seq_par), model=model_par, seq=seq_par, devices=devices[:n]
    )

    params = init_dit(jax.random.key(0), CFG)
    optimizer = make_optimizer(learning_rate=1e-4, total_steps=100)
    state = shard_state(init_train_state(params, optimizer), mesh, fsdp=fsdp)

    step = shard_train_step(make_train_step(CFG, CFM_CFG, optimizer), mesh, state, fsdp=fsdp)

    mel, text, lens = train_batch()
    dsh, ssh = batch_sharding(mesh), sequence_sharding(mesh)
    mel, text = (jax.device_put(x, ssh) for x in (mel, text))
    lens = jax.device_put(lens, dsh)

    lowered = step.lower(state, mel, text, lens, jax.random.key(2))
    hlo = lowered.compile().as_text()

    losses = []
    for i in range(STEPS):
        state, loss = step(state, mel, text, lens, jax.random.key(2 + i))
        losses.append(float(loss))
    return losses, count_collectives(hlo)


def run_sampling(n: int, devices) -> tuple[np.ndarray, dict[str, int]]:
    model_par = 2 if n >= 2 else 1
    mesh = create_mesh(data=n // model_par, model=model_par, devices=devices[:n])

    params = shard_params(init_dit(jax.random.key(0), CFG), mesh)
    dsh = batch_sharding(mesh)
    b = GLOBAL_BATCH
    y0 = jax.device_put(jax.random.normal(jax.random.key(1), (b, SEQ, CFG.mel_dim)), dsh)
    step_cond = jax.device_put(jax.random.normal(jax.random.key(2), (b, SEQ, CFG.mel_dim)), dsh)
    text = jax.device_put(jnp.zeros((b, SEQ), jnp.int32), dsh)
    mask = jax.device_put(jnp.ones((b, SEQ), bool), dsh)
    ts = jnp.linspace(0.0, 1.0, 5)

    kwargs = dict(method="euler", cfg_strength=2.0, has_mask=True, return_trajectory=False)
    lowered = cfm_sample_mel.lower(params, CFG, y0, step_cond, text, mask, ts, **kwargs)
    hlo = lowered.compile().as_text()
    out = cfm_sample_mel(params, CFG, y0, step_cond, text, mask, ts, **kwargs)
    return np.asarray(out[-1]), count_collectives(hlo)


def run_pipeline(
    stages: int, data: int, devices, microbatches: int = 2
) -> tuple[float, dict[str, int]]:
    """GPipe pipeline over the depth axis (parallel/pipeline.py): max|Δ| of
    the pipelined DiT forward vs the sequential one, plus collective counts."""
    from f5_tts_tpu.models.dit import dit_forward
    from f5_tts_tpu.parallel.pipeline import (
        create_pipeline_mesh,
        dit_forward_pipelined,
        shard_params_for_pipeline,
    )

    cfg = CFG.replace(depth=4)  # divisible by up to 4 stages
    params = init_dit(jax.random.key(0), cfg)
    b = GLOBAL_BATCH
    keys = jax.random.split(jax.random.key(3), 4)
    x = jax.random.normal(keys[0], (b, SEQ, cfg.mel_dim))
    cond = jax.random.normal(keys[1], (b, SEQ, cfg.mel_dim))
    text = jax.random.randint(keys[2], (b, SEQ), -1, cfg.text_num_embeds)
    time = jax.random.uniform(keys[3], (b,))

    ref = dit_forward(params, cfg, x, cond, text, time)

    mesh = create_pipeline_mesh(stages=stages, data=data, devices=devices)
    p_sh = shard_params_for_pipeline(params, mesh)
    fn = jax.jit(
        lambda p, *a: dit_forward_pipelined(
            p, cfg, *a, mesh=mesh, num_microbatches=microbatches
        )
    )
    hlo = fn.lower(p_sh, x, cond, text, time).compile().as_text()
    out = fn(p_sh, x, cond, text, time)
    return float(np.abs(np.asarray(out) - np.asarray(ref)).max()), count_collectives(hlo)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the markdown report here")
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    ns = [int(s) for s in args.devices.split(",")]

    lines = [
        "# Multichip scaling evidence (virtual CPU mesh)",
        "",
        f"Generated by `python tools/scaling.py` — tiny config (dim={CFG.dim}, "
        f"depth={CFG.depth}), global batch {GLOBAL_BATCH}, {STEPS} train steps, "
        "4-step Euler sampling with batched CFG. DP×TP mesh: TP=2 whenever N≥2.",
        "",
        "| N devices | mesh (data×model) | train losses (3 steps) | max|Δloss| vs N=1 "
        "| sample max|Δ| vs N=1 | train-step collectives | sampling collectives |",
        "|---|---|---|---|---|---|---|",
    ]

    base_losses = base_sample = None
    for n in ns:
        losses, train_coll = run_training(n, devices)
        sample, samp_coll = run_sampling(n, devices)
        if base_losses is None:
            base_losses, base_sample = losses, sample
            dl = ds = 0.0
        else:
            dl = max(abs(a - b) for a, b in zip(losses, base_losses))
            ds = float(np.abs(sample - base_sample).max())
        model_par = 2 if n >= 2 else 1
        loss_str = ", ".join(f"{v:.4f}" for v in losses)
        lines.append(
            f"| {n} | {n // model_par}×{model_par} | {loss_str} | {dl:.2e} | {ds:.2e} "
            f"| {fmt_collectives(train_coll)} | {fmt_collectives(samp_coll)} |"
        )
        tol = 5e-4
        assert dl < tol, f"N={n}: training diverged from single-device ({dl})"
        assert ds < tol, f"N={n}: sampling diverged from single-device ({ds})"
        print(lines[-1])

    # sequence-parallel row: 8 devices as DP2 x SP2 x TP2 — the training
    # activations' frame axis is sharded over "seq" (parallel/mesh.py)
    if 8 in ns and base_losses is not None:
        losses, train_coll = run_training(8, devices, seq_par=2)
        dl = max(abs(a - b) for a, b in zip(losses, base_losses))
        loss_str = ", ".join(f"{v:.4f}" for v in losses)
        lines.append(
            f"| 8 (seq-parallel) | 2×2×2 dp,sp,tp | {loss_str} | {dl:.2e} | — "
            f"| {fmt_collectives(train_coll)} | (training only) |"
        )
        assert dl < 5e-4, f"SP training diverged from single-device ({dl})"
        print(lines[-1])

    # FSDP/ZeRO row: 8 devices as DP4 x TP2 with params + Adam moments
    # sharded over "data" (parallel/mesh._with_fsdp) — same math, 1/4 the
    # per-device state; GSPMD adds the weight all-gathers / grad
    # reduce-scatters
    if 8 in ns and base_losses is not None:
        losses, train_coll = run_training(8, devices, fsdp=True)
        dl = max(abs(a - b) for a, b in zip(losses, base_losses))
        loss_str = ", ".join(f"{v:.4f}" for v in losses)
        lines.append(
            f"| 8 (FSDP/ZeRO) | 4×2 dp,tp + state over dp | {loss_str} | {dl:.2e} | — "
            f"| {fmt_collectives(train_coll)} | (training only) |"
        )
        assert dl < 5e-4, f"FSDP training diverged from single-device ({dl})"
        print(lines[-1])

    lines += [
        "",
        "Training losses and sampled mels agree with the single-device run to "
        "float32 collective-reduction tolerance at every mesh size; GSPMD "
        "inserts the expected collectives (gradient all-reduce over the data "
        "axis; all-gather/reduce-scatter pairs for the Megatron-style TP "
        "attention/FF shardings; halo exchanges / attention gathers for the "
        "sequence-parallel frame sharding; per-layer weight all-gathers and "
        "gradient reduce-scatter-equivalents for the FSDP state placement).",
    ]
    # pipeline-parallel rows: the depth axis sharded over "stage"
    # (parallel/pipeline.py), alone and composed with DP
    lines += [
        "",
        "## Pipeline parallelism (depth axis)",
        "",
        "GPipe-style PP from `parallel/pipeline.py`: the scan-stacked block",
        "params shard their leading depth axis over a \"stage\" mesh axis and",
        "microbatches stream through stages via `lax.ppermute` (depth=4 tiny",
        "config, 2 microbatches, forward vs the sequential `dit_forward`):",
        "",
        "| mesh (data×stage) | forward max|Δ| vs sequential | collectives |",
        "|---|---|---|",
    ]
    for stages, data in ((2, 1), (4, 1), (4, 2)):
        dp, coll = run_pipeline(stages, data, devices)
        lines.append(f"| {data}×{stages} | {dp:.2e} | {fmt_collectives(coll)} |")
        assert dp < 5e-5, f"PP {data}x{stages}: diverged from sequential ({dp})"
        print(lines[-1])
    lines += [
        "",
        "The `collective-permute` is the inter-stage activation handoff; it",
        "sits inside the tick loop (static count 1, executed M + S - 1 times",
        "per forward); the all-reduce replicates the last stage's outputs.",
        "Gradients",
        "through the pipeline match the sequential backward",
        "(`tests/test_pipeline.py::test_pipelined_grad_matches_sequential`).",
    ]

    lines += [
        "",
        "## Sharded serving (product surface)",
        "",
        "Mesh inference is exposed as a product feature: `python -m f5_tts_tpu.serve",
        "--mesh-data N [--mesh-model M]` (and `generate --mesh-data/--mesh-model`)",
        "re-place the loaded model with `F5TTS.use_mesh`: params get the TP layout,",
        "and every fused sampling call DP-shards its micro-batch over the mesh's data",
        "axis (batches padded to a multiple of N; padding trimmed from the outputs).",
        "Verified at the SERVE level on the 8-virtual-CPU mesh:",
        "`tests/test_mesh_serving.py::test_sharded_server_matches_unsharded` runs the",
        "same HTTP request against an unsharded server and a `data=4` mesh server and",
        "asserts identical PCM (±1 LSB of 16-bit quantization noise), and",
        "`::test_dp_tp_mesh_sample_matches_single_device` covers a 4×2 DP×TP mesh",
        "with an odd batch (exercising the DP padding path) and per-item durations.",
        "Both `sample` branches shard: the fused single-jit path and the segmented",
        "`cfg_interval` path (same DP padding + placement,",
        "`tests/test_cfg_interval.py::test_cfg_interval_composes_with_mesh`).",
        "Deserialized AOT artifacts (docs/SERVING.md) compose with the mesh too —",
        "`.call` re-traces into the current runtime, so DP-sharded inputs partition",
        "the artifact's computation (`tests/test_export.py::test_artifact_composes_with_mesh_dp`).",
    ]
    report = "\n".join(lines) + "\n"
    if args.out:
        # hand-maintained sections (grad-accum/FSDP guide, multi-host) live
        # below the generated evidence in the existing doc; preserve them
        if os.path.exists(args.out):
            with open(args.out) as f:
                old = f.read()
            idx = old.find(_TAIL_MARKER)
            if idx == -1:
                raise SystemExit(
                    f"refusing to overwrite {args.out}: tail marker "
                    f"{_TAIL_MARKER!r} not found — the hand-maintained "
                    "sections below it would be silently deleted. Update "
                    "_TAIL_MARKER to match the doc's first hand-written "
                    "heading, or pass a fresh --out path."
                )
            report += "\n" + old[idx:]
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
