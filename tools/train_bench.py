"""Training-step throughput on one chip (the reference publishes no
training numbers; this backs docs/PERFORMANCE.md's training table).

Measures the full jitted CFM train step — value_and_grad -> global-norm
clip -> AdamW (reference semantics: trainer.py:186-198, 226-227) — at a
fixed [batch, frames] shape, per-step host sync included (device_sync;
`block_until_ready` is a no-op on the axon tunnel).

Usage: python tools/train_bench.py [--config small|base] [--dtype bfloat16]
       [--remat] [--batch 4] [--frames 1024] [--steps 20] [--grad-accum k]

--grad-accum k keeps the EFFECTIVE batch fixed at --batch (microbatches of
batch/k scanned inside the step), so ms_per_step directly A/Bs the
accumulation overhead against the plain step at equal work.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import CFMConfig, F5TTS_SMALL, F5TTS_V1_BASE
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.training.trainer import (
    init_train_state,
    make_optimizer,
    make_train_step,
    make_train_step_from_audio,
)
from f5_tts_tpu.utils.profiling import device_sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=("small", "base"), default="small")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-tapsum", action="store_true", help="force XLA grouped-conv lowering")
    ap.add_argument("--no-flash", action="store_true", help="force jnp attention fallback")
    ap.add_argument("--from-audio", action="store_true",
                    help="raw-audio step: mel front-end inside the jitted step")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="accumulate over k microbatches of batch/k (effective batch unchanged)")
    args = ap.parse_args()
    if args.grad_accum > 1 and args.batch % args.grad_accum:
        ap.error(f"--batch {args.batch} not divisible by --grad-accum {args.grad_accum}")

    if args.no_tapsum:
        import f5_tts_tpu.utils.modules as _modules

        _modules.TAPSUM_GROUPED_CONV = False

    cfg = (F5TTS_SMALL if args.config == "small" else F5TTS_V1_BASE).replace(
        compute_dtype=args.dtype,
        remat=args.remat,
        use_flash_attention=not args.no_flash,
    )
    cfm_cfg = CFMConfig()
    optimizer = make_optimizer()
    params = init_dit(jax.random.key(0), cfg)
    state = init_train_state(params, optimizer)
    builder = make_train_step_from_audio if args.from_audio else make_train_step
    step = jax.jit(
        builder(cfg, cfm_cfg, optimizer, grad_accum=args.grad_accum),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    if args.from_audio:
        mel = jnp.asarray(
            0.1 * rng.standard_normal((args.batch, args.frames * 256)), jnp.float32
        )
    else:
        mel = jnp.asarray(rng.standard_normal((args.batch, args.frames, cfg.mel_dim)), jnp.float32)
    text = jnp.asarray(rng.integers(0, cfg.text_num_embeds, (args.batch, 64)), jnp.int32)
    lens = jnp.full((args.batch,), args.frames, jnp.int32)
    if args.grad_accum > 1:
        k, micro = args.grad_accum, args.batch // args.grad_accum
        mel = mel.reshape(k, micro, *mel.shape[1:])
        text = text.reshape(k, micro, *text.shape[1:])
        lens = lens.reshape(k, micro)

    # compile + first step
    t0 = time.perf_counter()
    state, loss = step(state, mel, text, lens, jax.random.key(1))
    device_sync(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, loss = step(state, mel, text, lens, jax.random.key(2 + i))
        device_sync(loss)
    dt = (time.perf_counter() - t0) / args.steps

    audio_s_per_step = args.batch * args.frames * 256 / 24_000
    print(
        json.dumps(
            {
                "config": args.config,
                "dtype": args.dtype,
                "remat": args.remat,
                "from_audio": args.from_audio,
                "batch": args.batch,
                "grad_accum": args.grad_accum,
                "frames": args.frames,
                "ms_per_step": round(dt * 1e3, 1),
                "audio_s_per_s": round(audio_s_per_step / dt, 1),
                "compile_s": round(compile_s, 1),
                "loss": float(loss),
            }
        )
    )


if __name__ == "__main__":
    main()
