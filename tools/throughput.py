"""Batched-synthesis throughput: utterances/sec/chip at 32 ODE steps.

Complements bench.py's single-utterance RTF with the serving-style metric
from BASELINE.json ("RTF + utterances/sec/chip at 32 ODE steps"): one chip,
a batch of utterances through one pjit'd forward.

Usage: python tools/throughput.py [--batch 8] [--steps 32] [--seconds 10]
       python tools/throughput.py --sweep 1,2,4,8,16 [--both]

--sweep measures several batch sizes through ONE model build (base-model
init pays the first-touch page cost once), printing one JSON line per
point; --both repeats the sweep with int8-COMPUTE (W8A8) matmuls. The
sweep is the BASELINE.json "utterances/sec/chip" scaling record: it shows
where the chip saturates (docs/PERFORMANCE.md "Batch scaling").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--w8a8", action="store_true",
                    help="int8-COMPUTE matmuls (DiTConfig.int8_compute)")
    ap.add_argument("--sweep", type=str, default=None,
                    help="comma-separated batch sizes; reuses one model build")
    ap.add_argument("--both", action="store_true",
                    help="with --sweep: measure float AND w8a8 at each batch")
    args = ap.parse_args()

    from f5_tts_tpu.config import F5TTS_V1_BASE, CFMConfig, VocosConfig
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.vocos import Vocos

    dit_cfg = F5TTS_V1_BASE.replace(compute_dtype="bfloat16", int8_compute=args.w8a8)
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(compute_dtype="bfloat16"))
    model = F5TTS.init(jax.random.key(0), dit_cfg, cfm_cfg=CFMConfig(), vocoder=vocoder.decode)

    sr = model.audio_cfg.sample_rate
    ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    duration = int(args.seconds * model.audio_cfg.frames_per_second)

    def measure(batch: int, w8a8: bool) -> dict:
        model.dit_cfg = model.dit_cfg.replace(int8_compute=w8a8)
        cond = jnp.broadcast_to(jnp.asarray(ref)[None, :], (batch, ref.shape[0]))
        cond_mel = model._mel_spec(cond)
        texts = ["benchmark utterance for throughput measurement"] * batch

        def run():
            wave, _ = model.sample(
                cond_mel, text=texts, duration=duration, steps=args.steps,
                method="euler", cfg_strength=2.0, sway_sampling_coef=-1.0, seed=0,
            )
            np.asarray(wave[..., :8])  # axon-safe sync
            return wave

        run()  # warmup/compile
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)

        wall = min(times)
        return {
            "metric": f"utterances_per_sec_1chip_{args.steps}steps"
                      + ("_w8a8" if w8a8 else ""),
            "value": round(batch / wall, 3),
            "unit": "utt/s",
            "batch": batch,
            "rtf_amortized": round(wall / (batch * args.seconds), 5),
        }

    if args.sweep:
        batches = [int(b) for b in args.sweep.split(",")]
        modes = [args.w8a8] if not args.both else [False, True]
        for w8a8 in modes:
            points = []
            for b in batches:
                r = measure(b, w8a8)
                points.append(r)
                print(json.dumps(r), flush=True)
            # knee = smallest batch achieving >=90% of the sweep's best
            # utt/s — past it, extra batch buys latency, not throughput
            # (sort by batch so an unordered --sweep list can't mislabel it)
            best = max(p["value"] for p in points)
            knee = next(p for p in sorted(points, key=lambda p: p["batch"])
                        if p["value"] >= 0.9 * best)
            print(json.dumps({
                "metric": "throughput_knee" + ("_w8a8" if w8a8 else ""),
                "batch": knee["batch"],
                "value": knee["value"],
                "unit": "utt/s",
                "note": "smallest batch within 10% of peak utt/s",
            }), flush=True)
        return

    print(json.dumps(measure(args.batch, args.w8a8)))


if __name__ == "__main__":
    main()
