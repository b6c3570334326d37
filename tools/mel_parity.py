"""Mel-spectrogram parity vs the MLX reference, and the turnkey real-weight
validation flow.

BASELINE.md's fidelity criterion is mel MAE < 1e-3 vs the MLX reference at 32
ODE steps. The MLX runtime needs Apple silicon and the published weights need
network access, so the comparison has two halves:

On the reference side (Apple silicon, once):
    mel, _ = f5tts.sample(..., steps=32, method="euler", seed=S)   # no vocoder
    np.save("ref_mel.npy", np.array(mel))
    # strict trajectory parity additionally needs the reference's y0 noise
    # (MLX and JAX PRNGs differ): np.save("noise.npy", y0)  (cfm.py:369-375)

Here (any networked host with this repo):
    python tools/mel_parity.py --snapshot lucasnewman/f5-tts-mlx \
        --revision <commit> --ref ref_mel.npy --ref-audio ref.wav \
        --ref-text "..." --text "..." --duration D --seed S [--y0 noise.npy]

`--snapshot` is the turnkey entry: it resolves the snapshot (downloading the
pinned revision when given a repo id; offline-friendly when given a local
dir), prints the artifact sha256 digests as a paste-ready
`utils/hub.PINNED_ARTIFACTS` entry, runs the 32-step comparison when --ref is
given, and exits 0 iff the generated-region MAE beats the north star — so the
day this code meets the real artifacts, validation is this one command.

reference: cfm.py:404-520 (the published-weight loading being validated).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

NORTH_STAR_MAE = 1e-3


def digests_entry(root: Path, repo_id: str) -> str:
    """The snapshot's sha256 digests as a paste-ready PINNED_ARTIFACTS item."""
    from f5_tts_tpu.utils.hub import sha256_file

    digests = {
        str(p.relative_to(root)): sha256_file(p)
        for p in sorted(root.rglob("*"))
        if p.is_file()
    }
    body = json.dumps(digests, indent=8).replace("}", "    }")
    return f'PINNED_ARTIFACTS["{repo_id}"] = {body}'


def run_comparison(model, args) -> tuple[float, float]:
    """(full MAE, generated-region MAE) of our 32-step mel vs the reference's."""
    import jax.numpy as jnp

    from f5_tts_tpu.audio.io import read_wav
    from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

    model._vocoder = None  # compare mels, not waveforms

    audio, sr = read_wav(args.ref_audio)
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    rms = float(np.sqrt(np.mean(np.square(audio))))
    if rms < 0.1:
        audio = audio * 0.1 / rms

    text = convert_char_to_pinyin([args.ref_text + " " + args.text])
    y0 = jnp.asarray(np.load(args.y0)) if args.y0 else None
    mel, _ = model.sample(
        jnp.asarray(audio)[None, :],
        text=text,
        duration=args.duration,
        steps=args.steps,
        method=args.method,
        cfg_strength=2.0,
        sway_sampling_coef=-1.0,
        seed=args.seed,
        y0=y0,
    )
    ours = np.asarray(mel)
    ref = np.load(args.ref)

    n = min(ours.shape[1], ref.shape[1])
    ref_frames = audio.shape[0] // model.audio_cfg.hop_length
    mae_full = float(np.abs(ours[:, :n] - ref[:, :n]).mean())
    mae_gen = float(np.abs(ours[:, ref_frames:n] - ref[:, ref_frames:n]).mean())
    return mae_full, mae_gen


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="validate real published weights against the mel-MAE north star"
    )
    ap.add_argument("--snapshot", default=None,
                    help="HF repo id (downloads --revision) or local snapshot dir; "
                         "prints a paste-ready PINNED_ARTIFACTS entry")
    ap.add_argument("--model", default=None,
                    help="legacy alias for --snapshot (no digest printing)")
    ap.add_argument("--revision", default=None,
                    help="Hub revision to pin when --snapshot is a repo id")
    ap.add_argument("--ref", default=None,
                    help=".npy mel from the MLX reference [b, n, d]; omit to only "
                         "resolve/digest the snapshot and smoke the load")
    ap.add_argument("--ref-audio", default=None)
    ap.add_argument("--ref-text", default=None)
    ap.add_argument("--text", default=None)
    ap.add_argument("--duration", type=int, default=None, help="frames")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--method", default="euler")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--y0", default=None,
                    help="optional .npy y0 noise exported from the reference")
    args = ap.parse_args(argv)

    if (args.snapshot is None) == (args.model is None):
        ap.error("pass exactly one of --snapshot / --model")

    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.utils.hub import fetch_from_hub

    if args.snapshot is not None:
        root = fetch_from_hub(args.snapshot, revision=args.revision)
        print(f"snapshot: {root}")
        print("# paste into f5_tts_tpu/utils/hub.py to pin this download:")
        print(digests_entry(root, args.snapshot))
        model = F5TTS.from_pretrained(str(root))
    else:
        model = F5TTS.from_pretrained(args.model)
    print("model loaded OK")

    if args.ref is None:
        print("no --ref mel given: digest/load validation only (PASS)")
        return 0
    for name in ("ref_audio", "ref_text", "text", "duration"):
        if getattr(args, name) is None:
            ap.error(f"--{name.replace('_', '-')} is required with --ref")

    mae_full, mae_gen = run_comparison(model, args)
    print(f"mel MAE (full): {mae_full:.6f}")
    print(f"mel MAE (generated region): {mae_gen:.6f}  "
          f"(north star < {NORTH_STAR_MAE:g} with shared y0)")
    ok = mae_gen < NORTH_STAR_MAE
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
