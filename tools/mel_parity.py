"""Mel-spectrogram parity vs the MLX reference.

BASELINE.md's fidelity criterion is mel MAE < 1e-3 vs the MLX reference at 32
ODE steps. The MLX runtime needs Apple silicon, so this tool compares against
artifacts exported from the reference on such a machine:

On the reference side (Apple silicon):
    mel, _ = f5tts.sample(..., steps=32, method="euler", seed=S)   # no vocoder
    np.save("ref_mel.npy", np.array(mel))

Here:
    python tools/mel_parity.py --ref ref_mel.npy --model <snapshot> \
        --ref-audio ref.wav --ref-text "..." --text "..." --duration D --seed S

Prints the MAE over the generated (non-conditioning) region. Note that
bit-exact trajectory parity additionally requires feeding the SAME y0 noise
(MLX and JAX PRNGs differ); pass --y0 noise.npy exported from the reference
(cfm.py:369-375) for the strict comparison.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help=".npy mel from the MLX reference [b, n, d]")
    ap.add_argument("--model", default="lucasnewman/f5-tts-mlx")
    ap.add_argument("--ref-audio", required=True)
    ap.add_argument("--ref-text", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--duration", type=int, required=True, help="frames")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--method", default="euler")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--y0", default=None, help="optional .npy noise exported from the reference")
    args = ap.parse_args()

    from f5_tts_tpu.audio.io import read_wav
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

    model = F5TTS.from_pretrained(args.model)
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
    ref_frames = audio.shape[0] // 256
    mae_full = float(np.abs(ours[:, :n] - ref[:, :n]).mean())
    mae_gen = float(np.abs(ours[:, ref_frames:n] - ref[:, ref_frames:n]).mean())
    print(f"mel MAE (full): {mae_full:.6f}")
    print(f"mel MAE (generated region): {mae_gen:.6f}  (target < 1e-3 with shared y0)")


if __name__ == "__main__":
    main()
