"""LibriSpeech-PC cross-sentence zero-shot evaluation harness.

The reference ships the F5-TTS paper's eval list
(`data/librispeech_pc_test_clean_cross_sentence.lst`, 1127 rows) but wires it
to nothing (reference repo inventory; SURVEY.md §4). This tool implements the
protocol end to end: each row names a PROMPT utterance (audio + transcript +
duration) and a TARGET utterance (transcript + ground-truth duration) from a
different utterance of the same speaker; the model synthesizes the target
conditioned on the prompt at total duration = prompt + target seconds (the
paper's ground-truth-duration setting), and the continuation is written as
`{target_id}.wav` plus a `manifest.tsv` for downstream WER / speaker-
similarity scoring (seed-tts-eval tooling consumes exactly this layout).

Row format (tab-separated):
    prompt_id  prompt_dur_s  prompt_text  target_id  target_dur_s  target_text

Audio layout: LibriSpeech `{audio_dir}/{speaker}/{chapter}/{utt_id}.{wav,flac}`
or flat `{audio_dir}/{utt_id}.{wav,flac}`. FLAC needs soundfile on the host;
WAV works everywhere (audio/io.py). 16 kHz prompts are resampled to the
model's rate on the host (audio/resample.py).

TPU-shaped execution: rows are length-grouped by duration bucket (the same
static-shape bucketing as serving) and run through `F5TTS.sample` in batches,
so the 1127-row list is a few dozen compiles + large batched forwards instead
of 1127 single-utterance dispatches.

Example:
    python tools/eval_librispeech.py \
        --lst librispeech_pc_test_clean_cross_sentence.lst \
        --audio-dir LibriSpeech/test-clean --out eval_out \
        --model <snapshot-dir> --batch 8 --steps 32 --method euler
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from f5_tts_tpu.audio.io import read_wav, write_wav
from f5_tts_tpu.audio.resample import resample
from f5_tts_tpu.generate import TARGET_RMS
from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin


@dataclasses.dataclass
class Row:
    prompt_id: str
    prompt_dur: float
    prompt_text: str
    target_id: str
    target_dur: float
    target_text: str


def parse_lst(path: str | Path) -> list[Row]:
    rows = []
    for ln, line in enumerate(Path(path).read_text().splitlines(), 1):
        if not line.strip():
            continue
        parts = line.split("\t")
        if len(parts) != 6:
            raise ValueError(f"{path}:{ln}: expected 6 tab-separated fields, got {len(parts)}")
        rows.append(Row(parts[0], float(parts[1]), parts[2], parts[3], float(parts[4]), parts[5]))
    return rows


def find_audio(audio_dir: Path, utt_id: str) -> Path:
    """LibriSpeech nests by speaker/chapter (utt ids are spk-chap-idx);
    also accept a flat directory (handy for subsets / fixtures)."""
    spk_chap = utt_id.split("-")[:2]
    candidates = []
    for ext in (".wav", ".flac"):
        if len(spk_chap) == 2:
            candidates.append(audio_dir / spk_chap[0] / spk_chap[1] / f"{utt_id}{ext}")
        candidates.append(audio_dir / f"{utt_id}{ext}")
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        f"no audio for {utt_id} under {audio_dir} (tried {[str(c) for c in candidates]})"
    )


def load_prompt(path: Path, target_sr: int) -> np.ndarray:
    """Read, mono-ize, resample to the model rate, and RMS-normalize the
    prompt the same way generation does (reference: generate.py:154-156)."""
    if path.suffix == ".flac":
        try:
            import soundfile as sf
        except ImportError as e:
            raise RuntimeError(
                f"{path} is FLAC; install soundfile on the eval host or "
                "pre-convert the subset to WAV"
            ) from e
        audio, sr = sf.read(str(path))
        audio = audio.astype(np.float32)
    else:
        audio, sr = read_wav(path)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    audio = resample(audio, sr, target_sr)
    rms = float(np.sqrt(np.mean(np.square(audio)))) if audio.size else 0.0
    if 0.0 < rms < TARGET_RMS:
        audio = audio * TARGET_RMS / rms
    return audio


def run_eval(args) -> dict:
    import jax.numpy as jnp

    from f5_tts_tpu.models.cfm import F5TTS, clamp_duration

    model = F5TTS.from_pretrained(args.model, quantization_bits=args.q)
    if args.w8a8:
        if args.q:
            raise SystemExit("--q and --w8a8 cannot be combined (see generate.py)")
        model.dit_cfg = model.dit_cfg.replace(int8_compute=True)
    if args.mesh_data > 1 or args.mesh_model > 1:
        from f5_tts_tpu.parallel.mesh import create_mesh

        model.use_mesh(create_mesh(data=args.mesh_data, model=args.mesh_model))
    sr = model.audio_cfg.sample_rate
    hop = model.audio_cfg.hop_length
    fps = model.audio_cfg.frames_per_second
    bucket = model.cfm_cfg.duration_bucket

    rows = parse_lst(args.lst)
    if args.limit:
        rows = rows[: args.limit]
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    audio_dir = Path(args.audio_dir)

    # host-side prep: prompt mel frames + token ids + total duration per row
    prompts: list[np.ndarray] = []
    ref_frames: list[int] = []
    durations: list[int] = []
    for r in rows:
        wave = load_prompt(find_audio(audio_dir, r.prompt_id), sr)
        prompts.append(wave)
        ref_frames.append(wave.shape[0] // hop)
        durations.append(int(round((r.prompt_dur + r.target_dur) * fps / args.speed)))
    texts = convert_char_to_pinyin(
        [r.prompt_text + " " + r.target_text for r in rows]
    )
    text_ids_list = [model._tokenize([t]) for t in texts]
    text_lens = np.array([t.shape[1] for t in text_ids_list], dtype=np.int32)
    durations = clamp_duration(
        np.asarray(durations, dtype=np.int32),
        np.asarray(ref_frames, dtype=np.int32),
        text_lens,
        model.cfm_cfg.max_duration,
    )

    # length-grouped sub-batching (the serving scheduler's grouping): rows
    # pad only to their own duration bucket; within a group, prompts pad to
    # the group's longest prompt and `lens` carries each true length
    groups: dict[int, list[int]] = {}
    for i, d in enumerate(durations):
        groups.setdefault(-(-max(int(d), 1) // bucket), []).append(i)

    manifest = []
    done = 0
    for _, idxs in sorted(groups.items()):
        for start in range(0, len(idxs), args.batch):
            sub = idxs[start : start + args.batch]
            # bucket the prompt length so the (batched) mel jit compiles once
            # per 256-frame class instead of once per distinct clip length
            max_ref = max(ref_frames[i] for i in sub)
            mel_len = -(-max(max_ref, 1) // 256) * 256
            wav_buf = np.zeros((len(sub), mel_len * hop), np.float32)
            max_text = max(text_ids_list[i].shape[1] for i in sub)
            tids = np.full((len(sub), max_text), -1, np.int32)
            for j, i in enumerate(sub):
                n = min(prompts[i].shape[0], wav_buf.shape[1])
                wav_buf[j, :n] = prompts[i][:n]
                tids[j, : text_ids_list[i].shape[1]] = text_ids_list[i][0]
            cond = model._mel_spec(jnp.asarray(wav_buf))  # [b, ~mel_len, d]
            waves, _ = model.sample(
                cond,
                text=jnp.asarray(tids),
                duration=durations[np.asarray(sub)],
                lens=np.asarray([ref_frames[i] for i in sub], dtype=np.int32),
                steps=args.steps,
                method=args.method,
                cfg_strength=args.cfg,
                sway_sampling_coef=args.sway,
                seed=args.seed,
                return_trajectory=False,
            )
            waves = np.asarray(waves)
            if waves.ndim == 1:
                waves = waves[None, :]
            for j, i in enumerate(sub):
                end = min((int(durations[i]) - 1) * hop, waves.shape[1])
                piece = waves[j, ref_frames[i] * hop : end]
                out_path = out_dir / f"{rows[i].target_id}.wav"
                write_wav(out_path, piece, sr)
                manifest.append(
                    (rows[i].target_id, str(out_path), f"{piece.shape[0] / sr:.3f}",
                     rows[i].target_text)
                )
            done += len(sub)
            print(f"[{done}/{len(rows)}] bucket<= {max(int(durations[i]) for i in sub)} frames")

    manifest.sort()
    with open(out_dir / "manifest.tsv", "w") as f:
        for entry in manifest:
            f.write("\t".join(entry) + "\n")
    summary = {
        "rows": len(rows),
        "generated": len(manifest),
        "out_dir": str(out_dir),
        "steps": args.steps,
        "method": args.method,
        "total_generated_s": round(sum(float(m[2]) for m in manifest), 2),
    }
    (out_dir / "summary.json").write_text(json.dumps(summary) + "\n")
    return summary


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--lst", required=True, help="cross-sentence eval list (6-column TSV)")
    p.add_argument("--audio-dir", required=True, help="LibriSpeech test-clean root (or flat dir)")
    p.add_argument("--out", required=True, help="output directory for wavs + manifest")
    p.add_argument("--model", default="lucasnewman/f5-tts-mlx",
                   help="model name or local snapshot dir")
    p.add_argument("--batch", type=int, default=8, help="max rows per forward")
    p.add_argument("--steps", type=int, default=32,
                   help="ODE steps (the paper's eval setting is NFE 32)")
    p.add_argument("--method", default="euler", choices=["euler", "midpoint", "rk4"])
    p.add_argument("--cfg", type=float, default=2.0)
    p.add_argument("--sway", type=float, default=-1.0)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--q", type=int, default=None, choices=[4, 8],
                   help="quantized snapshot variant")
    p.add_argument("--w8a8", action="store_true", default=False,
                   help="int8-compute inference (same opt-in as generate --w8a8)")
    p.add_argument("--mesh-data", type=int, default=1,
                   help="shard each eval batch over N chips (data parallel)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel ways over attention heads / FF hidden")
    p.add_argument("--limit", type=int, default=0, help="evaluate only the first N rows")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    summary = run_eval(args)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
