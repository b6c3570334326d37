"""Host data-pipeline throughput: native C++ WAV decode vs pure Python.

The reference delegates its loader to mlx.data's C++ stages (reference:
data.py:6-17, 203-211); here the decode hot path is `ops/native`'s C++
decoder behind the same threaded `Stream.map` stage. This benchmark writes a
synthetic LibriTTS-shaped corpus to a temp dir and measures end-to-end
pipeline throughput (scan -> threaded decode -> pad/batch) with each decoder,
plus the raw decode rate.

Usage: python tools/loader_bench.py [--clips 256] [--seconds 6] [--threads 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from f5_tts_tpu.audio.io import read_wav, write_wav
from f5_tts_tpu.data.libritts import SAMPLE_RATE, decode_sample, load_dir
from f5_tts_tpu.data.loader import collate_audio_batch


def make_corpus(root: Path, clips: int, seconds: float) -> None:
    rng = np.random.default_rng(0)
    d = root / "train" / "0" / "0"
    d.mkdir(parents=True)
    n = int(seconds * SAMPLE_RATE)
    for i in range(clips):
        wave = (0.1 * rng.standard_normal(n)).astype(np.float32)
        write_wav(d / f"clip_{i}.wav", wave, SAMPLE_RATE)
        (d / f"clip_{i}.normalized.txt").write_text(f"synthetic clip number {i}")


def run_pipeline(root: Path, threads: int, raw: bool) -> tuple[int, float]:
    from f5_tts_tpu.data.loader import collate_raw_audio_batch

    collate = collate_raw_audio_batch if raw else collate_audio_batch
    stream = load_dir(root, max_duration=30)
    t0 = time.perf_counter()
    n = 0
    for batch in stream.map(decode_sample, num_threads=threads).batch(8, collate):
        n += len(batch["mel_len"])
    return n, time.perf_counter() - t0


def raw_decode_rate(files: list[Path], fn) -> float:
    t0 = time.perf_counter()
    for f in files:
        fn(str(f))
    return len(files) / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        make_corpus(root, args.clips, args.seconds)
        files = sorted(root.rglob("*.wav"))

        from f5_tts_tpu.ops.native import wav_decode

        native_rate = raw_decode_rate(files, wav_decode)
        python_rate = raw_decode_rate(files, read_wav)

        clips, dt = run_pipeline(root, args.threads, raw=False)
        clips_raw, dt_raw = run_pipeline(root, args.threads, raw=True)
        audio_s = clips * args.seconds

        print(json.dumps({
            "native_decode_clips_per_s": round(native_rate, 1),
            "python_decode_clips_per_s": round(python_rate, 1),
            "native_speedup": round(native_rate / python_rate, 2),
            "pipeline_hostmel_audio_s_per_s": round(audio_s / dt, 1),
            "pipeline_rawaudio_audio_s_per_s": round(clips_raw * args.seconds / dt_raw, 1),
            "threads": args.threads,
            "clip_seconds": args.seconds,
        }))


if __name__ == "__main__":
    main()
