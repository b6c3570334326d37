"""Serving latency on the real chip: warm request latency, streaming TTFA,
and mixed-load latency under the one-group-at-a-time scheduler.

Starts the HTTP server in-process (ONE JAX process rule), warms the relevant
duration buckets / batch sizes through the live batcher, then measures:

  - warm_synthesize_s: median end-to-end POST /synthesize (7 s utterance,
    RK4 @ 8 steps)
  - stream_ttfa_s: time to first PCM chunk of a warm 4-sentence
    /synthesize_stream request
  - mixed_load_added_s: latency of a small request issued while a 3-request
    big-bucket burst is in flight, minus its idle-latency baseline — the
    head-of-line-blocking bound the scheduler promises

Run alone on the chip: python tools/serve_latency.py
Prints one JSON line per metric.

--artifact-bench instead measures the ARTIFACT server's micro-batching
(artifact_serve.ArtifactBatcher): it exports batch-1 and batch-4 sampler
artifacts from the same model, serves them, and compares 8 sequential
requests against 8 concurrent ones — the throughput delta the batch-N
artifacts buy under concurrent load.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def post(port: int, payload: dict, path: str = "/synthesize", timeout: float = 600.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=timeout)


def _build_model():
    from f5_tts_tpu.config import F5TTS_V1_BASE, CFMConfig, VocosConfig
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.vocos import Vocos

    dit_cfg = F5TTS_V1_BASE.replace(compute_dtype="bfloat16")
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(compute_dtype="bfloat16"))
    return F5TTS.init(jax.random.key(0), dit_cfg, cfm_cfg=CFMConfig(),
                      vocoder=vocoder.decode)


def artifact_bench(seconds: float = 7.0, n_requests: int = 8) -> None:
    """Sequential-vs-concurrent throughput through the artifact server."""
    import tempfile

    from f5_tts_tpu import export as E
    from f5_tts_tpu.artifact_serve import serve_artifacts

    model = _build_model()
    frames = int(seconds * model.audio_cfg.frames_per_second)
    bucket = model.cfm_cfg.duration_bucket
    # the SAME bucket the live path would jit for this request (the 2 s ref
    # keeps lens+1 well under it) — an oversized window inflates every call
    # by padded/needed FLOPs on a compute-bound chip
    padded = -(-frames // bucket) * bucket
    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(dir=tmp_base) as tmp:
        paths = []
        for b in (1, 4):
            t0 = time.perf_counter()
            exp = E.export_sampler(model, batch=b, padded_len=padded, steps=8,
                                   method="rk4", embed_weights=False)
            path = os.path.join(tmp, f"b{b}.bin")
            E.save_sampler(exp, path, model=model,
                           extra_meta={"method": "rk4", "cfg_strength": 2.0})
            paths.append(path)
            print(json.dumps({"metric": f"export_b{b}_s",
                              "value": round(time.perf_counter() - t0, 1)}))
        sr = model.audio_cfg.sample_rate
        ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)
               ).astype(np.float32)
        payload = {"text": "an artifact serving throughput probe request",
                   "duration": seconds, "seed": 0}

        # two server configurations from the same exports: batch-1-only is
        # the control (no grouping possible), b1+b4 is the micro-batched
        # deployment — the delta isolates what the batch-N artifact buys
        # from what single-core HTTP thread contention costs
        seq = None
        for label, art_paths in (("b1only", paths[:1]), ("b1b4", paths)):
            httpd = serve_artifacts(
                art_paths, default_ref=(ref, "a throughput probe reference"),
                host="127.0.0.1", port=0, max_wait_ms=100.0,
            )
            port = httpd.server_address[1]
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            httpd.sampler.warmup()
            group_sizes = []
            orig_run = httpd.batcher._run_group
            httpd.batcher._run_group = (
                lambda g, _o=orig_run: (group_sizes.append(len(g)), _o(g))[1])

            def one(i=None):
                with post(port, payload) as r:
                    body = r.read()
                    if r.status != 200:
                        raise RuntimeError(
                            f"request {i}: HTTP {r.status} {body[:200]!r}")

            def worker(i, errors):
                try:
                    one(i)
                except Exception as e:  # record — a silently dead thread
                    errors.append(e)   # would inflate the throughput number

            one()  # residual warm (mel shapes etc.)
            if seq is None:  # grouping can't help a serial client; time once
                t0 = time.perf_counter()
                for i in range(n_requests):
                    one(i)
                seq = time.perf_counter() - t0
                print(json.dumps({
                    "metric": "artifact_throughput_sequential_utt_s",
                    "value": round(n_requests / seq, 3),
                    "total_s": round(seq, 3),
                }))
                group_sizes.clear()

            errors: list[Exception] = []
            threads = [threading.Thread(target=worker, args=(i, errors))
                       for i in range(n_requests)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            conc = time.perf_counter() - t0
            hung = [t for t in threads if t.is_alive()]
            if errors or hung:
                raise RuntimeError(
                    f"{label}: {len(errors)} failed, {len(hung)} hung of "
                    f"{n_requests} requests — throughput not recorded; "
                    f"first error: {errors[0] if errors else 'join timeout'}")

            print(json.dumps({
                "metric": f"artifact_throughput_concurrent_{label}_utt_s",
                "value": round(n_requests / conc, 3),
                "total_s": round(conc, 3),
                "speedup_vs_sequential": round(seq / conc, 2),
                "group_sizes": group_sizes,
            }))
            httpd.batcher.stop()
            httpd.shutdown()


def main() -> None:
    if "--artifact-bench" in sys.argv:
        return artifact_bench()

    from f5_tts_tpu.config import F5TTS_V1_BASE, CFMConfig, VocosConfig
    from f5_tts_tpu.models.cfm import F5TTS
    from f5_tts_tpu.models.vocos import Vocos
    from f5_tts_tpu.serve import serve, warmup

    dit_cfg = F5TTS_V1_BASE.replace(compute_dtype="bfloat16")
    vocoder = Vocos.init(jax.random.key(1), VocosConfig(compute_dtype="bfloat16"))
    model = F5TTS.init(jax.random.key(0), dit_cfg, cfm_cfg=CFMConfig(), vocoder=vocoder.decode)

    httpd = serve(model, host="127.0.0.1", port=0, max_batch=8, max_wait_ms=30.0)
    port = httpd.server_address[1]
    warmup(model, [5.0, 7.0, 9.0], steps=8, method="rk4",
           batch_sizes=(1, 2, 3), batcher=httpd.batcher)

    base = {"steps": 8, "method": "rk4", "seed": 0}

    # -- warm single-request latency --------------------------------------
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        with post(port, dict(base, text="a warm latency probe request", duration=7.0)) as r:
            r.read()
        times.append(time.perf_counter() - t0)
    warm = float(np.median(times))
    print(json.dumps({"metric": "warm_synthesize_s", "value": round(warm, 3),
                      "runs": [round(t, 3) for t in times]}))

    # -- streaming TTFA ----------------------------------------------------
    stream_payload = dict(base, text=(
        "The first sentence streams immediately. Then a second one follows. "
        "A third continues the story. And a fourth concludes it."
    ))
    for attempt in range(2):  # first run pays any residual compiles
        t0 = time.perf_counter()
        with post(port, stream_payload, path="/synthesize_stream") as r:
            r.read(44)  # WAV stream header
            r.read(2)  # first PCM bytes of sentence 0
            ttfa = time.perf_counter() - t0
            r.read()  # drain
            total = time.perf_counter() - t0
    print(json.dumps({"metric": "stream_ttfa_s", "value": round(ttfa, 3),
                      "stream_total_s": round(total, 3)}))

    # -- mixed load: small request during a big-bucket burst ---------------
    burst_done = []

    def burst(i):
        with post(port, dict(base, text=f"long backfill request number {i}", duration=9.0)) as r:
            r.read()
        burst_done.append(time.perf_counter())

    threads = [threading.Thread(target=burst, args=(i,)) for i in range(3)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(0.25)  # land mid-flight of the burst group
    t0 = time.perf_counter()
    with post(port, dict(base, text="urgent small request", duration=5.0)) as r:
        r.read()
    small_latency = time.perf_counter() - t0
    for t in threads:
        t.join(timeout=600)
    burst_span = max(burst_done) - t_start
    print(json.dumps({
        "metric": "mixed_load_small_request_s",
        "value": round(small_latency, 3),
        "idle_baseline_s": round(warm, 3),
        "added_s": round(small_latency - warm, 3),
        "burst_total_s": round(burst_span, 3),
    }))

    httpd.batcher.stop()
    httpd.shutdown()


if __name__ == "__main__":
    main()
