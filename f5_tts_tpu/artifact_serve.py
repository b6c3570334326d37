"""Minimal deployment server backed by AOT sampler artifacts.

This is the CONSUMER side of `f5_tts_tpu/export.py`'s deployment story: a
serving host that carries jax, this package's host-side utilities (the mel
front-end, the tokenizer, WAV plumbing) and one artifact file per duration
bucket — **no model weights/checkpoints are loaded, no model code is traced,
and nothing recompiles per shape at request time**: each artifact is a fixed
StableHLO program whose compilation environment was pinned at export time
(`serve.py`, by contrast, is the full product server around the LIVE model —
micro-batching across concurrent requests, overload protection). Long text
streams sentence-by-sentence via `/synthesize_stream` (chunked WAV, same
endpoint contract as serve.py's).

    f5-tts-tpu-export --model SNAP --out b256.bin --batch 1 --padded-len 256 \
        --steps 8 --method rk4 --external-weights
    f5-tts-tpu-export --model SNAP --out b512.bin --batch 1 --padded-len 512 ...
    python -m f5_tts_tpu.artifact_serve --artifact b256.bin --artifact b512.bin \
        --vocab SNAP/vocab.txt --ref ref.wav --ref-text "..."

Requests pick the smallest bucket that fits their clamped duration, exactly
like the live jit cache keys shapes. `duration` is client-supplied seconds;
requests that omit it resolve through the trained duration predictor when a
`--duration-artifact` (f5-tts-tpu-export --duration) is loaded, or the
byte-length heuristic otherwise / under `estimate_duration` — the same
two-tier behavior as the live server (serve.py:_predict_durations).

reference: no counterpart — the reference's inference needs the full MLX
Python stack + HF checkpoint downloads at startup (cfm.py:404-520).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from http.server import ThreadingHTTPServer

import numpy as np

from f5_tts_tpu.export import (
    load_duration,
    load_sampler,
    prep_duration_inputs,
    prep_inputs,
)
from f5_tts_tpu.generate import estimated_duration
from f5_tts_tpu.utils.tokenizer import (
    convert_char_to_pinyin,
    list_str_to_idx,
    list_str_to_tensor,
    load_vocab,
)


@dataclass
class Bucket:
    sampler: object  # Exported | BoundSampler
    spec: object  # SamplerSpec (sampling buckets) | DurationSpec (predictor)
    path: str


class ArtifactSampler:
    """The device surface: a sorted set of single-request buckets, a shared
    mel front-end, and a lock serializing device work (one in-flight
    computation — the same rule serve.py's batcher thread enforces)."""

    def __init__(self, artifact_paths: list[str], vocab_path: str | None = None,
                 duration_artifact: str | None = None):
        from f5_tts_tpu.audio.mel import MelSpec
        from f5_tts_tpu.config import AudioConfig

        if not artifact_paths:
            raise ValueError("need at least one --artifact")
        self.buckets: list[Bucket] = []
        for p in artifact_paths:
            sampler, spec = load_sampler(p)
            if spec.batch != 1:
                raise ValueError(
                    f"{p}: artifact batch={spec.batch}; this minimal server "
                    "serves one request at a time — export with --batch 1 "
                    "(micro-batched serving is serve.py's job)"
                )
            self.buckets.append(Bucket(sampler, spec, p))
        self.buckets.sort(key=lambda b: b.spec.padded_len)
        s0 = self.buckets[0].spec
        for b in self.buckets[1:]:
            if (b.spec.hop_length, b.spec.sample_rate, b.spec.mel_dim) != (
                s0.hop_length, s0.sample_rate, s0.mel_dim
            ):
                raise ValueError(
                    f"{b.path}: audio constants differ from {self.buckets[0].path}; "
                    "all artifacts must come from the same model"
                )
        self.spec = s0  # shared audio-domain constants
        self.audio_cfg = AudioConfig(
            sample_rate=s0.sample_rate, hop_length=s0.hop_length, n_mels=s0.mel_dim
        )
        self._mel = MelSpec.from_config(self.audio_cfg)
        self.vocab = load_vocab(vocab_path) if vocab_path else None
        self._device_lock = threading.Lock()

        # optional trained duration predictor (export.py:export_duration) —
        # without it, requests that omit `duration` fall back to the
        # byte-length heuristic (serve.py has the same two-tier behavior)
        self.duration: Bucket | None = None
        if duration_artifact:
            dsampler, dspec = load_duration(duration_artifact)
            if dspec.batch != 1:
                raise ValueError(
                    f"{duration_artifact}: duration artifact batch={dspec.batch}; "
                    "this server predicts one request at a time — export with "
                    "--batch 1"
                )
            if (dspec.hop_length, dspec.sample_rate, dspec.mel_dim) != (
                s0.hop_length, s0.sample_rate, s0.mel_dim
            ):
                raise ValueError(
                    f"{duration_artifact}: audio constants differ from "
                    f"{self.buckets[0].path}; the duration artifact must come "
                    "from the same model family"
                )
            self.duration = Bucket(dsampler, dspec, duration_artifact)

    def tokenize(self, texts: list[str]) -> np.ndarray:
        if self.vocab is not None:
            return list_str_to_idx(convert_char_to_pinyin(texts), self.vocab)
        return list_str_to_tensor(texts)

    def pick_bucket(self, needed_frames: int) -> Bucket:
        """Smallest bucket whose padded window holds `needed_frames` — which
        must be the CLAMPED requirement max(duration, ref_frames+1,
        text_len+1), not the raw requested duration: prep_inputs raises the
        duration to at least lens+1 (models/cfm.clamp_duration), so a bucket
        picked from the raw duration would spuriously reject requests whose
        reference or text pushes the clamp past it while a larger bucket
        fits (synthesize() below computes this)."""
        for b in self.buckets:
            if needed_frames <= b.spec.padded_len:
                return b
        raise ValueError(
            f"duration {needed_frames} frames exceeds the largest artifact "
            f"bucket ({self.buckets[-1].spec.padded_len}); export a bigger one"
        )

    def warmup(self) -> None:
        """Run every bucket once on silence so the first real request never
        pays the artifact's (fast, but not free) AOT program compile —
        the same role serve.py's --warmup plays for jit shapes."""
        import time

        for b in self.buckets:
            t0 = time.time()
            # direct bucket call (pick_bucket would route small durations to
            # the smallest bucket; warm THIS one)
            with self._device_lock:
                cond = np.zeros((1, 4, self.spec.mel_dim), np.float32)
                text = np.full((1, 4), -1, np.int32)
                args = prep_inputs(b.spec, cond, text, b.spec.padded_len, seed=0)
                out = b.sampler.call(*args)
                np.asarray(out[1] if isinstance(out, (tuple, list)) else out)
            print(f"warmed {b.path} (bucket {b.spec.padded_len}): "
                  f"{time.time() - t0:.1f}s")
        if self.duration is not None:
            t0 = time.time()
            with self._device_lock:
                d = self.duration.spec
                args = prep_duration_inputs(
                    d, np.zeros((1, 4, d.mel_dim), np.float32),
                    np.full((1, 4), -1, np.int32))
                np.asarray(self.duration.sampler.call(*args))
            print(f"warmed {self.duration.path} (duration predictor): "
                  f"{time.time() - t0:.1f}s")

    def _predict_duration_frames(
        self, ref_audio: np.ndarray, ref_text: str, text: str, speed: float,
        text_ids: np.ndarray | None = None,
    ) -> int:
        """Total frames from the exported duration predictor, mirroring the
        live path (serve.py:_predict_durations / models/cfm.predict_duration):
        reference mel over the artifact's fixed window with `lens` marking the
        real frames, seconds -> frames at sr // hop, divided by speed. A
        reference longer than the window is prefix-truncated — predicting the
        full duration from a prefix is the predictor's training task
        (reference: duration.py:232-237)."""
        d = self.duration.spec
        hop = self.audio_cfg.hop_length
        ref_frames = max(min(ref_audio.shape[0] // hop, d.padded_len), 1)
        buf = np.zeros((1, d.padded_len * hop), np.float32)
        n = min(ref_audio.shape[0], ref_frames * hop)
        buf[0, :n] = ref_audio[:n]
        if text_ids is None:
            text_ids = self.tokenize([ref_text + " " + text])
        with self._device_lock:
            cond = np.asarray(self._mel(buf), np.float32)[:, :ref_frames]
            args = prep_duration_inputs(
                d, cond, text_ids, lens=np.array([ref_frames], np.int32)
            )
            seconds = float(np.asarray(self.duration.sampler.call(*args))[0])
        frame_rate = d.sample_rate // d.hop_length
        # match the live path's rounding order exactly (cfm.predict_duration:
        # seconds*frame_rate truncates to int32 BEFORE the speed division)
        return max(int(int(seconds * frame_rate) / speed), 1)

    def plan(
        self,
        text: str,
        ref_audio: np.ndarray,
        ref_text: str,
        duration_frames: int | None,
        *,
        speed: float = 1.0,
        estimate: bool = False,
    ) -> tuple[int, np.ndarray, Bucket]:
        """Everything a request needs resolved BEFORE committing to a
        response: total frames (trained predictor when a duration artifact is
        loaded and `estimate` doesn't force the byte-length heuristic — the
        live server's two-tier behavior, serve.py:_predict_durations),
        tokenized ids, and the serving bucket. Raises ValueError for anything
        no bucket can hold — the streaming endpoint pre-plans every sentence
        so it never truncates a stream it already committed to."""
        hop = self.audio_cfg.hop_length
        text_ids = self.tokenize([ref_text + " " + text])
        if duration_frames is None:
            use_predictor = self.duration is not None and not estimate
            if use_predictor:
                # text longer than the predictor's fixed window cannot be
                # truncated meaningfully (prep_duration_inputs raises); the
                # live path handles such requests (text_embedding truncates to
                # the mel window, blocks.py:193), so fall back to the
                # byte-length heuristic instead of 400-ing the request
                text_len = int((text_ids != -1).sum(axis=-1).max())
                if text_len > self.duration.spec.padded_len:
                    use_predictor = False
            if use_predictor:
                duration_frames = self._predict_duration_frames(
                    ref_audio, ref_text, text, speed, text_ids=text_ids
                )
            else:
                duration_frames = int(
                    estimated_duration(
                        ref_audio, ref_text, text, speed,
                        hop_length=hop,
                        frames_per_second=self.audio_cfg.frames_per_second,
                    )
                    * self.audio_cfg.frames_per_second
                )
        duration_frames = min(max(duration_frames, 1), self.spec.max_duration)

        # bucket by the CLAMPED requirement: prep_inputs raises the duration
        # to at least lens+1 where lens = max(ref_frames, text_len), so the
        # bucket must fit that, not just the raw request
        text_len = int((text_ids != -1).sum(axis=-1).max()) if text_ids.size else 0
        largest = self.buckets[-1].spec.padded_len
        ref_frames = min(ref_audio.shape[0] // hop, largest - 1,
                         self.spec.max_duration - 1)
        bucket = self.pick_bucket(
            max(duration_frames, ref_frames + 1, text_len + 1)
        )
        return duration_frames, text_ids, bucket

    def synthesize(
        self,
        text: str,
        ref_audio: np.ndarray,
        ref_text: str,
        duration_frames: int | None,
        *,
        speed: float = 1.0,
        sway_sampling_coef: float | None = -1.0,
        seed: int = 0,
        estimate: bool = False,
    ) -> np.ndarray:
        """One request -> generated-region float wave (ref region trimmed),
        mirroring serve.py's frame-quantized trimming. A None duration
        resolves through `plan` (predictor / heuristic)."""
        hop = self.audio_cfg.hop_length
        duration_frames, text_ids, bucket = self.plan(
            text, ref_audio, ref_text, duration_frames,
            speed=speed, estimate=estimate,
        )
        largest = self.buckets[-1].spec.padded_len
        ref_frames = min(ref_audio.shape[0] // hop, largest - 1,
                         self.spec.max_duration - 1)
        with self._device_lock:
            # mel over a FIXED per-bucket window (zero-padded), so the mel
            # jit compiles once per bucket instead of once per distinct
            # reference length (the module's no-per-shape-recompile claim;
            # same pattern as serve.py._padded_refs). The STFT zero-pads
            # edges, so frames [0, ref_frames) match the exact-length call.
            ref_buf = np.zeros((1, bucket.spec.padded_len * hop), np.float32)
            n = min(ref_audio.shape[0], ref_frames * hop)
            ref_buf[0, :n] = ref_audio[:n]
            cond = np.asarray(self._mel(ref_buf), np.float32)[:, :ref_frames]
            args = prep_inputs(
                bucket.spec, cond, text_ids, duration_frames,
                sway_sampling_coef=sway_sampling_coef, seed=seed,
            )
            out = bucket.sampler.call(*args)
        if not isinstance(out, (tuple, list)):
            raise ValueError(
                f"{bucket.path} is a mel-only artifact (--mel-only); this "
                "server needs the vocoded wave — re-export without --mel-only"
            )
        wave = np.asarray(out[1], np.float32)[0]
        start = int(args[1][0]) * hop  # lens (>= ref frames after text clamp)
        end = (int(args[3]) - 1) * hop
        return wave[start : min(end, wave.shape[0])]


def make_handler(sampler: ArtifactSampler, default_ref, allow_resample=False):
    from f5_tts_tpu.generate import split_sentences
    from f5_tts_tpu.serve import (
        BadRequest,
        JsonHTTPHandler,
        _pcm16,
        _wav_bytes,
        _wav_stream_header,
        resolve_ref_payload,
    )

    acfg = sampler.audio_cfg
    # the largest reference any bucket can condition on: lens must stay below
    # the bucket's padded window (prep_inputs clamps duration to lens+1)
    max_ref_samples = (
        (sampler.buckets[-1].spec.padded_len - 1) * acfg.hop_length
    )

    def parse_params(payload):
        """Validate the sampler knobs shared by both endpoints. Raises
        BadRequest (-> 400) so a malformed value (e.g. speed: "fast") gets a
        proper error response — on the stream endpoint an uncaught parse
        error would reset the connection with no HTTP status at all."""
        try:
            speed = float(payload.get("speed", 1.0))
            sway = payload.get("sway_sampling_coef", -1.0)
            sway = None if sway is None else float(sway)
            seed = int(payload.get("seed", 0))
            duration = payload.get("duration")
            duration = None if duration is None else float(duration)
        except (TypeError, ValueError) as e:
            raise BadRequest(f"bad parameter: {e}") from None
        if not speed > 0:
            raise BadRequest("speed must be > 0")
        return speed, sway, seed, duration

    class Handler(JsonHTTPHandler):
        def do_GET(self):
            if self.path == "/healthz":
                self._json_response(200, {
                    "buckets": [
                        {"padded_len": b.spec.padded_len,
                         "steps": b.spec.steps,
                         "method": b.spec.method,
                         "cfg_strength": b.spec.cfg_strength}
                        for b in sampler.buckets
                    ],
                    "sample_rate": acfg.sample_rate,
                    "duration_predictor": (
                        None if sampler.duration is None
                        else {"padded_len": sampler.duration.spec.padded_len}
                    ),
                })
            else:
                self._json_error(404, "unknown path")

        def do_POST(self):
            if self.path == "/synthesize_stream":
                return self._synthesize_stream()
            if self.path != "/synthesize":
                return self._json_error(404, "unknown path")
            payload = self._read_payload()
            if payload is None:
                return

            text = payload.get("text")
            if not text:
                return self._json_error(400, "missing 'text'")
            try:
                ref_audio, ref_text = resolve_ref_payload(
                    payload, default_ref, acfg.sample_rate,
                    max_ref_samples=max_ref_samples,
                    allow_resample=allow_resample,
                )
                speed, sway, seed, duration = parse_params(payload)
            except BadRequest as e:
                return self._json_error(400, str(e))

            frames = (
                None
                if duration is None or payload.get("estimate_duration")
                else int(duration * acfg.frames_per_second)
            )
            try:
                wave = sampler.synthesize(
                    text, ref_audio, ref_text, frames,
                    speed=speed,
                    sway_sampling_coef=sway,
                    seed=seed,
                    estimate=bool(payload.get("estimate_duration")),
                )
            except ValueError as e:
                return self._json_error(400, str(e))
            except Exception as e:
                return self._json_error(500, f"synthesis failed: {e}")
            body = _wav_bytes(wave, acfg.sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _write_chunk(self, data: bytes) -> None:
            self.wfile.write(f"{len(data):X}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")

        def _synthesize_stream(self):
            """Sentence-streamed synthesis (serve.py's /synthesize_stream for
            artifact deployments): split the text, pre-plan EVERY sentence
            (duration resolution + bucket fit — anything unservable 400s
            before the stream commits), then synthesize sequentially,
            streaming each sentence's PCM as chunked WAV the moment it's
            ready. Time-to-first-audio = one sentence's latency instead of
            the whole request's."""
            payload = self._read_payload()
            if payload is None:
                return
            text = payload.get("text")
            if not text or not isinstance(text, str):
                return self._json_error(400, "missing 'text'")
            if payload.get("duration") is not None:
                return self._json_error(
                    400, "duration is per-request; unsupported with streaming "
                    "(durations are resolved per sentence)")
            try:
                ref_audio, ref_text = resolve_ref_payload(
                    payload, default_ref, acfg.sample_rate,
                    max_ref_samples=max_ref_samples,
                    allow_resample=allow_resample,
                )
                speed, sway, seed, _ = parse_params(payload)
            except BadRequest as e:
                return self._json_error(400, str(e))

            estimate = bool(payload.get("estimate_duration"))
            sentences = split_sentences(text) or [text]
            try:
                frames = [
                    sampler.plan(s, ref_audio, ref_text, None,
                                 speed=speed, estimate=estimate)[0]
                    for s in sentences
                ]
            except ValueError as e:
                return self._json_error(400, str(e))
            except Exception as e:
                return self._json_error(500, f"duration resolution failed: {e}")

            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            self._write_chunk(_wav_stream_header(acfg.sample_rate))
            try:
                for s, f in zip(sentences, frames):
                    pcm = _pcm16(sampler.synthesize(
                        s, ref_audio, ref_text, f,
                        speed=speed, sway_sampling_coef=sway, seed=seed,
                    ))
                    # a zero-length chunk IS the chunked-encoding terminator —
                    # never emit one mid-stream (possible when a sentence's
                    # clamped duration leaves no generated frames)
                    if pcm:
                        self._write_chunk(pcm)
            except Exception:
                # status line is already out — truncate the stream so the
                # client sees a hard error rather than silent-complete audio;
                # log it server-side (the truncation alone is undiagnosable)
                import sys
                import traceback

                print("mid-stream synthesis failed:", file=sys.stderr)
                traceback.print_exc()
                self.close_connection = True
                return
            self.wfile.write(b"0\r\n\r\n")

    return Handler


def serve_artifacts(
    artifact_paths: list[str],
    *,
    vocab_path: str | None = None,
    default_ref=None,
    default_ref_sr: int | None = None,
    host: str = "0.0.0.0",
    port: int = 8931,
    allow_resample: bool = False,
    duration_artifact: str | None = None,
) -> ThreadingHTTPServer:
    sampler = ArtifactSampler(artifact_paths, vocab_path,
                              duration_artifact=duration_artifact)
    if default_ref is not None and default_ref_sr is not None:
        # the artifact header records the model's true sample rate; a default
        # reference at another rate would silently condition on wrong-speed
        # mel frames (the exact bug class the header's audio constants exist
        # to prevent)
        model_sr = sampler.audio_cfg.sample_rate
        if default_ref_sr != model_sr:
            if not allow_resample:
                raise ValueError(
                    f"default reference is {default_ref_sr} Hz but the "
                    f"artifact's model expects {model_sr} Hz; resample it or "
                    "pass --resample-ref"
                )
            from f5_tts_tpu.audio.resample import resample

            audio, text = default_ref
            default_ref = (resample(audio, default_ref_sr, model_sr), text)
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(sampler, default_ref, allow_resample)
    )
    httpd.sampler = sampler
    print(
        f"artifact server on {host}:{port} — buckets "
        f"{[b.spec.padded_len for b in sampler.buckets]}"
    )
    return httpd


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifact", action="append", required=True,
                    help="sampler artifact (repeat for several duration buckets)")
    ap.add_argument("--vocab", default=None,
                    help="vocab.txt for the pinyin/vocab tokenizer; omit for the "
                         "byte tokenizer (must match the exported model's training)")
    ap.add_argument("--duration-artifact", default=None,
                    help="exported duration predictor (f5-tts-tpu-export "
                         "--duration); resolves requests that omit 'duration' "
                         "with the trained model instead of the byte-length "
                         "heuristic")
    ap.add_argument("--ref", default=None, help="default reference WAV")
    ap.add_argument("--ref-text", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8931)
    ap.add_argument("--warmup", action="store_true",
                    help="compile every bucket's program before accepting traffic")
    ap.add_argument("--resample-ref", action="store_true", default=False,
                    help="resample off-rate reference audio (the default --ref and per-request ref_audio_b64) to the model's rate instead of rejecting it")
    args = ap.parse_args(argv)

    default_ref = None
    default_ref_sr = None
    if args.ref:
        from f5_tts_tpu.audio.io import read_wav

        audio, default_ref_sr = read_wav(args.ref)
        if args.ref_text is None:
            ap.error("--ref needs --ref-text")
        audio = (audio if audio.ndim == 1 else audio.mean(axis=-1)).astype("float32")
        default_ref = (audio, args.ref_text)

    httpd = serve_artifacts(
        args.artifact, vocab_path=args.vocab, default_ref=default_ref,
        default_ref_sr=default_ref_sr,
        host=args.host, port=args.port, allow_resample=args.resample_ref,
        duration_artifact=args.duration_artifact,
    )
    if args.warmup:
        httpd.sampler.warmup()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
