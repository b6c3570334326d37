"""Deployment server backed by AOT sampler artifacts, with micro-batching.

This is the CONSUMER side of `f5_tts_tpu/export.py`'s deployment story: a
serving host that carries jax, this package's host-side utilities (the mel
front-end, the tokenizer, WAV plumbing) and artifact files — **no model
weights/checkpoints are loaded, no model code is traced, and nothing
recompiles per shape at request time**: each artifact is a fixed StableHLO
program whose compilation environment was pinned at export time (`serve.py`,
by contrast, is the full product server around the LIVE model). Concurrent
requests are grouped by the same micro-batch scheduler the live server uses
(`serve.MicroBatcher`): compatible requests (same artifact bucket + sampler
scalars) run as ONE device call against a batch-N artifact. Long text
streams sentence-by-sentence via `/synthesize_stream` (chunked WAV, same
endpoint contract as serve.py's).

    f5-tts-tpu-export --model SNAP --out b1_256.bin --batch 1 --padded-len 256 \
        --steps 8 --method rk4 --external-weights
    f5-tts-tpu-export --model SNAP --out b4_256.bin --batch 4 --padded-len 256 \
        --steps 8 --method rk4 --external-weights
    python -m f5_tts_tpu.artifact_serve --artifact b1_256.bin --artifact b4_256.bin \
        --vocab SNAP/vocab.txt --ref ref.wav --ref-text "..."

Requests pick the smallest bucket LENGTH that fits their clamped duration,
exactly like the live jit cache keys shapes; within a length, the scheduler
fills the batch-size variant that best fits the group (padding unused slots
with copies of the last item — per-item masking makes slots independent,
`models/cfm.cfm_sample_e2e` masks cond/attention by each item's lens/
duration). `duration` is client-supplied seconds; requests that omit it
resolve through the trained duration predictor when a `--duration-artifact`
(f5-tts-tpu-export --duration) is loaded, or the byte-length heuristic
otherwise / under `estimate_duration` — the same two-tier behavior as the
live server (serve.py:_predict_durations).

reference: no counterpart — the reference's inference needs the full MLX
Python stack + HF checkpoint downloads at startup (cfm.py:404-520).
"""

from __future__ import annotations

import threading
from concurrent.futures import (
    InvalidStateError,
    TimeoutError as FuturesTimeoutError,
)
from dataclasses import dataclass
from http.server import ThreadingHTTPServer
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.export import (
    load_duration,
    load_sampler,
    prep_duration_inputs,
    prep_inputs,
)
from f5_tts_tpu.generate import estimated_duration
from f5_tts_tpu.serve import (
    MicroBatcher,
    Overloaded,
    _Request,
)
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
    """The device surface: a set of (padded_len, batch) artifact buckets, a
    shared mel front-end, and a lock serializing device work (one in-flight
    computation — the same rule serve.py's batcher thread enforces; here the
    lock also covers duration predictions issued from HTTP handler threads)."""

    def __init__(self, artifact_paths: list[str], vocab_path: str | None = None,
                 duration_artifact: str | None = None):
        from f5_tts_tpu.audio.mel import MelSpec
        from f5_tts_tpu.config import AudioConfig

        if not artifact_paths:
            raise ValueError("need at least one --artifact")
        self.buckets: list[Bucket] = []
        for p in artifact_paths:
            sampler, spec = load_sampler(p)
            self.buckets.append(Bucket(sampler, spec, p))
        self.buckets.sort(key=lambda b: (b.spec.padded_len, b.spec.batch))
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
        self.lengths = sorted({b.spec.padded_len for b in self.buckets})
        self.max_batch = max(b.spec.batch for b in self.buckets)
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

    def pick_length(self, needed_frames: int) -> int:
        """Smallest exported bucket length whose padded window holds
        `needed_frames` — which must be the CLAMPED requirement
        max(duration, ref_frames+1, text_len+1), not the raw requested
        duration: prep_inputs raises the duration to at least lens+1
        (models/cfm.clamp_duration), so a length picked from the raw duration
        would spuriously reject requests whose reference or text pushes the
        clamp past it while a larger bucket fits (plan() computes this)."""
        for length in self.lengths:
            if needed_frames <= length:
                return length
        raise ValueError(
            f"duration {needed_frames} frames exceeds the largest artifact "
            f"bucket ({self.lengths[-1]}); export a bigger one"
        )

    def pick_artifact(self, length: int, k: int) -> Bucket:
        """The batch-size variant of bucket `length` that best serves k
        requests: the smallest exported batch >= k (padding slots are cheap
        but not free to fill host-side), else the largest available (the
        caller chunks the rest)."""
        variants = [b for b in self.buckets if b.spec.padded_len == length]
        if not variants:
            raise ValueError(f"no artifact with padded_len={length}")
        for b in variants:  # sorted by batch ascending
            if b.spec.batch >= k:
                return b
        return variants[-1]

    def warmup(self) -> None:
        """Run every artifact once on silence so the first real request never
        pays the artifact's (fast, but not free) AOT program compile — the
        same role serve.py's --warmup plays for jit shapes. Warming goes
        through synthesize_chunk / _predict_duration_frames themselves, so it
        compiles EVERY eager device op on the request path (the mel jit at
        each (batch, window) shape, the fixed-window slice, prep's device-side
        astype/pad, the predictor's runtime-valued ref mask) — an unwarmed
        batch-N mel was measured costing the FIRST concurrent group a
        multi-second mid-request compile (2026-08-19, the artifact-bench
        0.5x regression), and a host-array warmup missed the device-side ops."""
        import time

        hop = self.audio_cfg.hop_length
        silence = np.zeros(4 * hop, np.float32)
        pad_ids = np.full((4,), -1, np.int32)
        for b in self.buckets:
            t0 = time.time()
            bb = b.spec.batch
            self.synthesize_chunk(
                b, [pad_ids] * bb, [silence] * bb, [8] * bb,
                sway_sampling_coef=-1.0, seed=0,
            )
            print(f"warmed {b.path} (bucket {b.spec.padded_len} x{bb}): "
                  f"{time.time() - t0:.1f}s")
        if self.duration is not None:
            t0 = time.time()
            self._predict_duration_frames(silence, "", "warm up", 1.0)
            print(f"warmed {self.duration.path} (duration predictor): "
                  f"{time.time() - t0:.1f}s")

    def _ref_frames(self, ref_audio: np.ndarray) -> int:
        """Frames of reference an artifact can condition on: lens must stay
        below the largest bucket window (prep_inputs clamps duration to
        lens+1) and below max_duration."""
        hop = self.audio_cfg.hop_length
        return min(ref_audio.shape[0] // hop, self.lengths[-1] - 1,
                   self.spec.max_duration - 1)

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
            # mel over the predictor's FIXED window, then zero frames past the
            # reference with a RUNTIME-valued comparison (the bound rides in as
            # a device scalar, not a Python int baked into the program): every
            # reference length reuses ONE executable — a per-length device
            # slice here compiled a fresh program per novel ref length at
            # request time, each staying ORC-JIT-mapped for the process's life
            mel = self._mel(buf)[:, : d.padded_len]  # stays on device
            idx = jnp.arange(mel.shape[1], dtype=jnp.int32)[None, :, None]
            cond = jnp.where(
                idx < jnp.asarray(ref_frames, jnp.int32), mel, 0.0
            )
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
    ) -> tuple[int, np.ndarray, int]:
        """Everything a request needs resolved BEFORE committing to a
        response: total frames (trained predictor when a duration artifact is
        loaded and `estimate` doesn't force the byte-length heuristic — the
        live server's two-tier behavior, serve.py:_predict_durations),
        tokenized ids, and the serving bucket length. Raises ValueError for
        anything no bucket can hold — the streaming endpoint pre-plans every
        sentence so it never truncates a stream it already committed to."""
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
        ref_frames = self._ref_frames(ref_audio)
        length = self.pick_length(
            max(duration_frames, ref_frames + 1, text_len + 1)
        )
        return duration_frames, text_ids, length

    def synthesize_chunk(
        self,
        art: Bucket,
        text_ids_list: list[np.ndarray],  # per item, 1D ids padded with -1
        ref_audios: list[np.ndarray],
        durations: list[int],
        *,
        sway_sampling_coef: float | None = -1.0,
        seed: int = 0,
    ) -> list[np.ndarray]:
        """Up to art.spec.batch requests -> one device call -> per-item
        generated-region waves (ref region trimmed, serve.py's frame-quantized
        trimming). Unused batch slots are filled with copies of the LAST item: the
        program masks conditioning and attention per item by lens/duration
        (models/cfm.cfm_sample_e2e:220-252), so slots are independent and the
        padding only burns the fixed FLOPs the artifact's shape costs anyway."""
        hop = self.audio_cfg.hop_length
        L = art.spec.padded_len
        b = art.spec.batch
        k = len(text_ids_list)
        if k > b or k == 0:
            raise ValueError(f"chunk of {k} items for a batch-{b} artifact")

        def fill(i_src, i_dst, ref_buf, text_mat, lens, durs):
            r = ref_audios[i_src]
            rf = max(self._ref_frames(r), 0)
            rf = min(rf, L - 1)
            n = min(r.shape[0], rf * hop)
            ref_buf[i_dst, :n] = r[:n]
            ids = text_ids_list[i_src]
            text_mat[i_dst, : ids.shape[0]] = ids
            lens[i_dst] = max(rf, 1)
            durs[i_dst] = durations[i_src]

        nt = max(ids.shape[0] for ids in text_ids_list)
        ref_buf = np.zeros((b, L * hop), np.float32)
        text_mat = np.full((b, max(nt, 1)), -1, np.int32)
        lens = np.ones((b,), np.int32)
        durs = np.ones((b,), np.int32)
        for i in range(b):
            fill(min(i, k - 1), i, ref_buf, text_mat, lens, durs)

        with self._device_lock:
            # mel over the bucket's FIXED window (zero-padded), so the mel
            # jit compiles once per (batch, bucket) instead of once per
            # distinct reference length; frames past each item's lens are
            # masked inside the program (same pattern as serve._padded_refs).
            # The mel STAYS a device array: prep_inputs pads it in place on
            # the accelerator instead of a host readback + re-upload
            cond = self._mel(ref_buf)[:, :L]
            args = prep_inputs(
                art.spec, cond, text_mat, durs, lens=lens,
                sway_sampling_coef=sway_sampling_coef, seed=seed,
            )
            out = art.sampler.call(*args)
            if not isinstance(out, (tuple, list)):
                raise ValueError(
                    f"{art.path} is a mel-only artifact (--mel-only); this "
                    "server needs the vocoded wave — re-export without "
                    "--mel-only"
                )
            waves = np.asarray(out[1], np.float32)
        lens_used, durs_used = args[1], args[2]
        results = []
        for i in range(k):
            start = int(lens_used[i]) * hop
            end = (int(durs_used[i]) - 1) * hop
            results.append(waves[i, start: min(end, waves.shape[1])])
        return results

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
        """One request -> generated-region float wave: the direct (non-HTTP)
        API, same code path as a batch of one. A None duration resolves
        through `plan` (predictor / heuristic)."""
        duration_frames, text_ids, length = self.plan(
            text, ref_audio, ref_text, duration_frames,
            speed=speed, estimate=estimate,
        )
        art = self.pick_artifact(length, 1)
        return self.synthesize_chunk(
            art, [np.asarray(text_ids[0])], [ref_audio], [duration_frames],
            sway_sampling_coef=sway_sampling_coef, seed=seed,
        )[0]


class ArtifactBatcher(MicroBatcher):
    """serve.MicroBatcher over AOT artifacts: the same scheduler (rank, then
    shortest-job-first, bounded backlog, deadlines), with groups keyed on the
    planned artifact bucket and executed through batch-N artifacts. Requests
    arrive with durations already resolved (the HTTP layer pre-plans to
    validate bucket fit before committing), so the base class's deferred
    duration prediction never triggers."""

    def __init__(self, sampler: ArtifactSampler, **kw):
        # the base scheduler reads nothing from `model` after construction
        # (grouping goes through _group_key; device work through _run_group);
        # a shim satisfies warmup()/repr paths that peek at configs
        shim = SimpleNamespace(
            cfm_cfg=SimpleNamespace(
                duration_bucket=sampler.lengths[0],
                max_duration=sampler.spec.max_duration,
            ),
            audio_cfg=sampler.audio_cfg,
        )
        super().__init__(model=shim, **kw)
        self.sampler = sampler

    def _predict_durations(self, reqs: list[_Request]) -> None:
        """Resolve deferred durations for directly-submitted requests (the
        HTTP layer pre-plans, so this only runs for library callers): plan()
        fills frames, token ids, and the bucket; per-request failures fail
        only the offending request (base-class contract)."""
        for r in reqs:
            try:
                frames, ids, length = self.sampler.plan(
                    r.text, r.ref_audio, r.ref_text, None, speed=r.speed
                )
                r.duration_frames = frames
                r.text_ids = np.asarray(ids[0])
                r.bucket_len = length
            except Exception as e:
                if not r.future.done():
                    r.future.set_exception(e)

    def _group_key(self, r: _Request) -> tuple:
        # steps/method/cfg_strength are baked per artifact, not per request;
        # sway/seed are single scalars per device call so they partition.
        # Tuple layout matches the base scheduler's expectations ([0] scales
        # job cost, [5] bucket, [6] stream rank).
        if r.bucket_len is None and r.duration_frames is not None:
            # directly-submitted request with an explicit duration: plan the
            # bucket here (never raise out of the scheduler — an unservable
            # request fails its own future and keys into the dead-request
            # group below, which _run_group drains as a no-op)
            try:
                if r.text_ids is None:
                    r.text_ids = np.asarray(
                        self.sampler.tokenize([r.ref_text + " " + r.text])[0]
                    )
                text_len = int((r.text_ids != -1).sum())
                ref_frames = self.sampler._ref_frames(r.ref_audio)
                r.bucket_len = self.sampler.pick_length(
                    max(r.duration_frames, ref_frames + 1, text_len + 1)
                )
            except Exception as e:
                if not r.future.done():
                    r.future.set_exception(e)
        if r.bucket_len is None:
            # planning failed (future already carries the exception): bucket 0
            # keeps the scheduler's key[5]*key[0] cost arithmetic numeric and
            # partitions dead requests away from live groups
            return (1, "", 0.0, r.sway, r.seed, 0, r.stream_rank)
        return (1, "", 0.0, r.sway, r.seed, r.bucket_len, r.stream_rank)

    def _run_group(self, group: list[_Request]) -> None:
        try:
            # drop requests whose future already settled (failed during
            # planning in _group_key, cancelled, expired): a dead-request
            # group (bucket 0) must drain as a no-op, never reach the device
            live = [r for r in group if not r.future.done()]
            if not live:
                return
            s = self.sampler
            length = live[0].bucket_len
            remaining = list(live)
            while remaining:
                art = s.pick_artifact(length, len(remaining))
                chunk = remaining[: art.spec.batch]
                remaining = remaining[art.spec.batch:]
                waves = s.synthesize_chunk(
                    art,
                    [np.asarray(r.text_ids) for r in chunk],
                    [r.ref_audio for r in chunk],
                    [r.duration_frames for r in chunk],
                    sway_sampling_coef=group[0].sway,
                    seed=group[0].seed if group[0].seed is not None else 0,
                )
                for r, w in zip(chunk, waves):
                    try:
                        r.future.set_result(w)
                    except InvalidStateError:
                        pass  # cancelled mid-synthesis; group-mates unaffected
        except Exception as e:  # pragma: no cover - error propagation
            for r in group:
                if not r.future.done():
                    try:
                        r.future.set_exception(e)
                    except InvalidStateError:
                        pass
        finally:
            self._release(group)


def make_handler(batcher: ArtifactBatcher, default_ref, allow_resample=False):
    from f5_tts_tpu.generate import split_sentences
    from f5_tts_tpu.serve import (
        BadRequest,
        JsonHTTPHandler,
        _pcm16,
        _wav_bytes,
        _wav_stream_header,
        resolve_ref_payload,
    )

    sampler = batcher.sampler
    acfg = sampler.audio_cfg
    # the largest reference any bucket can condition on: lens must stay below
    # the bucket's padded window (prep_inputs clamps duration to lens+1)
    max_ref_samples = (sampler.lengths[-1] - 1) * acfg.hop_length

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

    def build_request(text, ref_audio, ref_text, *, speed, sway, seed,
                      duration_frames, estimate, stream_rank=0) -> _Request:
        """Pre-plan (duration resolution + bucket fit + tokenization — raises
        ValueError for anything no bucket holds) and wrap as a batcher
        request. Plan results ride the request so the batcher never re-does
        host prep."""
        frames, text_ids, length = sampler.plan(
            text, ref_audio, ref_text, duration_frames,
            speed=speed, estimate=estimate,
        )
        return _Request(
            text=text, ref_audio=ref_audio, ref_text=ref_text,
            duration_frames=frames, steps=0, method="", cfg_strength=0.0,
            sway=sway if sway is None else float(sway),
            seed=seed, speed=speed, stream_rank=stream_rank,
            text_ids=np.asarray(text_ids[0]), bucket_len=length,
        )

    class Handler(JsonHTTPHandler):
        def do_GET(self):
            if self.path == "/healthz":
                self._json_response(200, {
                    "buckets": [
                        {"padded_len": b.spec.padded_len,
                         "batch": b.spec.batch,
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

        def _overloaded(self):
            self._json_response(503, {"error": "server overloaded; retry later"},
                                extra_headers=(("Retry-After", "1"),))
            self.close_connection = True

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
                req = build_request(
                    text, ref_audio, ref_text, speed=speed, sway=sway,
                    seed=seed, duration_frames=frames,
                    estimate=bool(payload.get("estimate_duration")),
                )
                wave = batcher.submit(req).result(
                    timeout=(batcher.request_timeout_s + 30)
                    if batcher.request_timeout_s else None
                )
            except Overloaded:
                return self._overloaded()
            except (TimeoutError, FuturesTimeoutError):
                return self._json_error(
                    504, "request expired before synthesis finished")
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
            before the stream commits), submit them all to the micro-batcher
            (compatible sentences share one device call; the first sentence
            is rank 0 so it dispatches alone, ahead of backfill), then stream
            each sentence's PCM as chunked WAV the moment it's ready.
            Time-to-first-audio = one sentence's latency instead of the whole
            request's."""
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
                reqs = [
                    build_request(
                        s, ref_audio, ref_text, speed=speed, sway=sway,
                        seed=seed, duration_frames=None, estimate=estimate,
                        stream_rank=0 if i == 0 else 1,
                    )
                    for i, s in enumerate(sentences)
                ]
            except ValueError as e:
                return self._json_error(400, str(e))
            except Exception as e:
                return self._json_error(500, f"duration resolution failed: {e}")

            futures = []
            try:
                for r in reqs:
                    futures.append(batcher.submit(r))
            except Overloaded:
                # all-or-nothing: cancel already-queued sentences rather than
                # stream a request the queue can't hold in full
                for f in futures:
                    f.cancel()
                return self._overloaded()

            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            self._write_chunk(_wav_stream_header(acfg.sample_rate))
            try:
                for fut in futures:
                    pcm = _pcm16(fut.result(
                        timeout=(batcher.request_timeout_s + 30)
                        if batcher.request_timeout_s else None))
                    # a zero-length chunk IS the chunked-encoding terminator —
                    # never emit one mid-stream (possible when a sentence's
                    # clamped duration leaves no generated frames)
                    if pcm:
                        self._write_chunk(pcm)
            except Exception:
                # status line is already out — truncate the stream so the
                # client sees a hard error rather than silent-complete audio;
                # log it server-side (the truncation alone is undiagnosable)
                # and cancel the sentences still queued so the batcher stops
                # synthesizing for a dead connection
                import sys
                import traceback

                print("mid-stream synthesis failed:", file=sys.stderr)
                traceback.print_exc()
                for f in futures:
                    f.cancel()
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
    max_wait_ms: float = 50.0,
    max_queue: int = 64,
    request_timeout_s: float = 300.0,
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
    batcher = ArtifactBatcher(
        sampler, max_batch=sampler.max_batch, max_wait_ms=max_wait_ms,
        max_queue=max_queue, request_timeout_s=request_timeout_s,
    )
    batcher.start()
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(batcher, default_ref, allow_resample)
    )
    httpd.sampler = sampler
    httpd.batcher = batcher  # keep a handle for shutdown/tests
    print(
        f"artifact server on {host}:{port} — buckets "
        f"{[(b.spec.padded_len, b.spec.batch) for b in sampler.buckets]}"
    )
    return httpd


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifact", action="append", required=True,
                    help="sampler artifact (repeat for several duration "
                         "buckets and/or batch-size variants)")
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
    ap.add_argument("--max-wait-ms", type=float, default=50.0,
                    help="micro-batch gather window")
    ap.add_argument("--max-queue", type=int, default=64,
                    help="pending-request bound; beyond it requests get 503")
    ap.add_argument("--request-timeout", type=float, default=300.0,
                    help="seconds before a queued request expires (504)")
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
        max_wait_ms=args.max_wait_ms, max_queue=args.max_queue,
        request_timeout_s=args.request_timeout,
    )
    if args.warmup:
        httpd.sampler.warmup()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
