"""Generation API, CLI, and live playback.

Behavioral parity with reference: generate.py (flag surface, sentence
splitting, duration heuristic, RMS normalization, ref-audio trimming,
streaming playback). One TPU-idiomatic upgrade: when not streaming to a live
audio device, multi-sentence requests are BATCHED through a single pjit-able
forward instead of a Python loop over sentences (reference: generate.py:199-244
loops; see SURVEY.md §5 long-context row).
"""

from __future__ import annotations

import argparse
import copy
import datetime
import re
import sys
from importlib import resources
from threading import Event, Lock
from typing import Literal, Optional

import numpy as np

from f5_tts_tpu.audio.io import read_wav, write_wav
from f5_tts_tpu.utils.tokenizer import convert_char_to_pinyin

# Defaults for MODEL-FREE helpers only (estimated_duration parity with the
# reference's hardcoded constants, generate.py:21-24). Anything with a model
# in hand derives these from model.audio_cfg — a snapshot with a non-default
# AudioConfig must trim/convert correctly (see config.py).
SAMPLE_RATE = 24_000
HOP_LENGTH = 256
FRAMES_PER_SEC = SAMPLE_RATE / HOP_LENGTH
TARGET_RMS = 0.1

DEFAULT_REF_TEXT = "Some call me nature, others call me mother nature."


# ------------------------------------------------------------------ utilities


def split_sentences(text: str) -> list[str]:
    """Split on sentence-final punctuation, keeping the delimiter
    (reference: generate.py:30-36). Divergence: a trailing fragment with no
    final punctuation is kept as its own sentence — the reference's pairwise
    join drops it, which its single-sentence fallback masks, but the
    streaming/batched multi-sentence surfaces here would silently truncate
    the user's last clause from the audio."""
    parts = re.compile(r"([.!?;:])").split(text)
    sentences = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
    if len(parts) % 2 == 1 and parts[-1].strip():
        sentences.append(parts[-1])
    return [s.strip() for s in sentences if s.strip()]


def estimated_duration(
    ref_audio: np.ndarray,
    ref_text: str,
    gen_text: str,
    speed: float = 1.0,
    *,
    hop_length: int = HOP_LENGTH,
    frames_per_second: float = FRAMES_PER_SEC,
) -> float:
    """Byte-length-ratio duration heuristic with ZH pause-punct weighting
    (reference: generate.py:104-111). Returns seconds. The defaults match the
    reference's constants; model-aware callers pass their AudioConfig's
    hop/frame-rate."""
    ref_audio_len = ref_audio.shape[0] // hop_length
    zh_pause_punc = r"。，、；：？！"
    ref_text_len = len(ref_text.encode("utf-8")) + 3 * len(re.findall(zh_pause_punc, ref_text))
    gen_text_len = len(gen_text.encode("utf-8")) + 3 * len(re.findall(zh_pause_punc, gen_text))
    duration_in_frames = ref_audio_len + int(ref_audio_len / ref_text_len * gen_text_len / speed)
    return duration_in_frames / frames_per_second


# ------------------------------------------------------------------ playback


class AudioPlayer:
    """Live playback on a sounddevice OutputStream fed from a single
    growable contiguous ring buffer.

    Covers the reference's playback capability (reference: generate.py:42-99)
    with a different mechanism: samples live in ONE preallocated float32
    array addressed by monotonically increasing absolute read/write cursors
    (ring index = cursor % capacity), so the PortAudio callback is two
    bounded vectorized copies (split at the wrap point) instead of per-chunk
    queue bookkeeping, and arbitrarily sized queue_audio() calls cost one
    copy each. "Drained" is a pure cursor equality (read == write) checked
    after every callback. Host-side; requires the optional `sounddevice`
    dependency."""

    def __init__(self, sample_rate: int = 24_000, buffer_size: int = 2048):
        import sounddevice as sd  # gated optional dependency

        self._sd = sd
        self.sample_rate = sample_rate
        self.buffer_size = buffer_size
        # ~1 s of headroom to start; _reserve regrows geometrically under load
        self._ring = np.zeros(max(8 * buffer_size, sample_rate), np.float32)
        self._rd = 0  # absolute cursors: total samples consumed / produced
        self._wr = 0
        self._cursor_lock = Lock()
        self.playing = False
        self.drain_event = Event()
        self.drain_event.set()  # nothing pending yet
        self._stream = None

    # -- producer side ------------------------------------------------------

    def _reserve(self, extra: int) -> None:
        """Grow the ring (holding _cursor_lock) so `extra` more samples fit;
        pending samples are linearized to the front of the new buffer."""
        pending = self._wr - self._rd
        if pending + extra <= self._ring.size:
            return
        cap = self._ring.size
        while pending + extra > cap:
            cap *= 2
        fresh = np.zeros(cap, np.float32)
        if pending:
            idx = (self._rd + np.arange(pending)) % self._ring.size
            fresh[:pending] = self._ring[idx]
        self._ring = fresh
        self._rd, self._wr = 0, pending

    def queue_audio(self, samples) -> None:
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            with self._cursor_lock:
                # clear INSIDE the lock: cleared outside, the callback could
                # observe rd == wr and set the event between our clear and our
                # write, leaving it set with pending audio — wait_for_drain
                # would then return early and stop() truncate the tail
                self.drain_event.clear()
                self._reserve(samples.size)
                cap = self._ring.size
                at = self._wr % cap
                head = min(samples.size, cap - at)
                self._ring[at : at + head] = samples[:head]
                if samples.size > head:
                    self._ring[: samples.size - head] = samples[head:]
                self._wr += samples.size
        if not self.playing:
            self.play()

    # -- consumer side (PortAudio thread) ------------------------------------

    def _callback(self, outdata, frames, time, status):
        outdata[:, 0] = 0.0  # underruns play silence
        with self._cursor_lock:
            take = min(frames, self._wr - self._rd)
            if take:
                cap = self._ring.size
                at = self._rd % cap
                head = min(take, cap - at)
                outdata[:head, 0] = self._ring[at : at + head]
                if take > head:
                    outdata[head:take, 0] = self._ring[: take - head]
                self._rd += take
            if self._rd == self._wr:
                self.drain_event.set()

    # -- lifecycle ------------------------------------------------------------

    def play(self) -> None:
        if self.playing:
            return
        self._stream = self._sd.OutputStream(
            samplerate=self.sample_rate,
            channels=1,
            callback=self._callback,
            blocksize=self.buffer_size,
        )
        self._stream.start()
        self.playing = True

    def wait_for_drain(self):
        return self.drain_event.wait()

    def stop(self) -> None:
        if not self.playing:
            return
        self.wait_for_drain()
        # PortAudio's StopStream blocks until buffers already handed to the
        # device finish playing, so no flush sleep is needed here.
        self._stream.stop()
        self._stream.close()
        self._stream = None
        self.playing = False


# ------------------------------------------------------------------ generation


def _load_ref_audio(
    ref_audio_path: Optional[str],
    ref_audio_text: Optional[str],
    sample_rate: int = SAMPLE_RATE,
    resample_ref: bool = False,
):
    if ref_audio_path is None:
        wav_path = resources.files("f5_tts_tpu").joinpath("assets/test_en_1_ref_short.wav")
        with resources.as_file(wav_path) as p:
            audio, sr = read_wav(p)
        ref_audio_text = ref_audio_text or DEFAULT_REF_TEXT
    else:
        audio, sr = read_wav(ref_audio_path)
    if audio.ndim > 1:
        audio = audio.mean(axis=-1)
    if sr != sample_rate:
        # parity default: the reference refuses non-matching prompts outright
        # (reference: generate.py:147-148); --resample-ref opts into a host
        # resample instead (audio/resample.py)
        if not resample_ref:
            which = (
                f"the bundled reference clip is {sr} Hz but the model expects "
                f"{sample_rate} Hz; pass --ref-audio matching the model's "
                "sample rate or use --resample-ref"
                if ref_audio_path is None
                else f"Reference audio must have a sample rate of {sample_rate} Hz "
                "(or pass --resample-ref)"
            )
            raise ValueError(which)
        from f5_tts_tpu.audio.resample import resample

        print(f"Resampling reference audio {sr} Hz -> {sample_rate} Hz")
        audio = resample(audio.astype(np.float32), sr, sample_rate)
    return audio.astype(np.float32), ref_audio_text


def generate(
    generation_text: str,
    duration: Optional[float] = None,
    estimate_duration: bool = False,
    model_name: str = "lucasnewman/f5-tts-mlx",
    ref_audio_path: Optional[str] = None,
    ref_audio_text: Optional[str] = None,
    steps: int = 8,
    method: Literal["euler", "midpoint", "rk4"] = "rk4",
    cfg_strength: float = 2.0,
    sway_sampling_coef: float = -1.0,
    speed: float = 1.0,
    seed: Optional[int] = None,
    quantization_bits: Optional[int] = None,
    output_path: Optional[str] = None,
    int8_compute: bool = False,
    model=None,
    play: Optional[bool] = None,
    cfg_interval: Optional[tuple] = None,
    mesh=None,
    resample_ref: bool = False,
) -> np.ndarray:
    """End-to-end synthesis (reference: generate.py:113-244). Returns the
    generated waveform (reference audio trimmed off). Pass `model` to reuse a
    loaded F5TTS across calls."""
    import jax.numpy as jnp

    from f5_tts_tpu.models.cfm import F5TTS

    if int8_compute and quantization_bits:
        raise ValueError(
            "--q (weight-only group-64 snapshots) and --w8a8 (int8 compute "
            "from float kernels) are separate paths and cannot be combined"
        )
    if model is None:
        model = F5TTS.from_pretrained(model_name, quantization_bits=quantization_bits)
    elif int8_compute or mesh is not None:
        # never mutate a caller-supplied model: a later model.sample() must
        # not silently run int8/sharded because of one generate() call.
        # Attribute rebinds below (dit_cfg, params via use_mesh) leave the
        # caller's object untouched through a shallow copy.
        model = copy.copy(model)
    if int8_compute:
        model.dit_cfg = model.dit_cfg.replace(int8_compute=True)
    if mesh is not None:
        model.use_mesh(mesh)  # multi-chip sampling (parallel/mesh.py)
    # all sample-rate/hop arithmetic follows the loaded model's AudioConfig
    # (a non-default snapshot must trim and convert correctly)
    sr = model.audio_cfg.sample_rate
    hop = model.audio_cfg.hop_length
    fps = model.audio_cfg.frames_per_second

    if play is None:
        play = output_path is None
    player = None
    if play:
        try:
            player = AudioPlayer(sample_rate=sr)
        except (ImportError, OSError) as e:
            print(f"live playback unavailable ({e}); synthesizing without it")

    audio, ref_audio_text = _load_ref_audio(
        ref_audio_path, ref_audio_text, sample_rate=sr, resample_ref=resample_ref
    )
    ref_audio_duration = audio.shape[0] / sr
    print(f"Got reference audio with duration: {ref_audio_duration:.2f} seconds")

    rms = float(np.sqrt(np.mean(np.square(audio))))
    if 0 < rms < TARGET_RMS:  # 0: an all-silent ref must not divide to NaN
        audio = audio * TARGET_RMS / rms

    sentences = split_sentences(generation_text)
    is_single = len(sentences) <= 1 or duration is not None
    start_date = datetime.datetime.now()

    def synth_one(text_piece: str, dur_frames):
        text = convert_char_to_pinyin([ref_audio_text + " " + text_piece])
        wave, _ = model.sample(
            jnp.asarray(audio)[None, :],
            text=text,
            duration=dur_frames,
            steps=steps,
            method=method,
            speed=speed,
            cfg_strength=cfg_strength,
            sway_sampling_coef=sway_sampling_coef,
            seed=seed,
            return_trajectory=False,
            cfg_interval=cfg_interval,
        )
        return np.asarray(wave)[audio.shape[0] :]

    if is_single:
        dur_frames = None
        if duration is not None:
            dur_frames = int(duration * fps)
        elif estimate_duration:
            dur_frames = int(
                estimated_duration(audio, ref_audio_text, generation_text, speed,
                                   hop_length=hop, frames_per_second=fps) * fps
            )
        wave = synth_one(generation_text, dur_frames)
        if player is not None:
            player.queue_audio(wave)
    elif player is not None:
        # streaming path: sequential per-sentence synthesis, queued live
        out = []
        for sentence in sentences:
            dur_frames = None
            if estimate_duration:
                dur_frames = int(
                    estimated_duration(audio, ref_audio_text, sentence, speed,
                                       hop_length=hop, frames_per_second=fps) * fps
                )
            piece = synth_one(sentence, dur_frames)
            out.append(piece)
            player.queue_audio(piece)
        wave = np.concatenate(out, axis=0)
    else:
        # batched path: all sentences in one forward (one jit, batch=B)
        texts = convert_char_to_pinyin([ref_audio_text + " " + s for s in sentences])
        cond = jnp.broadcast_to(jnp.asarray(audio)[None, :], (len(sentences), audio.shape[0]))
        cond_mel = model._mel_spec(cond)
        ref_frames = cond_mel.shape[1]

        text_ids = model._tokenize(texts)
        if estimate_duration or model._duration_predictor is None:
            durations = np.array(
                [
                    int(estimated_duration(audio, ref_audio_text, s, speed,
                                           hop_length=hop, frames_per_second=fps) * fps)
                    for s in sentences
                ],
                dtype=np.int32,
            )
        else:
            durations = np.asarray(model.predict_duration(cond_mel, jnp.asarray(text_ids), speed))
        # the same clamp sample() applies, so each piece trims correctly
        from f5_tts_tpu.models.cfm import clamp_duration

        text_lens = (text_ids != -1).sum(axis=-1)
        durations = clamp_duration(
            durations, np.full_like(text_lens, ref_frames), text_lens,
            model.cfm_cfg.max_duration,
        )

        # length-grouped sub-batching: sentences padded only to their own
        # duration bucket, not the longest sentence's — a mixed-length request
        # no longer pays max-bucket compute per sentence (same grouping logic
        # as the serving micro-batcher)
        bucket = model.cfm_cfg.duration_bucket
        groups: dict[int, list[int]] = {}
        for i, d in enumerate(durations):
            groups.setdefault(-(-max(int(d), 1) // bucket), []).append(i)

        pieces: list = [None] * len(sentences)
        for _, idxs in sorted(groups.items()):
            waves, _ = model.sample(
                cond_mel[jnp.asarray(idxs)],
                text=jnp.asarray(text_ids[idxs]),
                duration=durations[idxs],
                steps=steps,
                method=method,
                speed=speed,
                cfg_strength=cfg_strength,
                sway_sampling_coef=sway_sampling_coef,
                seed=seed,
                return_trajectory=False,
                cfg_interval=cfg_interval,
            )
            waves = np.asarray(waves)
            if waves.ndim == 1:
                waves = waves[None, :]
            for j, i in enumerate(idxs):
                end = min((int(durations[i]) - 1) * hop, waves.shape[1])
                pieces[i] = waves[j, ref_frames * hop : end]
        wave = np.concatenate(pieces, axis=0)

    generated_duration = wave.shape[0] / sr
    print(f"Generated {generated_duration:.2f}s of audio in {datetime.datetime.now() - start_date}.")

    if output_path is not None:
        write_wav(output_path, wave, sr)
    if player is not None:
        player.stop()
    return wave


# ------------------------------------------------------------------ CLI


def build_parser() -> argparse.ArgumentParser:
    """Flag surface kept identical to the reference CLI
    (reference: generate.py:248-338)."""
    parser = argparse.ArgumentParser(description="Generate audio from text using f5-tts-tpu")
    parser.add_argument("--model", type=str, default="lucasnewman/f5-tts-mlx",
                        help="Name of the model to use")
    parser.add_argument("--text", type=str, default=None,
                        help="Text to generate speech from (leave blank to input via stdin)")
    parser.add_argument("--duration", type=float, default=None,
                        help="Duration of the generated audio in seconds")
    # deliberate divergence from the reference (generate.py:271-274), which
    # uses type=bool and so treats "--estimate-duration False" as truthy
    parser.add_argument("--estimate-duration", action="store_true", default=False,
                        help="Estimate duration with a text-length heuristic instead of the duration predictor model")
    parser.add_argument("--ref-audio", type=str, default=None,
                        help="Path to the reference audio file")
    parser.add_argument("--ref-text", type=str, default=None,
                        help="Text spoken in the reference audio")
    parser.add_argument("--output", type=str, default=None,
                        help="Path to save the generated audio output")
    parser.add_argument("--steps", type=int, default=8,
                        help="Number of steps to take when sampling the neural ODE")
    parser.add_argument("--method", type=str, default="rk4", choices=["euler", "midpoint", "rk4"],
                        help="Method to use for sampling the neural ODE")
    parser.add_argument("--cfg", type=float, default=2.0,
                        help="Strength of classifier free guidance")
    parser.add_argument("--sway-coef", type=float, default=-1.0,
                        help="Coefficient for sway sampling")
    parser.add_argument("--speed", type=float, default=1.0,
                        help="Speed factor for the duration heuristic")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed for noise generation")
    parser.add_argument("--q", type=int, default=None,
                        help="Number of bits to use for quantization. 4 and 8 are supported.")
    parser.add_argument("--cfg-interval", type=str, default=None,
                        help="Optional accelerator: apply CFG only for flow times in LO,HI (e.g. '0,0.7')")
    parser.add_argument("--w8a8", action="store_true", default=False,
                        help="int8-COMPUTE inference: attention/FF matmuls on the MXU int8 pipe (~8%% faster end-to-end, small quantization distortion)")
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="Shard batched sampling over N chips (data parallel)")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="Tensor-parallel ways over attention heads / FF hidden")
    parser.add_argument("--resample-ref", action="store_true", default=False,
                        help="Resample reference audio to the model's rate instead of rejecting it (the reference implementation requires 24 kHz input)")
    return parser


def main(argv: list[str] | None = None):
    from f5_tts_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    if args.text is None:
        if not sys.stdin.isatty():
            args.text = sys.stdin.read().strip()
        else:
            print("Please enter the text to generate:")
            args.text = input("> ").strip()

    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        from f5_tts_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=args.mesh_data, model=args.mesh_model)

    generate(
        generation_text=args.text,
        duration=args.duration,
        estimate_duration=args.estimate_duration,
        model_name=args.model,
        ref_audio_path=args.ref_audio,
        ref_audio_text=args.ref_text,
        steps=args.steps,
        method=args.method,
        cfg_strength=args.cfg,
        sway_sampling_coef=args.sway_coef,
        speed=args.speed,
        seed=args.seed,
        quantization_bits=args.q,
        output_path=args.output,
        int8_compute=args.w8a8,
        cfg_interval=tuple(float(x) for x in args.cfg_interval.split(",")) if args.cfg_interval else None,
        mesh=mesh,
        resample_ref=args.resample_ref,
    )


if __name__ == "__main__":
    main()
