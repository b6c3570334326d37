"""Host-side streaming data pipeline.

Replaces the reference's `mlx.data` C++ stream pipeline (reference:
data.py:197-213, train_libritts_small.py:44-52) with a composable Python
stream: threaded decode, shuffle buffer, prefetch queue, padded batching, and
pad-to-multiple — yielding the same batch schema the trainers consume
({"mel_spec", "mel_len", "transcript"}).

The mel transform runs as one vmapped device call per batch (XLA FFT) instead
of per-sample host work, which keeps the host threads doing only file I/O.
A native C++ WAV decoder (ops/native) is used when built, with a pure-Python
fallback.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

SAMPLE_RATE = 24_000
HOP_LENGTH = 256

# byte-level vocab used by the LibriTTS example driver
# (reference: data.py:52, train_libritts_small.py:14)
BYTE_VOCAB = {chr(i): i for i in range(256)}


class Stream:
    """A restartable, composable sample stream."""

    def __init__(self, factory: Callable[[], Iterable]):
        self._factory = factory

    def __iter__(self) -> Iterator:
        return iter(self._factory())

    @classmethod
    def from_list(cls, items: list) -> "Stream":
        return cls(lambda: iter(items))

    def repeat(self, n: int) -> "Stream":
        def gen():
            for _ in range(n):
                yield from self._factory()

        return Stream(gen)

    def shuffle(self, buffer_size: int, seed: int | None = None) -> "Stream":
        """Reservoir-style shuffle buffer (reference pipeline's .shuffle(500))."""

        def gen():
            rng = random.Random(seed)
            buf: list = []
            for item in self._factory():
                buf.append(item)
                if len(buf) >= buffer_size:
                    idx = rng.randrange(len(buf))
                    buf[idx], buf[-1] = buf[-1], buf[idx]
                    yield buf.pop()
            rng.shuffle(buf)
            yield from buf

        return Stream(gen)

    def filter(self, pred: Callable) -> "Stream":
        return Stream(lambda: (x for x in self._factory() if pred(x)))

    def map(self, fn: Callable, num_threads: int = 1) -> "Stream":
        """Apply fn to each sample; with num_threads > 1, an ordered
        thread-pool map (the decode stage). fn returning None drops a sample."""
        if num_threads <= 1:
            def gen():
                for x in self._factory():
                    y = fn(x)
                    if y is not None:
                        yield y

            return Stream(gen)

        def gen():
            # bounded in-flight window: ThreadPoolExecutor.map submits the
            # ENTIRE upstream iterable eagerly, which for a multi-epoch
            # dataset queues every decode at once and accumulates decoded
            # audio unboundedly ahead of the consumer
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            window = num_threads * 2
            pool = ThreadPoolExecutor(num_threads)
            pending: deque = deque()
            try:
                for item in self._factory():
                    pending.append(pool.submit(fn, item))
                    if len(pending) >= window:
                        y = pending.popleft().result()
                        if y is not None:
                            yield y
                # drain on normal exhaustion (NOT in finally: yielding there
                # raises "generator ignored GeneratorExit" when the consumer
                # closes the stream early, e.g. trainer break at total_steps)
                while pending:
                    y = pending.popleft().result()
                    if y is not None:
                        yield y
            finally:
                pool.shutdown(wait=False, cancel_futures=True)

        return Stream(gen)

    def batch(
        self, batch_size: int, collate: Callable[[list], dict], drop_remainder: bool = False
    ) -> "Stream":
        """drop_remainder=True keeps every batch exactly batch_size — required
        when batches are sharded over a data-parallel mesh axis."""

        def gen():
            buf: list = []
            for item in self._factory():
                buf.append(item)
                if len(buf) == batch_size:
                    yield collate(buf)
                    buf = []
            if buf and not drop_remainder:
                yield collate(buf)

        return Stream(gen)

    def dynamic_batch(
        self,
        buffer_size: int,
        max_frames: int,
        collate: Callable[[list], dict],
        length_fn: Callable = None,
        seed: int | None = None,
    ) -> "Stream":
        """Duration-aware batching: fill a buffer, sort by length, and cut
        batches so that padded cost (max_len * batch_size) stays under
        `max_frames`. The mlx.data `.dynamic_batch` equivalent the reference
        driver has commented out (train_libritts_small.py:50) — sorting
        adjacent-length clips together minimizes padding waste on the MXU."""
        if length_fn is None:
            length_fn = lambda s: s["audio"].shape[0] // HOP_LENGTH

        def gen():
            rng = random.Random(seed)

            def emit(buf):
                buf.sort(key=length_fn)
                batches = []
                cur: list = []
                for item in buf:
                    cost = (len(cur) + 1) * length_fn(item)  # items sorted: last is max
                    if cur and cost > max_frames:
                        batches.append(cur)
                        cur = []
                    cur.append(item)
                if cur:
                    batches.append(cur)
                rng.shuffle(batches)
                for b in batches:
                    yield collate(b)

            buf: list = []
            for item in self._factory():
                buf.append(item)
                if len(buf) >= buffer_size:
                    yield from emit(buf)
                    buf = []
            if buf:
                yield from emit(buf)

        return Stream(gen)

    def shard(self, global_batch: int, sl: slice) -> "Stream":
        """Keep only the items landing in `sl` of every COMPLETE
        `global_batch`-item window — the per-process slice of each global
        batch for multi-host training
        (parallel/distributed.process_local_batch_slice). Applied BEFORE
        decode, so each host decodes only its own items; requires the
        upstream stream to be deterministic across processes (seeded
        shuffle + identical file listing). A partial final window is dropped
        on EVERY process — emitting it would hand processes unequal step
        counts and deadlock the training collectives."""

        def gen():
            win: list = []
            for item in self._factory():
                win.append(item)
                if len(win) == global_batch:
                    yield from win[sl]
                    win = []

        return Stream(gen)

    def prefetch(self, prefetch_size: int = 2) -> "Stream":
        """Background-thread prefetch queue decoupling host I/O from the
        device step (the role of mlx.data's internal worker threads)."""

        def gen():
            q: queue.Queue = queue.Queue(maxsize=prefetch_size)
            sentinel = object()
            error: list[BaseException] = []

            def worker():
                try:
                    for item in self._factory():
                        q.put(item)
                except BaseException as e:  # propagate into the consumer
                    error.append(e)
                finally:
                    q.put(sentinel)

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item

        return Stream(gen)


# -------------------------------------------------------------- collation


def pad_to_multiple(x: np.ndarray, axis: int, multiple: int, value=0.0) -> np.ndarray:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return np.pad(x, pad, constant_values=value)


def collate_audio_batch(
    samples: list[dict],
    pad_frame_multiple: int = 256,
) -> dict:
    """samples: [{"audio": float32 [nw], "transcript": int32 [nt]}] ->
    {"mel_spec" [b, n, d], "mel_len" [b], "transcript" [b, nt]}.

    Mirrors the reference pipeline's pad/pad_to_multiple batching
    (train_libritts_small.py:49-51): mel padded with 0.0 past each item's
    length, frames padded to a multiple of 256 so jit sees few shapes.
    """
    audio, mel_lens = _bucket_audio(samples, pad_frame_multiple)

    import jax

    from f5_tts_tpu.audio.mel import log_mel_spectrogram

    # the mel is a HOST data stage (the reference computes it inside the
    # loader's C++ stream, data.py:81-86): pin it to the CPU backend so it
    # never contends with the accelerator for the training step — and never
    # violates the one-in-flight-computation rule on tunneled backends
    try:
        host = jax.devices("cpu")[0]
    except RuntimeError:  # pragma: no cover - cpu platform always registers
        host = None
    with jax.default_device(host):
        mel = np.asarray(log_mel_spectrogram(audio))

    # zero past each item's true length (the reference's batch pad value is
    # 0.0 mel, not the log floor); the bucketed audio guarantees the frame
    # count is already a pad_frame_multiple multiple
    n = mel.shape[1]
    assert n % pad_frame_multiple == 0, (n, pad_frame_multiple)
    frame_idx = np.arange(n)[None, :]
    mel = np.where((frame_idx < mel_lens[:, None])[..., None], mel, 0.0)

    return {"mel_spec": mel, "mel_len": mel_lens,
            "transcript": _collate_transcripts(samples)}


def _bucket_audio(samples: list[dict], pad_frame_multiple: int) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad a batch's raw audio to the frame-bucket boundary BEFORE any
    mel, so the mel jit compiles once per bucket instead of once per batch
    (a fresh max-length every batch was a compile per step:
    tools/loader_bench.py measured the host-mel pipeline at 12 s-audio/s
    before bucketing, ~520 after)."""
    mel_lens = np.array([s["audio"].shape[0] // HOP_LENGTH for s in samples], dtype=np.int32)
    max_frames = -(-int(mel_lens.max()) // pad_frame_multiple) * pad_frame_multiple
    max_samples = max_frames * HOP_LENGTH

    audio = np.zeros((len(samples), max_samples), dtype=np.float32)
    for i, s in enumerate(samples):
        n = min(s["audio"].shape[0], max_samples)
        audio[i, :n] = s["audio"][:n]
    return audio, mel_lens


def _collate_transcripts(samples: list[dict]) -> np.ndarray:
    nt = max(s["transcript"].shape[0] for s in samples)
    transcript = np.full((len(samples), nt), -1, dtype=np.int32)
    for i, s in enumerate(samples):
        transcript[i, : s["transcript"].shape[0]] = s["transcript"]
    return transcript


def collate_raw_audio_batch(
    samples: list[dict],
    pad_frame_multiple: int = 256,
) -> dict:
    """Raw-audio batch for the on-device mel front-end
    (training.trainer.make_train_step_from_audio): audio zero-padded to the
    frame-bucket boundary, NO host mel — the accelerator computes it inside
    the jitted train step. Keeps the host pipeline pure IO (decode at
    ~1400 clips/s threaded) instead of mel-bound (~120 s-audio/s)."""
    audio, mel_lens = _bucket_audio(samples, pad_frame_multiple)
    return {"audio": audio, "mel_len": mel_lens,
            "transcript": _collate_transcripts(samples)}


def make_training_pipeline(
    samples: Stream,
    batch_size: int,
    epochs: int = 1,
    shuffle_buffer: int = 500,
    num_threads: int = 6,
    prefetch_size: int | None = None,
    pad_frame_multiple: int = 256,
    seed: int | None = None,
    drop_remainder: bool = True,
    on_device_mel: bool = False,
    shard_by_process: bool = False,
) -> Stream:
    """The full driver pipeline (reference: train_libritts_small.py:44-52):
    repeat -> shuffle -> [process shard] -> threaded decode -> batch(pad) ->
    pad_to_multiple -> prefetch. drop_remainder defaults True so batches stay
    shardable over a data-parallel mesh axis. on_device_mel=True yields
    raw-audio batches for trainers running the mel front-end inside the
    jitted step (pass on_device_mel=True to F5TTSTrainer.train as well).

    shard_by_process=True is the multi-host data contract: `batch_size` is
    the GLOBAL batch, and each process yields only its
    `process_local_batch_slice` of every global batch (decoding only its own
    items). Requires a seed — the pre-shard stream must be identical on every
    process — and a global batch divisible by the process count; feed the
    local batches to `jax.make_array_from_process_local_data` (or a
    process-spanning mesh's batch sharding) on the training side."""
    from f5_tts_tpu.data.libritts import decode_sample

    stream = samples.repeat(epochs).shuffle(shuffle_buffer, seed=seed)
    local_batch = batch_size
    if shard_by_process:
        import jax

        from f5_tts_tpu.parallel.distributed import process_local_batch_slice

        if seed is None:
            raise ValueError(
                "shard_by_process requires a seed: every process must see the "
                "same shuffled order for the batch slices to partition it"
            )
        if batch_size % jax.process_count():
            raise ValueError(
                f"global batch {batch_size} is not divisible by "
                f"process_count={jax.process_count()}"
            )
        sl = process_local_batch_slice(batch_size)
        stream = stream.shard(batch_size, sl)
        local_batch = sl.stop - sl.start

    decode = decode_sample
    if shard_by_process:
        # sharding happens BEFORE decode (each host decodes only its own
        # items), so a silently dropped undecodable sample would desync one
        # process's batch stream from its peers — unequal step counts
        # deadlock the training collectives. Fail loudly instead.
        def decode(item, _decode=decode_sample):
            y = _decode(item)
            if y is None:
                raise RuntimeError(
                    f"decode failed for {item!r} under shard_by_process: a "
                    "silently skipped sample would desynchronize per-process "
                    "batch streams (peers would run unequal step counts and "
                    "deadlock); fix or exclude the file on every host"
                )
            return y

    collate = collate_raw_audio_batch if on_device_mel else collate_audio_batch
    return (
        stream.map(decode, num_threads=num_threads)
        .batch(
            local_batch,
            lambda b: collate(b, pad_frame_multiple),
            drop_remainder=drop_remainder,
        )
        .prefetch(prefetch_size or 2)
    )
