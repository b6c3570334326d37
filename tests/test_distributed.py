"""Multi-host surface (parallel/distributed.py + the loader's per-process
sharding): the env/no-op logic of initialize(), the data contract of
process_local_batch_slice / Stream.shard / make_training_pipeline
(shard_by_process=True), and a real 2-process jax.distributed smoke test
driving one DP-sharded train step over the loopback coordinator.

reference: none — the reference is strictly single-device (SURVEY.md §2c);
this is the repo's own DCN extension point (round-3 task #2)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from f5_tts_tpu.data.loader import Stream, make_training_pipeline
from f5_tts_tpu.parallel import distributed as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------- initialize()


def test_initialize_single_host_is_noop(monkeypatch):
    calls = []
    monkeypatch.setattr(D.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    D.initialize()  # no coordinator, no env -> nothing to do
    assert calls == []
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    D.initialize()
    assert calls == []


def test_initialize_passes_explicit_cluster(monkeypatch):
    calls = []
    monkeypatch.setattr(D.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    D.initialize(coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2)
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 4, "process_id": 2}]


def test_initialize_env_process_count(monkeypatch):
    """JAX_NUM_PROCESSES > 1 triggers initialization even without an explicit
    coordinator (jax.distributed auto-detects cloud topology)."""
    calls = []
    monkeypatch.setattr(D.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    D.initialize()
    assert calls == [{"coordinator_address": None,
                      "num_processes": 8, "process_id": None}]


# ------------------------------------------------- per-process data contract


def test_process_local_batch_slice(monkeypatch):
    monkeypatch.setattr(D.jax, "process_count", lambda: 4)
    slices = []
    for i in range(4):
        monkeypatch.setattr(D.jax, "process_index", lambda i=i: i)
        slices.append(D.process_local_batch_slice(16))
    assert slices == [slice(0, 4), slice(4, 8), slice(8, 12), slice(12, 16)]
    # the slices partition the global batch exactly
    covered = sorted(i for s in slices for i in range(s.start, s.stop))
    assert covered == list(range(16))


def test_stream_shard_partitions_windows():
    """Per-process shards of every complete window partition the stream, and
    the partial final window is dropped on every shard (unequal step counts
    across processes would deadlock training collectives)."""
    items = list(range(10))  # global_batch=4 -> 2 full windows, 2 dropped
    shards = [list(Stream.from_list(items).shard(4, slice(2 * p, 2 * p + 2)))
              for p in range(2)]
    assert shards[0] == [0, 1, 4, 5]
    assert shards[1] == [2, 3, 6, 7]
    assert 8 not in shards[0] + shards[1] and 9 not in shards[0] + shards[1]


def _write_clips(tmp_path, n):
    from f5_tts_tpu.audio.io import write_wav

    rng = np.random.default_rng(0)
    d = tmp_path / "clips" / "0"
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        write_wav(d / f"c{i}.wav",
                  (0.1 * rng.standard_normal(24_000)).astype(np.float32), 24_000)
        (d / f"c{i}.normalized.txt").write_text(f"clip number {i}")
    return tmp_path / "clips"


def test_pipeline_shard_by_process_partitions_global_batch(tmp_path, monkeypatch):
    """Across mocked process ids, the per-process pipelines' batches stack
    back into exactly the unsharded pipeline's global batches."""
    from f5_tts_tpu.data.libritts import load_dir

    root = _write_clips(tmp_path, 8)

    def pipeline(**kw):
        return make_training_pipeline(
            load_dir(root), batch_size=4, epochs=1, shuffle_buffer=8,
            num_threads=1, seed=11, on_device_mel=True,
            pad_frame_multiple=64, **kw)

    global_batches = list(pipeline())

    monkeypatch.setattr(D.jax, "process_count", lambda: 2)
    local = []
    for p in range(2):
        monkeypatch.setattr(D.jax, "process_index", lambda p=p: p)
        local.append(list(pipeline(shard_by_process=True)))

    assert len(local[0]) == len(local[1]) == len(global_batches)
    for g, l0, l1 in zip(global_batches, local[0], local[1]):
        assert l0["audio"].shape[0] == l1["audio"].shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([l0["audio"], l1["audio"]]), g["audio"])
        np.testing.assert_array_equal(
            np.concatenate([l0["mel_len"], l1["mel_len"]]), g["mel_len"])


def test_pipeline_shard_requires_seed_and_divisibility(tmp_path, monkeypatch):
    from f5_tts_tpu.data.libritts import load_dir

    root = _write_clips(tmp_path, 2)
    monkeypatch.setattr(D.jax, "process_count", lambda: 2)
    monkeypatch.setattr(D.jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="requires a seed"):
        make_training_pipeline(load_dir(root), batch_size=4,
                               shard_by_process=True)
    with pytest.raises(ValueError, match="not divisible"):
        make_training_pipeline(load_dir(root), batch_size=5, seed=1,
                               shard_by_process=True)


# --------------------------------------------------- 2-process smoke (DCN)


_WORKER = textwrap.dedent(
    """
    import sys
    proc_id, nprocs, coord, data_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from f5_tts_tpu.parallel.distributed import initialize
    initialize(coordinator_address=coord, num_processes=nprocs, process_id=proc_id)
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from f5_tts_tpu.config import CFMConfig, DiTConfig
    from f5_tts_tpu.data.libritts import load_dir
    from f5_tts_tpu.data.loader import make_training_pipeline
    from f5_tts_tpu.models.dit import init_dit
    from f5_tts_tpu.training.trainer import init_train_state, make_train_step_from_audio

    pipe = make_training_pipeline(
        load_dir(data_dir), batch_size=4, epochs=1, shuffle_buffer=8,
        num_threads=1, seed=7, on_device_mel=True, shard_by_process=True,
        pad_frame_multiple=64)
    batch = next(iter(pipe))
    assert batch["audio"].shape[0] == 4 // nprocs, batch["audio"].shape

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def replicated(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    cfg = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                    mel_dim=100, text_num_embeds=256, text_dim=16,
                    conv_layers=1, use_flash_attention=False)
    cfm = CFMConfig(duration_bucket=64)
    params = jax.tree.map(replicated, init_dit(jax.random.key(0), cfg))
    opt = optax.adamw(1e-4)
    state = jax.jit(lambda p: init_train_state(p, opt))(params)
    step = jax.jit(make_train_step_from_audio(cfg, cfm, opt))

    n_frames = batch["audio"].shape[1] // 256
    text = np.pad(
        batch["transcript"],
        ((0, 0), (0, n_frames - batch["transcript"].shape[1])),
        constant_values=-1).astype(np.int32)
    audio_g = jax.make_array_from_process_local_data(data_sh, batch["audio"])
    text_g = jax.make_array_from_process_local_data(data_sh, text)
    lens_g = jax.make_array_from_process_local_data(data_sh, batch["mel_len"])

    state, loss = step(state, audio_g, text_g, lens_g, jax.random.key(1))
    loss_val = float(loss)
    assert np.isfinite(loss_val), loss_val
    print(f"OK {proc_id} loss={loss_val:.6f}", flush=True)
    """
)


def test_two_process_dp_train_step(tmp_path):
    """Real jax.distributed over loopback: 2 CPU processes, a global 2-device
    data mesh, per-process pipeline shards assembled with
    make_array_from_process_local_data, ONE sharded train step. Verifies the
    initialize() wrapper, the loader contract, and that SPMD collectives
    cross the process boundary; both processes must report the SAME loss."""
    root = _write_clips(tmp_path, 8)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", coord, str(root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    losses = {line.split("loss=")[1] for out in outs
              for line in out.splitlines() if line.startswith("OK ")}
    assert len(losses) == 1, f"processes disagree on the loss: {outs}"


def test_shard_mode_decode_failure_raises(tmp_path, monkeypatch):
    """Under shard_by_process an undecodable clip fails LOUDLY: decode runs
    AFTER the per-process shard, so a silently dropped sample would shift one
    process's batch boundaries and deadlock the training collectives with
    unequal step counts. Without sharding the same clip is silently skipped
    (single-host semantics, reference: data.py decode drop)."""
    from f5_tts_tpu.data.libritts import load_dir

    root = _write_clips(tmp_path, 4)
    (root / "0" / "c1.wav").write_bytes(b"not a wav file")
    monkeypatch.setattr(D.jax, "process_count", lambda: 1)
    monkeypatch.setattr(D.jax, "process_index", lambda: 0)

    def pipeline(**kw):
        return make_training_pipeline(
            load_dir(root), batch_size=2, epochs=1, shuffle_buffer=8,
            num_threads=1, seed=11, on_device_mel=True,
            pad_frame_multiple=64, **kw)

    with pytest.raises(RuntimeError, match="desynchronize"):
        list(pipeline(shard_by_process=True))
    assert len(list(pipeline())) >= 1  # unsharded: silent skip, no error
