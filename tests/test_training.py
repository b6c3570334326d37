"""Trainer, data pipeline, and mesh-parallel tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.data.loader import Stream, collate_audio_batch, make_training_pipeline
from f5_tts_tpu.models.cfm import F5TTS, cfm_loss
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.training.trainer import init_train_state, make_optimizer, make_train_step

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=256, text_dim=32, conv_layers=1, use_flash_attention=False,
)
CFM = CFMConfig()


def _fake_batch(b=2, n=64, key=0):
    ks = jax.random.split(jax.random.key(key), 2)
    mel = jax.random.normal(ks[0], (b, n, 100))
    text = jax.random.randint(ks[1], (b, 16), 0, 255)
    lens = jnp.full((b,), n, jnp.int32)
    return mel, text, lens


def test_train_step_reduces_loss_same_batch():
    """Overfitting a single batch must reduce the loss."""
    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=200)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(TINY, CFM, opt), donate_argnums=(0,))

    mel, text, lens = _fake_batch()
    fixed_key = jax.random.key(7)  # same randomness each step -> pure optimization
    losses = []
    for i in range(30):
        state, loss = step(state, mel, text, lens, fixed_key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"
    assert int(state["step"]) == 30


def test_optimizer_schedule_warmup():
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=10, total_steps=100)
    # warmup: lr at step 0 is ~0
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    g = {"w": jnp.ones(4)}
    updates, state = opt.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) < 1e-6  # lr=1e-8 at step 0


def test_stream_combinators():
    s = Stream.from_list([1, 2, 3])
    assert list(s.repeat(2)) == [1, 2, 3, 1, 2, 3]
    assert sorted(s.shuffle(2, seed=0)) == [1, 2, 3]
    assert list(s.map(lambda x: x * 2)) == [2, 4, 6]
    assert list(s.map(lambda x: None if x == 2 else x)) == [1, 3]
    assert list(s.filter(lambda x: x > 1)) == [2, 3]
    batches = list(s.batch(2, lambda b: b))
    assert batches == [[1, 2], [3]]
    assert list(s.batch(2, lambda b: b, drop_remainder=True)) == [[1, 2]]
    assert list(s.prefetch(2)) == [1, 2, 3]
    # streams restart cleanly
    assert list(s) == [1, 2, 3]


def test_stream_prefetch_propagates_errors():
    def boom():
        yield 1
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(Stream(boom).prefetch(2))


def test_collate_audio_batch():
    samples = [
        {"audio": np.ones(256 * 10, np.float32), "transcript": np.array([1, 2], np.int32)},
        {"audio": np.ones(256 * 7, np.float32), "transcript": np.array([3], np.int32)},
    ]
    batch = collate_audio_batch(samples, pad_frame_multiple=8)
    assert batch["mel_spec"].shape == (2, 16, 100)  # 10 frames -> pad to 16
    np.testing.assert_array_equal(batch["mel_len"], [10, 7])
    np.testing.assert_array_equal(batch["transcript"], [[1, 2], [3, -1]])
    # padded region zeroed (reference pads mel with 0.0)
    assert np.all(batch["mel_spec"][1, 7:] == 0.0)
    assert np.any(batch["mel_spec"][1, :7] != 0.0)


def test_trainer_end_to_end(tmp_path):
    from f5_tts_tpu.training import F5TTSTrainer

    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFM)

    def dataset():
        for i in range(8):
            mel, text, lens = _fake_batch(key=i)
            yield {"mel_spec": np.asarray(mel), "mel_len": np.asarray(lens),
                   "transcript": np.asarray(text)}

    trainer = F5TTSTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer.train(dataset(), learning_rate=1e-4, total_steps=6, save_every=3,
                  sample_every=10**9, log_every=2)
    files = sorted(os.listdir(tmp_path))
    assert "f5tts_3.safetensors" in files and "f5tts_6.safetensors" in files

    # checkpoint weights round-trip bit-exactly through safetensors (guards
    # against the non-contiguous-array serialization pitfall)
    from f5_tts_tpu.models.convert import convert_dit_state
    from safetensors.numpy import load_file

    back = convert_dit_state(load_file(tmp_path / "f5tts_6.safetensors"), TINY)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state["params"]),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume restores optimizer state and step counter
    trainer2 = F5TTSTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer2.train(dataset(), learning_rate=1e-4, total_steps=8, checkpoint=6,
                   save_every=10**9, sample_every=10**9)
    assert int(trainer2.state["step"]) == 8


def test_mesh_sharded_step_matches_single_device():
    """DP+TP sharded training step must produce the same loss as unsharded."""
    from f5_tts_tpu.parallel.mesh import batch_sharding, create_mesh, shard_state, shard_train_step

    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    step_fn = make_train_step(TINY, CFM, opt)

    mel, text, lens = _fake_batch(b=4, n=64)
    key = jax.random.key(3)

    state1 = init_train_state(params, opt)
    state1, loss1 = jax.jit(step_fn)(state1, mel, text, lens, key)

    mesh = create_mesh(data=4, model=2)
    state2 = shard_state(init_train_state(params, opt), mesh)
    sharded = shard_train_step(step_fn, mesh, state2)
    dsh = batch_sharding(mesh)
    state2, loss2 = sharded(
        state2, jax.device_put(mel, dsh), jax.device_put(text, dsh),
        jax.device_put(lens, dsh), key,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    # params after one step also agree
    k1 = np.asarray(state1["params"]["proj_out"]["kernel"])
    k2 = np.asarray(state2["params"]["proj_out"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=2e-5)


def test_seq_sharded_step_matches_single_device():
    """DPxSPxTP (2x2x2): sequence-parallel activations via GSPMD input
    shardings must not change the numbers — the frame axis of mel/text is
    sharded over "seq", params replicated over it, and XLA inserts the conv
    halo exchanges / attention gathers."""
    from f5_tts_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        sequence_sharding,
        shard_state,
        shard_train_step,
    )

    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    step_fn = make_train_step(TINY, CFM, opt)

    mel, text, lens = _fake_batch(b=4, n=64)
    key = jax.random.key(3)

    state1 = init_train_state(params, opt)
    state1, loss1 = jax.jit(step_fn)(state1, mel, text, lens, key)

    mesh = create_mesh(data=2, model=2, seq=2)
    assert mesh.axis_names == ("data", "seq", "model")
    state2 = shard_state(init_train_state(params, opt), mesh)
    sharded = shard_train_step(step_fn, mesh, state2)
    ssh, dsh = sequence_sharding(mesh), batch_sharding(mesh)
    state2, loss2 = sharded(
        state2, jax.device_put(mel, ssh), jax.device_put(text, ssh),
        jax.device_put(lens, dsh), key,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    k1 = np.asarray(state1["params"]["proj_out"]["kernel"])
    k2 = np.asarray(state2["params"]["proj_out"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=2e-5)


def test_param_specs_shard_the_right_leaves():
    from jax.sharding import PartitionSpec as P

    from f5_tts_tpu.parallel.mesh import param_specs

    params = init_dit(jax.random.key(0), TINY)
    specs = param_specs(params)
    assert specs["blocks"]["attn"]["to_q"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["attn"]["to_out"]["kernel"] == P(None, "model", None)
    assert specs["blocks"]["ff"]["w1"]["kernel"] == P(None, None, "model")
    assert specs["blocks"]["ff"]["w2"]["kernel"] == P(None, "model", None)
    assert specs["blocks"]["ff"]["w2"]["bias"] == P()
    assert specs["text_embed"]["embed"]["embedding"] == P()
    assert specs["proj_out"]["kernel"] == P()


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(1)


def test_on_device_mel_step_matches_host_mel_step():
    """make_train_step_from_audio (mel inside the jitted step) must produce
    the same loss and updated params as the host-mel step fed
    collate_audio_batch's output for the same raw audio."""
    from f5_tts_tpu.data.loader import collate_raw_audio_batch
    from f5_tts_tpu.training.trainer import make_train_step_from_audio

    rng = np.random.default_rng(3)
    samples = [
        {"audio": (0.1 * rng.standard_normal(24_000 * s)).astype(np.float32),
         "transcript": rng.integers(0, 255, (12,)).astype(np.int32)}
        for s in (1, 2)
    ]
    host = collate_audio_batch(samples, pad_frame_multiple=64)
    raw = collate_raw_audio_batch(samples, pad_frame_multiple=64)
    assert raw["audio"].shape[1] // 256 == host["mel_spec"].shape[1]
    np.testing.assert_array_equal(host["mel_len"], raw["mel_len"])

    opt = make_optimizer()
    params = init_dit(jax.random.key(0), TINY)
    key = jax.random.key(5)
    n = host["mel_spec"].shape[1]
    text = np.pad(host["transcript"], ((0, 0), (0, n - host["transcript"].shape[1])),
                  constant_values=-1)

    s1 = init_train_state(params, opt)
    s1, loss_host = jax.jit(make_train_step(TINY, CFM, opt))(
        s1, jnp.asarray(host["mel_spec"]), jnp.asarray(text),
        jnp.asarray(host["mel_len"]), key)

    s2 = init_train_state(params, opt)
    s2, loss_raw = jax.jit(make_train_step_from_audio(TINY, CFM, opt))(
        s2, jnp.asarray(raw["audio"]), jnp.asarray(text),
        jnp.asarray(raw["mel_len"]), key)

    assert abs(float(loss_host) - float(loss_raw)) < 1e-5
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1["params"], s2["params"])
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_training_pipeline_on_device_mel(tmp_path):
    """make_training_pipeline(on_device_mel=True) yields raw-audio batches."""
    from f5_tts_tpu.audio.io import write_wav
    from f5_tts_tpu.data.libritts import load_dir

    rng = np.random.default_rng(0)
    d = tmp_path / "x" / "0"
    d.mkdir(parents=True)
    for i in range(4):
        write_wav(d / f"c{i}.wav", (0.1 * rng.standard_normal(24_000)).astype(np.float32), 24_000)
        (d / f"c{i}.normalized.txt").write_text(f"clip {i}")

    batches = list(make_training_pipeline(load_dir(tmp_path), batch_size=2, epochs=1,
                                          shuffle_buffer=4, num_threads=2,
                                          on_device_mel=True, drop_remainder=False))
    assert batches and all(set(b) == {"audio", "mel_len", "transcript"} for b in batches)
    assert all(b["audio"].ndim == 2 and b["audio"].shape[1] % 256 == 0 for b in batches)


def test_trainer_end_to_end_on_device_mel(tmp_path):
    """trainer.train(on_device_mel=True) consumes raw-audio batches through
    the full loop (step build, batch feed, checkpointing)."""
    from f5_tts_tpu.training import F5TTSTrainer

    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFM)
    rng = np.random.default_rng(0)

    def dataset():
        for i in range(4):
            audio = (0.1 * rng.standard_normal((2, 64 * 256))).astype(np.float32)
            yield {"audio": audio,
                   "mel_len": np.full((2,), 64, np.int32),
                   "transcript": rng.integers(0, 255, (2, 16)).astype(np.int32)}

    trainer = F5TTSTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer.train(dataset(), learning_rate=1e-4, total_steps=4, save_every=4,
                  sample_every=10**9, log_every=2, on_device_mel=True)
    assert "f5tts_4.safetensors" in os.listdir(tmp_path)
    assert int(trainer.state["step"]) == 4


def test_mesh_sharded_from_audio_step_matches_single_device():
    """The raw-audio (on-device mel) step shards over the same DP+TP mesh:
    batch_sharding partitions the leading axis of the 2D audio batch, and the
    in-step mel computes per-shard with no cross-device traffic."""
    from f5_tts_tpu.parallel.mesh import batch_sharding, create_mesh, shard_state, shard_train_step
    from f5_tts_tpu.training.trainer import make_train_step_from_audio

    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    step_fn = make_train_step_from_audio(TINY, CFM, opt)

    rng = np.random.default_rng(1)
    audio = jnp.asarray(0.1 * rng.standard_normal((4, 64 * 256)), jnp.float32)
    text = jnp.asarray(rng.integers(0, 255, (4, 16)), jnp.int32)
    lens = jnp.full((4,), 64, jnp.int32)
    key = jax.random.key(3)

    state1 = init_train_state(params, opt)
    state1, loss1 = jax.jit(step_fn)(state1, audio, text, lens, key)

    mesh = create_mesh(data=4, model=2)
    state2 = shard_state(init_train_state(params, opt), mesh)
    sharded = shard_train_step(step_fn, mesh, state2)
    dsh = batch_sharding(mesh)
    state2, loss2 = sharded(
        state2, jax.device_put(audio, dsh), jax.device_put(text, dsh),
        jax.device_put(lens, dsh), key,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
