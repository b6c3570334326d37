"""Duration trainer at CFM-trainer parity: exact resume (full train state),
"latest" crash resume, EMA, and mesh sharding
(reference: duration_trainer.py:36-171, whose resume is typo-broken and
weights-only)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import DurationConfig
from f5_tts_tpu.models.duration import DurationPredictor
from f5_tts_tpu.training.duration_trainer import DurationTrainer, make_duration_train_step
from f5_tts_tpu.training.trainer import init_train_state, make_optimizer

TINY = DurationConfig(
    dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
    text_dim=16, conv_layers=1, use_flash_attention=False,
)


def _dataset(n=8, b=2, frames=40):
    for i in range(n):
        ks = jax.random.split(jax.random.key(i), 2)
        yield {
            "mel_spec": np.asarray(jax.random.normal(ks[0], (b, frames, 100))),
            "mel_len": np.full((b,), frames, np.int32),
            "transcript": np.asarray(jax.random.randint(ks[1], (b, 8), 0, 200)),
        }


def test_duration_trainer_exact_resume(tmp_path):
    model = DurationPredictor.init(jax.random.key(0), TINY)
    trainer = DurationTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer.train(_dataset(), learning_rate=1e-4, total_steps=6, save_every=3, log_every=2)
    files = sorted(os.listdir(tmp_path))
    assert "duration_6.safetensors" in files
    assert "duration_6.trainstate.safetensors" in files

    # the trainstate file restores optimizer moments + step EXACTLY (not the
    # reference's weights-only resume)
    from f5_tts_tpu.training.checkpoints import load_tree_safetensors

    opt = make_optimizer(1e-4, 1e-2, 2, 6, 1.0)
    template = init_train_state(DurationPredictor.init(jax.random.key(9), TINY).params, opt)
    restored = load_tree_safetensors(
        tmp_path / "duration_6.trainstate.safetensors",
        {"opt_state": template["opt_state"], "step": template["step"]},
    )
    assert int(restored["step"]) == 6
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state["opt_state"]),
                    jax.tree_util.tree_leaves(restored["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a fresh trainer resumed from "latest" continues from there
    model2 = DurationPredictor.init(jax.random.key(9), TINY)
    trainer2 = DurationTrainer(model2, num_warmup_steps=2, results_dir=tmp_path)
    trainer2.train(_dataset(), learning_rate=1e-4, total_steps=8, save_every=10**9,
                   checkpoint="latest")
    assert int(trainer2.state["step"]) == 8


def test_duration_trainer_ema_tracked_and_saved(tmp_path):
    model = DurationPredictor.init(jax.random.key(0), TINY)
    trainer = DurationTrainer(model, num_warmup_steps=1, results_dir=tmp_path,
                              ema_decay=0.9)
    trainer.train(_dataset(4), learning_rate=1e-3, total_steps=4, save_every=4, log_every=2)
    assert "ema" in trainer.state
    assert (tmp_path / "duration_4.ema.safetensors").exists()
    # EMA lags the online params after a few steps
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(jax.tree_util.tree_leaves(trainer.state["ema"]),
                        jax.tree_util.tree_leaves(trainer.state["params"]))
    ]
    assert max(diffs) > 0

    # the saved EMA file round-trips exactly
    from safetensors.numpy import load_file

    from f5_tts_tpu.models.convert import convert_duration_state

    back = convert_duration_state(load_file(tmp_path / "duration_4.ema.safetensors"), TINY)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state["ema"]),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_duration_trainer_orbax_latest(tmp_path):
    model = DurationPredictor.init(jax.random.key(0), TINY)
    trainer = DurationTrainer(model, num_warmup_steps=2, results_dir=tmp_path,
                              use_orbax=True)
    trainer.train(_dataset(4), learning_rate=1e-4, total_steps=4, save_every=2)
    trainer.ckpt_mgr.close()

    model2 = DurationPredictor.init(jax.random.key(5), TINY)
    trainer2 = DurationTrainer(model2, num_warmup_steps=2, results_dir=tmp_path,
                               use_orbax=True)
    trainer2.train(_dataset(6), learning_rate=1e-4, total_steps=6, save_every=10**9,
                   checkpoint="latest")
    assert int(trainer2.state["step"]) == 6
    trainer2.ckpt_mgr.close()


def test_duration_mesh_sharded_step_matches_single_device():
    from f5_tts_tpu.parallel.mesh import create_mesh, shard_state, shard_train_step

    model = DurationPredictor.init(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    fps = 93.75
    step_fn = make_duration_train_step(TINY, opt, fps)

    mel = jax.random.normal(jax.random.key(1), (4, 40, 100))
    text = jax.random.randint(jax.random.key(2), (4, 8), 0, 200)
    lens = jnp.full((4,), 40, jnp.int32)
    key = jax.random.key(3)

    state_single = init_train_state(model.params, opt)
    single = jax.jit(step_fn)
    s1, l1 = single(state_single, mel, text, lens, key)

    mesh = create_mesh(data=4, model=2) if len(jax.devices()) >= 8 else create_mesh()
    state = shard_state(init_train_state(model.params, opt), mesh)
    sharded = shard_train_step(step_fn, mesh, state)
    s2, l2 = sharded(state, mel, text, lens, key)

    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5)


def test_trainstate_structural_mismatch_fails_loudly(tmp_path):
    """A changed optimizer config must not silently restore garbage."""
    from f5_tts_tpu.training.checkpoints import load_tree_safetensors, save_tree_safetensors

    save_tree_safetensors(tmp_path / "ts.safetensors", {"a": np.ones(3)})
    with pytest.raises(KeyError, match="optimizer configuration changed"):
        load_tree_safetensors(tmp_path / "ts.safetensors", {"b": np.ones(3)})


def test_weights_only_resume_warns(tmp_path, capsys):
    model = DurationPredictor.init(jax.random.key(0), TINY)
    trainer = DurationTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer.train(_dataset(3), learning_rate=1e-4, total_steps=3, save_every=3)
    os.remove(tmp_path / "duration_3.trainstate.safetensors")

    trainer2 = DurationTrainer(DurationPredictor.init(jax.random.key(1), TINY),
                               num_warmup_steps=2, results_dir=tmp_path)
    trainer2.train(_dataset(5), learning_rate=1e-4, total_steps=5, save_every=10**9,
                   checkpoint="latest")
    assert "WEIGHTS-ONLY" in capsys.readouterr().out


def test_duration_grad_accum_matches_manual_average():
    """make_duration_train_step(grad_accum=k) == per-microbatch grads with the
    same folded keys, f32 mean, one optimizer update (trainer._build_step is
    shared with the CFM trainer; this pins the duration loss_fn wiring)."""
    import optax

    from f5_tts_tpu.models.duration import duration_forward

    k, b, frames = 2, 2, 40
    fps = 24000 / 256
    params = DurationPredictor.init(jax.random.key(0), TINY).params
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=100)
    ks = jax.random.split(jax.random.key(5), 2)
    mel = jax.random.normal(ks[0], (k, b, frames, 100))
    text = jax.random.randint(ks[1], (k, b, 8), 0, 200)
    lens = jnp.full((k, b), frames, jnp.int32)
    key = jax.random.key(11)

    state = init_train_state(params, opt)
    step = jax.jit(make_duration_train_step(TINY, opt, fps, grad_accum=k))
    new_state, loss = step(state, mel, text, lens, key)

    keys = jax.random.split(key, k)
    g_sum = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    l_sum = 0.0
    for i in range(k):
        li, gi = jax.value_and_grad(
            lambda p: duration_forward(
                p, TINY, mel[i], text[i], lens[i], key=keys[i],
                return_loss=True, frames_per_second=fps,
            )
        )(params)
        g_sum = jax.tree.map(lambda a, g: a + g.astype(jnp.float32), g_sum, gi)
        l_sum = l_sum + float(li)
    grads = jax.tree.map(lambda g, p: (g / k).astype(p.dtype), g_sum, params)
    updates, _ = opt.update(grads, state["opt_state"], params)
    want = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss), l_sum / k, rtol=1e-6)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         new_state["params"], want)
    assert max(jax.tree.leaves(diffs)) < 1e-6
    assert int(new_state["step"]) == 1


def test_duration_trainer_grad_accum_loop(tmp_path):
    """DurationTrainer.train(grad_accum=2) reshapes batches and counts
    UPDATES; non-divisible batches fail loudly."""
    model = DurationPredictor.init(jax.random.key(0), TINY)
    trainer = DurationTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    trainer.train(_dataset(n=3, b=4), learning_rate=1e-4, total_steps=3,
                  save_every=10**9, log_every=1, grad_accum=2)
    assert int(trainer.state["step"]) == 3

    trainer2 = DurationTrainer(model, num_warmup_steps=2, results_dir=tmp_path)
    with pytest.raises(ValueError, match="not divisible"):
        trainer2.train(_dataset(n=1, b=3), total_steps=1, save_every=10**9,
                       grad_accum=2)
