"""Orbax full-state checkpointing: async save, exact resume, latest-step."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import F5TTS
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.training import F5TTSTrainer
from f5_tts_tpu.training.checkpoints import TrainCheckpointManager
from f5_tts_tpu.training.trainer import init_train_state, make_optimizer

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=64, text_dim=32, conv_layers=1, use_flash_attention=False,
)


def test_manager_roundtrip(tmp_path):
    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=10)
    state = init_train_state(params, opt)

    mgr = TrainCheckpointManager(tmp_path / "ckpt", async_save=False)
    mgr.save(3, state)
    mgr.wait()
    assert mgr.latest_step() == 3

    fresh = init_train_state(init_dit(jax.random.key(9), TINY), opt)
    restored = mgr.restore(3, fresh)
    for a, b in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def _dataset(n=6):
    for i in range(n):
        yield {
            "mel_spec": np.random.default_rng(i).standard_normal((2, 32, 100)).astype(np.float32),
            "mel_len": np.full((2,), 32, np.int32),
            "transcript": np.zeros((2, 8), np.int32),
        }


def test_trainer_orbax_latest_resume(tmp_path):
    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig())
    trainer = F5TTSTrainer(model, num_warmup_steps=1, results_dir=tmp_path, use_orbax=True)
    trainer.train(_dataset(), total_steps=4, save_every=2, sample_every=10**9)
    assert sorted(trainer.ckpt_mgr.all_steps()) == [2, 4]

    # crash-resume: "latest" resolves to 4 and restores the FULL state
    model2 = F5TTS.init(jax.random.key(1), TINY, cfm_cfg=CFMConfig())
    trainer2 = F5TTSTrainer(model2, num_warmup_steps=1, results_dir=tmp_path, use_orbax=True)
    trainer2.train(_dataset(), total_steps=6, checkpoint="latest",
                   save_every=10**9, sample_every=10**9)
    assert int(trainer2.state["step"]) == 6
    # resumed params came from the checkpoint, not model2's fresh init
    k2 = np.asarray(trainer2.state["params"]["proj_out"]["kernel"])
    kfresh = np.asarray(init_dit(jax.random.key(1), TINY)["proj_out"]["kernel"])
    assert not np.allclose(k2, kfresh)


def test_sharded_state_roundtrip_and_elastic_resharding(tmp_path):
    """FSDP/mesh-sharded train state must round-trip through orbax WITHOUT
    losing its placement, and checkpoints must reshard across layouts —
    save sharded → restore replicated and save replicated → restore sharded
    (elastic resume: change the mesh/chip count between runs). The restore
    target's shardings are authoritative (TrainCheckpointManager.restore)."""
    from f5_tts_tpu.parallel.mesh import create_mesh, shard_state

    opt = make_optimizer(learning_rate=1e-3, num_warmup_steps=1, total_steps=10)
    state = init_train_state(init_dit(jax.random.key(0), TINY), opt)
    reference = jax.tree.map(np.asarray, state)

    mesh = create_mesh(data=4, model=2)
    sharded = shard_state(state, mesh, fsdp=True)
    # precondition: ZeRO actually sharded something ([64, 100] proj_out)
    assert "data" in sharded["params"]["proj_out"]["kernel"].sharding.spec

    mgr = TrainCheckpointManager(tmp_path / "ckpt", async_save=False)
    mgr.save(1, sharded)
    mgr.wait()

    # (a) sharded → sharded: placement preserved, values exact
    fresh = shard_state(
        init_train_state(init_dit(jax.random.key(9), TINY), opt), mesh, fsdp=True
    )
    restored = mgr.restore(1, fresh)
    for (path, leaf), want in zip(
        jax.tree_util.tree_flatten_with_path(restored)[0],
        jax.tree.leaves(fresh),
    ):
        assert leaf.sharding == want.sharding, (
            f"{jax.tree_util.keystr(path)} lost its sharding on restore: "
            f"{leaf.sharding} != {want.sharding}"
        )
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(reference)):
        np.testing.assert_array_equal(np.asarray(a), b)

    # (b) sharded → replicated (resume on fewer chips)
    restored_rep = mgr.restore(1, init_train_state(init_dit(jax.random.key(9), TINY), opt))
    for a, b in zip(jax.tree.leaves(restored_rep), jax.tree.leaves(reference)):
        np.testing.assert_array_equal(np.asarray(a), b)

    # (c) replicated → sharded (scale out from a single-chip run)
    mgr.save(2, state)
    mgr.wait()
    restored_sh = mgr.restore(2, fresh)
    k = restored_sh["params"]["proj_out"]["kernel"]
    assert "data" in k.sharding.spec, f"reshard-on-restore missing: {k.sharding}"
    for a, b in zip(jax.tree.leaves(restored_sh), jax.tree.leaves(reference)):
        np.testing.assert_array_equal(np.asarray(a), b)
    mgr.close()


def test_latest_with_no_checkpoints(tmp_path):
    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig())
    trainer = F5TTSTrainer(model, num_warmup_steps=1, results_dir=tmp_path)
    # "latest" with an empty dir starts fresh instead of crashing
    trainer.train(_dataset(2), total_steps=2, checkpoint="latest",
                  save_every=10**9, sample_every=10**9)
    assert int(trainer.state["step"]) == 2
