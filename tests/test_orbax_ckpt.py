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


def test_latest_with_no_checkpoints(tmp_path):
    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig())
    trainer = F5TTSTrainer(model, num_warmup_steps=1, results_dir=tmp_path)
    # "latest" with an empty dir starts fresh instead of crashing
    trainer.train(_dataset(2), total_steps=2, checkpoint="latest",
                  save_every=10**9, sample_every=10**9)
    assert int(trainer.state["step"]) == 2
