"""EMA training state, duration-aware dynamic batching, and data-parallel
sharded inference."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.data.loader import Stream
from f5_tts_tpu.models.cfm import F5TTS, cfm_sample_mel
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.training.trainer import init_train_state, make_optimizer, make_train_step

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=64, text_dim=32, conv_layers=1, use_flash_attention=False,
)


def test_ema_tracks_params():
    params = init_dit(jax.random.key(0), TINY)
    opt = make_optimizer(learning_rate=1e-2, num_warmup_steps=1, total_steps=100)
    state = init_train_state(params, opt, ema=True)
    step = jax.jit(make_train_step(TINY, CFMConfig(), opt, ema_decay=0.9))

    mel = jax.random.normal(jax.random.key(1), (2, 32, 100))
    text = jnp.zeros((2, 8), jnp.int32)
    lens = jnp.full((2,), 32, jnp.int32)

    for i in range(5):
        state, _ = step(state, mel, text, lens, jax.random.key(i))

    p = np.asarray(state["params"]["proj_out"]["kernel"])
    e = np.asarray(state["ema"]["proj_out"]["kernel"])
    p0 = np.asarray(params["proj_out"]["kernel"])
    # ema lags behind params but has moved from init
    assert not np.allclose(e, p)
    assert not np.allclose(e, p0)
    assert np.abs(e - p0).mean() < np.abs(p - p0).mean()


def test_trainer_writes_ema_checkpoint(tmp_path):
    from f5_tts_tpu.training import F5TTSTrainer

    model = F5TTS.init(jax.random.key(0), TINY)

    def dataset():
        for i in range(4):
            yield {
                "mel_spec": np.random.default_rng(i).standard_normal((2, 32, 100)).astype(np.float32),
                "mel_len": np.full((2,), 32, np.int32),
                "transcript": np.zeros((2, 8), np.int32),
            }

    trainer = F5TTSTrainer(model, num_warmup_steps=1, results_dir=tmp_path, ema_decay=0.99)
    trainer.train(dataset(), total_steps=4, save_every=4, sample_every=10**9)
    assert (tmp_path / "f5tts_4.safetensors").exists()
    assert (tmp_path / "f5tts_4.ema.safetensors").exists()


def test_dynamic_batch_respects_frame_budget():
    rng = np.random.default_rng(0)
    samples = [
        {"audio": np.zeros(int(n), np.float32), "transcript": np.array([1], np.int32)}
        for n in rng.integers(256 * 4, 256 * 40, size=50)
    ]
    s = Stream.from_list(samples)
    max_frames = 120
    batches = list(
        s.dynamic_batch(buffer_size=25, max_frames=max_frames, collate=lambda b: b, seed=0)
    )
    total = sum(len(b) for b in batches)
    assert total == 50  # nothing dropped
    for b in batches:
        frames = [x["audio"].shape[0] // 256 for x in b]
        assert len(b) * max(frames) <= max_frames or len(b) == 1
        # sorted-adjacent batching keeps length spread small
        assert max(frames) - min(frames) <= max(frames)


def test_sharded_inference_matches_unsharded():
    """TP+DP sharded sampling must produce the same mel as single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5_tts_tpu.parallel.mesh import create_mesh, shard_params

    params = init_dit(jax.random.key(0), TINY)
    b, n = 4, 64
    y0 = jax.random.normal(jax.random.key(1), (b, n, 100))
    step_cond = jax.random.normal(jax.random.key(2), (b, n, 100))
    text = jnp.zeros((b, n), jnp.int32)
    mask = jnp.ones((b, n), bool)
    ts = jnp.linspace(0.0, 1.0, 3)

    traj1 = cfm_sample_mel(params, TINY, y0, step_cond, text, mask, ts,
                           method="euler", cfg_strength=2.0)

    mesh = create_mesh(data=4, model=2)
    sp = shard_params(params, mesh)
    dsh = NamedSharding(mesh, P("data"))
    traj2 = cfm_sample_mel(
        sp, TINY,
        jax.device_put(y0, dsh), jax.device_put(step_cond, dsh),
        jax.device_put(text, dsh), jax.device_put(mask, dsh), ts,
        method="euler", cfg_strength=2.0,
    )
    np.testing.assert_allclose(np.asarray(traj1), np.asarray(traj2), atol=2e-4, rtol=1e-4)
