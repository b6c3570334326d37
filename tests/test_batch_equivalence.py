"""Batched sampling == per-item sampling.

The serving micro-batcher mixes requests with different reference lengths,
texts, and durations into one batched sample() call; this is only sound if a
batch item's output is independent of its co-batched neighbors (attention
masking, per-item lens/duration, conv locality all must hold together)."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import F5TTS

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=64, text_dim=32, conv_layers=1, use_flash_attention=False,
)


def _model():
    m = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig(duration_bucket=64))
    m.params["proj_out"] = jax.tree.map(lambda x: x * 0.01, m.params["proj_out"])
    return m


def test_mixed_batch_matches_individual_sampling():
    m = _model()
    # two items with different ref lengths, texts, durations (same bucket)
    cond = 0.3 * jax.random.normal(jax.random.key(1), (2, 20, 100))
    lens = np.array([12, 20], dtype=np.int32)  # item 0's ref is shorter
    cond_masked = cond.at[0, 12:].set(0.0)
    text = jnp.array([[3, 7, -1, -1], [5, 1, 2, 9]])
    durations = np.array([40, 60], dtype=np.int32)

    batched, _ = m.sample(
        cond_masked, text, duration=durations, lens=jnp.asarray(lens),
        steps=3, method="euler", seed=9,
    )

    for i in range(2):
        single, _ = m.sample(
            cond_masked[i:i + 1, : lens[i]], text[i:i + 1],
            duration=int(durations[i]), steps=3, method="euler", seed=9,
        )
        n = single.shape[1]
        np.testing.assert_allclose(
            np.asarray(batched[i, :n]), np.asarray(single[0]), atol=2e-4, rtol=1e-3,
            err_msg=f"batch item {i} diverged from individual sampling",
        )


def test_dynamic_batch_feeds_trainer():
    """dynamic_batch -> collate -> trainer consumes end to end."""
    from f5_tts_tpu.data.loader import Stream, collate_audio_batch
    from f5_tts_tpu.training import F5TTSTrainer

    rng = np.random.default_rng(0)
    samples = [
        {"audio": rng.standard_normal(int(n)).astype(np.float32) * 0.1,
         "transcript": np.array([1, 2, 3], np.int32)}
        for n in rng.integers(256 * 8, 256 * 24, size=12)
    ]
    pipeline = Stream.from_list(samples).dynamic_batch(
        buffer_size=12, max_frames=64,
        collate=lambda b: collate_audio_batch(b, pad_frame_multiple=8), seed=0,
    )
    model = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig())
    trainer = F5TTSTrainer(model, num_warmup_steps=1, results_dir="/tmp/dynbatch_results")
    trainer.train(pipeline, total_steps=3, save_every=10**9, sample_every=10**9)
    assert int(trainer.state["step"]) == 3
