"""CFM loss and sampling semantics (reference: cfm.py:169-402)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import F5TTS, cfm_loss, sway_time_grid

TINY = DiTConfig(
    dim=64,
    depth=2,
    heads=2,
    dim_head=32,
    ff_mult=2,
    mel_dim=100,
    text_num_embeds=30,
    text_dim=16,
    conv_layers=1,
    use_flash_attention=False,
)
CFM = CFMConfig(duration_bucket=32)


@pytest.fixture(scope="module")
def model():
    return F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFM, vocab_char_map={"a": 1, "b": 2, " ": 3})


def test_loss_finite_and_deterministic(model):
    mel = jax.random.normal(jax.random.key(1), (2, 40, 100))
    text = jnp.array([[1, 2, 3, -1], [2, 2, 1, 1]])
    lens = jnp.array([40, 30])
    key = jax.random.key(42)
    l1 = cfm_loss(model.params, TINY, CFM, key, mel, text, lens)
    l2 = cfm_loss(model.params, TINY, CFM, key, mel, text, lens)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)
    # different key -> different randomness
    l3 = cfm_loss(model.params, TINY, CFM, jax.random.key(7), mel, text, lens)
    assert float(l1) != float(l3)


def test_loss_via_class_api(model):
    mel = jax.random.normal(jax.random.key(2), (2, 32, 100))
    loss = model(mel, ["ab a", "ba"], key=jax.random.key(0))
    assert np.isfinite(float(loss))


def test_loss_grads_flow(model):
    mel = jax.random.normal(jax.random.key(3), (1, 32, 100))
    text = jnp.array([[1, 2, -1]])
    lens = jnp.array([32])

    def f(p):
        return cfm_loss(p, TINY, CFM, jax.random.key(0), mel, text, lens)

    grads = jax.grad(f)(model.params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.square(g))), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_sway_time_grid():
    t = sway_time_grid(8, -1.0)
    assert t.shape == (8,)
    assert t[0] == 0.0
    np.testing.assert_allclose(t[-1], 1.0, atol=1e-6)
    assert (np.diff(t) > 0).all()
    # sway < 0 front-loads steps: early spacing smaller than late
    assert np.diff(t)[0] < np.diff(t)[-1]
    # no sway = plain linspace
    np.testing.assert_allclose(sway_time_grid(5, None), np.linspace(0, 1, 5), atol=1e-7)


def test_sample_shapes_and_cond_passthrough(model):
    cond = jax.random.normal(jax.random.key(4), (1, 20, 100))
    out, traj = model.sample(
        cond, ["ab"], duration=48, steps=3, method="euler", seed=5, cfg_strength=2.0
    )
    assert out.shape == (1, 48, 100)
    assert traj.shape == (3, 1, 48, 100)
    # conditioning region is passed through unchanged (reference: cfm.py:395-397)
    np.testing.assert_allclose(np.asarray(out[:, :20]), np.asarray(cond), atol=1e-6)


def test_sample_seed_reproducible(model):
    cond = jax.random.normal(jax.random.key(5), (1, 16, 100))
    o1, _ = model.sample(cond, ["a"], duration=40, steps=2, method="euler", seed=11)
    o2, _ = model.sample(cond, ["a"], duration=40, steps=2, method="euler", seed=11)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_sample_batch_with_different_durations(model):
    cond = jax.random.normal(jax.random.key(6), (2, 16, 100))
    out, _ = model.sample(
        cond, ["ab", "ba"], duration=np.array([30, 60]), steps=2, method="euler", seed=0
    )
    assert out.shape == (2, 60, 100)


def test_sample_duration_clamps(model):
    cond = jax.random.normal(jax.random.key(7), (1, 16, 100))
    # duration below lens+1 is clamped up
    out, _ = model.sample(cond, ["a"], duration=4, steps=2, method="euler", seed=0)
    assert out.shape[1] == 17  # lens + 1
    # duration above max_duration is clamped down
    out2, _ = model.sample(
        cond, ["a"], duration=10_000, steps=2, method="euler", seed=0, max_duration=64
    )
    assert out2.shape[1] == 64


def test_sample_rejects_ref_longer_than_max_duration(model):
    """A reference that cannot fit the max_duration-clamped window raises a
    clear ValueError instead of silently truncating the conditioning (fused
    path: zero generated frames) or crashing on a negative pad (segmented-CFG
    path)."""
    cond = jax.random.normal(jax.random.key(9), (1, 200, 100))
    with pytest.raises(ValueError, match="max_duration"):
        model.sample(cond, ["a"], duration=64, steps=2, method="euler",
                     seed=0, max_duration=128)
    with pytest.raises(ValueError, match="max_duration"):
        model.sample(cond, ["a"], duration=64, steps=2, method="euler",
                     seed=0, max_duration=128, cfg_interval=(0.0, 1.0))


def test_sample_cfg_zero_single_pass(model):
    cond = jax.random.normal(jax.random.key(8), (1, 16, 100))
    out, _ = model.sample(cond, ["a"], duration=32, steps=2, method="euler", seed=0, cfg_strength=0.0)
    assert out.shape == (1, 32, 100)


def test_bucketing_invariance(model):
    """The same request padded to different bucket sizes must produce the same
    mel inside the true duration (mask correctness)."""
    cond = jax.random.normal(jax.random.key(9), (1, 16, 100))
    o1, _ = model.sample(cond, ["ab"], duration=40, steps=2, method="euler", seed=3)

    import dataclasses

    model2 = F5TTS(
        model.params,
        TINY,
        cfm_cfg=dataclasses.replace(CFM, duration_bucket=64),
        vocab_char_map=model._vocab_char_map,
    )
    o2, _ = model2.sample(cond, ["ab"], duration=40, steps=2, method="euler", seed=3)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4, rtol=1e-4)


def test_no_recompile_within_bucket(model):
    """Distinct (predictor-style arbitrary) durations inside one bucket must
    hit the SAME compiled pipeline: max_dur is a dynamic scalar, not a jit
    cache key. Guards against the serving regression where every duration
    paid a full pipeline compile."""
    from f5_tts_tpu.models.cfm import cfm_sample_e2e

    cond = jax.random.normal(jax.random.key(10), (1, 16, 100))
    model.sample(cond, ["ab"], duration=40, steps=2, method="euler", seed=0)
    n_before = cfm_sample_e2e._cache_size()
    for dur in (41, 47, 53, 60):  # same 32-frame bucket range (33..64)
        out, _ = model.sample(cond, ["ab"], duration=dur, steps=2, method="euler", seed=0)
        assert out.shape[1] == dur
    assert cfm_sample_e2e._cache_size() == n_before


def test_fused_path_duration_independence(model):
    """A batch item's output must not depend on ANOTHER item's duration
    raising max_dur (the dynamic tail mask only zeroes past max_dur)."""
    cond = jax.random.normal(jax.random.key(11), (2, 16, 100))
    both, _ = model.sample(
        cond, ["ab", "ba"], duration=np.array([40, 60]), steps=2, method="euler", seed=2
    )
    solo, _ = model.sample(cond[:1], ["ab"], duration=40, steps=2, method="euler", seed=2)
    np.testing.assert_allclose(np.asarray(both[0, :40]), np.asarray(solo[0]), atol=1e-5, rtol=1e-5)


def test_inference_param_cache_invalidates_on_leaf_swap():
    """The cast cache keys on leaf identities: swapping a single leaf under
    the SAME params dict must produce a fresh cast copy, not a stale one
    (round-2 review footgun on the old root-id key)."""
    m = F5TTS.init(
        jax.random.key(0),
        TINY.replace(compute_dtype="bfloat16"),
        cfm_cfg=CFM,
        vocab_char_map={"a": 1},
    )
    first = m._inference_params()
    assert first["proj_out"]["kernel"].dtype == jnp.bfloat16
    # swap one leaf in place under the same tree object
    m.params["proj_out"]["kernel"] = jnp.zeros_like(m.params["proj_out"]["kernel"])
    second = m._inference_params()
    np.testing.assert_array_equal(np.asarray(second["proj_out"]["kernel"], np.float32), 0.0)
    # and an unchanged tree still hits the cache (same object back)
    assert m._inference_params() is second
