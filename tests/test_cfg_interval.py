"""Guidance-interval CFG (opt-in accelerator): equivalence and segmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import F5TTS

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=64, text_dim=32, conv_layers=1, use_flash_attention=False,
)


@pytest.fixture(scope="module")
def model():
    m = F5TTS.init(jax.random.key(0), TINY, cfm_cfg=CFMConfig(duration_bucket=64))
    # bound the ODE field: an untrained model's flow predictions can blow up
    # over integration steps (trained flow models keep pred ~ flow magnitudes).
    # Scaling proj_out keeps |dy/dt| small so the trajectory stays finite.
    m.params["proj_out"] = jax.tree.map(lambda x: x * 0.01, m.params["proj_out"])
    return m


def _sample(model, **kw):
    cond = 0.5 * jax.random.normal(jax.random.key(1), (1, 16, 100))
    text = jnp.array([[7, 12, 3]])  # ids within text_num_embeds
    out, traj = model.sample(cond, text, duration=48, steps=6,
                             method="euler", seed=3, **kw)
    return np.asarray(out), np.asarray(traj)


def test_full_interval_matches_default(model):
    o1, t1 = _sample(model)
    assert np.isfinite(o1).all()  # guard against vacuous NaN==NaN comparisons
    o2, t2 = _sample(model, cfg_interval=(0.0, 1.0))
    np.testing.assert_allclose(o1, o2, atol=1e-5)
    assert t1.shape == t2.shape


def test_partial_interval_runs_and_differs(model):
    o1, t1 = _sample(model)
    o2, t2 = _sample(model, cfg_interval=(0.0, 0.5))
    assert t2.shape == t1.shape  # trajectory length preserved across segments
    assert np.isfinite(o2).all()
    assert np.abs(o1 - o2).max() > 1e-6  # guidance-off tail changes the result


def test_interval_covering_nothing_equals_cfg_zero(model):
    o1, _ = _sample(model, cfg_interval=(2.0, 3.0))  # never active
    o2, _ = _sample(model, cfg_strength=0.0)
    np.testing.assert_allclose(o1, o2, atol=1e-5)


def test_no_trajectory_returns_final_state(model):
    """return_trajectory=False (what generate --cfg-interval uses) must yield
    the SAME final mel as the trajectory mode: each segment then returns only
    its end state, and a naive concat of segment pieces collapses to the
    FIRST segment's end state (round-4 regression)."""
    o_traj, t_full = _sample(model, cfg_interval=(0.0, 0.5))
    o_last, t_last = _sample(model, cfg_interval=(0.0, 0.5), return_trajectory=False)
    np.testing.assert_allclose(o_traj, o_last, atol=1e-5)
    assert t_last.shape[0] == 1  # just the final state


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 (virtual) devices")
def test_cfg_interval_composes_with_mesh(model):
    """The segmented-CFG path gets the same DP batch padding + device_put
    sharding as the fused path (round-3 weak #3): a 3-item batch on a 4-way
    data mesh must match single-device output."""
    from f5_tts_tpu.parallel.mesh import create_mesh

    cond = 0.5 * jax.random.normal(jax.random.key(2), (3, 16, 100))
    text = jnp.array([[7, 12, 3], [4, 5, -1], [9, -1, -1]])
    durs = np.array([48, 40, 56], np.int32)

    def run(m):
        out, _ = m.sample(cond, text, duration=durs, steps=6, method="euler",
                          seed=3, cfg_interval=(0.0, 0.5), return_trajectory=False)
        return np.asarray(out)

    out_ref = run(model)
    sharded = F5TTS(model.params, TINY, cfm_cfg=CFMConfig(duration_bucket=64))
    sharded.use_mesh(create_mesh(data=4))
    out_sh = run(sharded)
    np.testing.assert_allclose(out_ref, out_sh, atol=2e-4, rtol=2e-4)
