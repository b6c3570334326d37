"""Pipeline parallelism (parallel/pipeline.py): GPipe over the scan-stacked
depth axis must be numerically identical to the sequential forward, in value
AND in gradient, and must compose with a data axis on the same mesh.

Runs on the 8-virtual-CPU-device mesh from conftest. The reference has no
parallelism at all (SURVEY.md §2c); these tests pin our PP axis against the
single-device math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import DiTConfig
from f5_tts_tpu.models.dit import dit_forward, init_dit
from f5_tts_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    dit_forward_pipelined,
    shard_params_for_pipeline,
)

CFG = DiTConfig(
    dim=64,
    depth=4,
    heads=2,
    dim_head=32,
    ff_mult=2,
    mel_dim=20,
    text_num_embeds=40,
    text_dim=32,
    conv_layers=1,
    use_flash_attention=False,
    compute_dtype="float32",
)


def _inputs(batch=8, n=48, seed=0):
    k = jax.random.split(jax.random.key(seed), 4)
    x = jax.random.normal(k[0], (batch, n, CFG.mel_dim))
    cond = jax.random.normal(k[1], (batch, n, CFG.mel_dim))
    text = jax.random.randint(k[2], (batch, n), -1, CFG.text_num_embeds)
    time = jax.random.uniform(k[3], (batch,))
    return x, cond, text, time


@pytest.fixture(scope="module")
def params():
    return init_dit(jax.random.key(7), CFG)


@pytest.mark.parametrize("stages,microbatches", [(2, 1), (2, 4), (4, 2), (4, 4)])
def test_pipelined_forward_matches_sequential(params, stages, microbatches):
    x, cond, text, time = _inputs()
    ref = dit_forward(params, CFG, x, cond, text, time)

    mesh = create_pipeline_mesh(stages=stages, data=1)
    p_sh = shard_params_for_pipeline(params, mesh)
    out = jax.jit(
        lambda p, *a: dit_forward_pipelined(
            p, CFG, *a, mesh=mesh, num_microbatches=microbatches
        )
    )(p_sh, x, cond, text, time)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pipelined_forward_with_mask_and_drops(params):
    x, cond, text, time = _inputs(batch=4)
    lens = jnp.array([48, 30, 17, 48])
    mask = jnp.arange(x.shape[1])[None, :] < lens[:, None]
    drop_a = jnp.array([True, False, True, False])
    drop_t = jnp.array([False, False, True, True])
    ref = dit_forward(
        params, CFG, x, cond, text, time,
        drop_audio_cond=drop_a, drop_text=drop_t, mask=mask,
    )
    mesh = create_pipeline_mesh(stages=4, data=1)
    p_sh = shard_params_for_pipeline(params, mesh)
    out = jax.jit(
        lambda p, *a: dit_forward_pipelined(
            p, CFG, a[0], a[1], a[2], a[3],
            mesh=mesh, num_microbatches=2,
            drop_audio_cond=drop_a, drop_text=drop_t, mask=a[4],
        )
    )(p_sh, x, cond, text, time, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pipeline_composes_with_data_axis(params):
    """DP x PP on one mesh: batch sharded over "data", depth over "stage"."""
    x, cond, text, time = _inputs(batch=8)
    ref = dit_forward(params, CFG, x, cond, text, time)
    mesh = create_pipeline_mesh(stages=4, data=2)
    p_sh = shard_params_for_pipeline(params, mesh)
    out = jax.jit(
        lambda p, *a: dit_forward_pipelined(
            p, CFG, *a, mesh=mesh, num_microbatches=2
        )
    )(p_sh, x, cond, text, time)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pipelined_grad_matches_sequential(params):
    """jax.grad through the pipeline IS pipeline-parallel backprop; the
    cotangents must match the sequential backward."""
    x, cond, text, time = _inputs(batch=4)

    def loss_seq(p, xx):
        return jnp.sum(dit_forward(p, CFG, xx, cond, text, time) ** 2)

    mesh = create_pipeline_mesh(stages=2, data=1)
    p_sh = shard_params_for_pipeline(params, mesh)

    def loss_pp(p, xx):
        out = dit_forward_pipelined(
            p, CFG, xx, cond, text, time, mesh=mesh, num_microbatches=2
        )
        return jnp.sum(out**2)

    g_ref = jax.grad(loss_seq, argnums=1)(params, x)
    g_pp = jax.jit(jax.grad(loss_pp, argnums=1))(p_sh, x)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref), atol=2e-4, rtol=1e-4)

    # and a parameter gradient: depth-stacked leaf, stage-sharded
    gp_ref = jax.grad(loss_seq)(params, x)["blocks"]["ff"]["w1"]["kernel"]
    gp_pp = jax.jit(jax.grad(loss_pp))(p_sh, x)["blocks"]["ff"]["w1"]["kernel"]
    np.testing.assert_allclose(np.asarray(gp_pp), np.asarray(gp_ref), atol=2e-4, rtol=1e-4)


def test_pipeline_validates_divisibility(params):
    mesh = create_pipeline_mesh(stages=4, data=1)
    p_sh = shard_params_for_pipeline(params, mesh)
    bad_cfg = CFG.replace(depth=3)
    x, cond, text, time = _inputs(batch=4)
    with pytest.raises(ValueError, match="divisible"):
        dit_forward_pipelined(
            p_sh, bad_cfg, x, cond, text, time, mesh=mesh, num_microbatches=2
        )


def test_pipelined_dropout_deterministic_and_effective(params):
    """Dropout through the pipeline (round-3 weak #7): same key -> identical
    output, different key -> different output, and a key with rate 0 is the
    deterministic path. Masks intentionally do NOT match the sequential
    forward's (one full-batch mask per layer vs per-(layer, microbatch, data
    shard) draws — see pipeline.py module docstring)."""
    cfg_d = CFG.replace(dropout=0.3)
    x, cond, text, time = _inputs(batch=8)
    mesh = create_pipeline_mesh(stages=2, data=2)
    p_sh = shard_params_for_pipeline(params, mesh)

    def run(cfg, key):
        return jax.jit(
            lambda p, *a: dit_forward_pipelined(
                p, cfg, *a, mesh=mesh, num_microbatches=2, dropout_key=key
            )
        )(p_sh, x, cond, text, time)

    out_a = np.asarray(run(cfg_d, jax.random.key(3)))
    out_b = np.asarray(run(cfg_d, jax.random.key(3)))
    out_c = np.asarray(run(cfg_d, jax.random.key(4)))
    det = np.asarray(run(cfg_d, None))
    np.testing.assert_array_equal(out_a, out_b)
    assert np.abs(out_a - out_c).max() > 1e-4
    assert np.abs(out_a - det).max() > 1e-4
    # rate 0 + key -> exactly the deterministic path
    np.testing.assert_array_equal(
        np.asarray(run(CFG, jax.random.key(3))), np.asarray(run(CFG, None))
    )


def test_pipelined_dropout_grad_flows(params):
    """Training with dropout works through the pipeline: finite grads with
    the same tree structure as the params."""
    cfg_d = CFG.replace(dropout=0.2)
    x, cond, text, time = _inputs(batch=4)
    mesh = create_pipeline_mesh(stages=2, data=1)
    p_sh = shard_params_for_pipeline(params, mesh)

    def loss(p):
        out = dit_forward_pipelined(
            p, cfg_d, x, cond, text, time, mesh=mesh, num_microbatches=2,
            dropout_key=jax.random.key(11),
        )
        return jnp.mean(out**2)

    g = jax.jit(jax.grad(loss))(p_sh)
    leaves = jax.tree.leaves(g)
    assert len(leaves) == len(jax.tree.leaves(p_sh))
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
