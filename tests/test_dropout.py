"""Dropout honors DiTConfig.dropout / DurationConfig.dropout in training and
stays inert at inference (reference: dit.py:89-96,111-125; duration.py:65-78).
"""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import CFMConfig, DiTConfig, DurationConfig
from f5_tts_tpu.models import blocks as B
from f5_tts_tpu.models.cfm import cfm_loss
from f5_tts_tpu.models.dit import dit_forward, init_dit
from f5_tts_tpu.models.duration import duration_forward, init_duration_transformer

TINY = dict(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
    text_num_embeds=64, text_dim=32, conv_layers=1, use_flash_attention=False,
)


def _dit_inputs(cfg, batch=2, seq=32):
    params = init_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (batch, seq, cfg.mel_dim))
    cond = jax.random.normal(jax.random.key(2), (batch, seq, cfg.mel_dim))
    text = jnp.zeros((batch, seq), jnp.int32)
    time = jnp.full((batch,), 0.5)
    return params, x, cond, text, time


def test_dropout_unit_inverted_scaling():
    x = jnp.ones((1000, 64))
    out = B.dropout(x, 0.5, jax.random.key(0))
    kept = np.asarray(out) != 0
    assert abs(kept.mean() - 0.5) < 0.05
    # inverted dropout preserves the expectation
    assert abs(float(out.mean()) - 1.0) < 0.05


def test_dit_dropout_stochastic_and_deterministic():
    cfg = DiTConfig(dropout=0.1, **TINY)
    params, x, cond, text, time = _dit_inputs(cfg)

    out_a = dit_forward(params, cfg, x, cond, text, time, dropout_key=jax.random.key(10))
    out_b = dit_forward(params, cfg, x, cond, text, time, dropout_key=jax.random.key(11))
    out_a2 = dit_forward(params, cfg, x, cond, text, time, dropout_key=jax.random.key(10))
    out_det = dit_forward(params, cfg, x, cond, text, time)

    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_a2))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_det))


def test_dit_dropout_zero_rate_ignores_key():
    cfg = DiTConfig(dropout=0.0, **TINY)
    params, x, cond, text, time = _dit_inputs(cfg)
    out_key = dit_forward(params, cfg, x, cond, text, time, dropout_key=jax.random.key(10))
    out_det = dit_forward(params, cfg, x, cond, text, time)
    np.testing.assert_array_equal(np.asarray(out_key), np.asarray(out_det))


def test_cfm_loss_dropout_changes_loss_only_when_enabled():
    cfg0 = DiTConfig(dropout=0.0, **TINY)
    cfg1 = DiTConfig(dropout=0.3, **TINY)
    cfm_cfg = CFMConfig()
    params = init_dit(jax.random.key(0), cfg0)
    mel = jax.random.normal(jax.random.key(1), (2, 48, cfg0.mel_dim))
    text = jnp.zeros((2, 48), jnp.int32)
    lens = jnp.full((2,), 48, jnp.int32)
    key = jax.random.key(7)

    loss0 = float(cfm_loss(params, cfg0, cfm_cfg, key, mel, text, lens))
    loss1 = float(cfm_loss(params, cfg1, cfm_cfg, key, mel, text, lens))
    loss1_again = float(cfm_loss(params, cfg1, cfm_cfg, key, mel, text, lens))
    assert loss0 != loss1  # dropout actually perturbs the forward
    assert loss1 == loss1_again  # but deterministically per key
    assert np.isfinite(loss1)
    # gradients flow through the dropout path
    g = jax.grad(lambda p: cfm_loss(p, cfg1, cfm_cfg, key, mel, text, lens))(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_duration_loss_dropout():
    tiny = dict(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                text_num_embeds=64, text_dim=32, conv_layers=1, use_flash_attention=False)
    cfg0 = DurationConfig(dropout=0.0, **tiny)
    cfg1 = DurationConfig(dropout=0.3, **tiny)
    params = init_duration_transformer(jax.random.key(0), cfg0)
    mel = jax.random.normal(jax.random.key(1), (2, 48, 100))
    text = jnp.zeros((2, 8), jnp.int32)
    lens = jnp.full((2,), 48, jnp.int32)
    key = jax.random.key(3)

    loss0 = float(duration_forward(params, cfg0, mel, text, lens, key=key, return_loss=True))
    loss1 = float(duration_forward(params, cfg1, mel, text, lens, key=key, return_loss=True))
    assert loss0 != loss1
    assert np.isfinite(loss1)
    # inference path is deterministic regardless of config dropout
    pred0 = duration_forward(params, cfg1, mel, text, lens)
    pred1 = duration_forward(params, cfg1, mel, text, lens)
    np.testing.assert_array_equal(np.asarray(pred0), np.asarray(pred1))
