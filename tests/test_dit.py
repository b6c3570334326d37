"""DiT backbone semantics: shapes, CFG drop flags, masking, scan-stacked blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import DiTConfig
from f5_tts_tpu.models import blocks as B
from f5_tts_tpu.models.dit import dit_forward, init_dit
from f5_tts_tpu.models.rope import apply_rotary_pos_emb, rotary_freqs

TINY = DiTConfig(
    dim=64,
    depth=2,
    heads=2,
    dim_head=32,
    ff_mult=2,
    mel_dim=10,
    text_num_embeds=30,
    text_dim=16,
    conv_layers=2,
    use_flash_attention=False,
)


@pytest.fixture(scope="module")
def params():
    return init_dit(jax.random.key(0), TINY)


def _inputs(b=2, n=24, nt=8, seed=1):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], (b, n, TINY.mel_dim))
    cond = jax.random.normal(ks[1], (b, n, TINY.mel_dim))
    text = jax.random.randint(ks[2], (b, nt), 0, TINY.text_num_embeds)
    time = jnp.array([0.3, 0.7])[:b]
    return x, cond, text, time


def test_forward_shape(params):
    x, cond, text, time = _inputs()
    out = dit_forward(params, TINY, x, cond, text, time)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_scalar_time_broadcast(params):
    x, cond, text, _ = _inputs()
    out1 = dit_forward(params, TINY, x, cond, text, jnp.float32(0.5))
    out2 = dit_forward(params, TINY, x, cond, text, jnp.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_batched_cfg_equals_two_calls(params):
    """Per-sample drop flags must reproduce the reference's two-call CFG
    (reference: cfm.py:342-363) exactly."""
    x, cond, text, time = _inputs(b=2)
    pred = dit_forward(params, TINY, x, cond, text, time, False, False)
    null = dit_forward(params, TINY, x, cond, text, time, True, True)

    x2 = jnp.concatenate([x, x])
    cond2 = jnp.concatenate([cond, cond])
    text2 = jnp.concatenate([text, text])
    time2 = jnp.concatenate([time, time])
    drop = jnp.array([False, False, True, True])
    both = dit_forward(params, TINY, x2, cond2, text2, time2, drop, drop)

    np.testing.assert_allclose(np.asarray(both[:2]), np.asarray(pred), atol=1e-5)
    np.testing.assert_allclose(np.asarray(both[2:]), np.asarray(null), atol=1e-5)


def test_drop_text_ignores_text_content(params):
    x, cond, text, time = _inputs()
    other_text = (text + 7) % TINY.text_num_embeds
    a = dit_forward(params, TINY, x, cond, text, time, drop_text=True)
    b = dit_forward(params, TINY, x, cond, other_text, time, drop_text=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_drop_audio_ignores_cond(params):
    x, cond, text, time = _inputs()
    a = dit_forward(params, TINY, x, cond, text, time, drop_audio_cond=True)
    b = dit_forward(params, TINY, x, cond * 3.0, text, time, drop_audio_cond=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_padding_mask_blocks_information_leak(params):
    """Changing x beyond a sample's mask must not change in-mask outputs."""
    x, cond, text, time = _inputs(b=2, n=24)
    mask = jnp.asarray(np.array([[True] * 16 + [False] * 8, [True] * 24]))
    out1 = dit_forward(params, TINY, x, cond, text, time, mask=mask)
    x_mod = x.at[0, 20].set(99.0)
    out2 = dit_forward(params, TINY, x_mod, cond, text, time, mask=mask)
    # attention can't see the padded position; only conv-local leakage exists
    # at distance <= receptive field of conv pos embed (31*2//2=31 taps), so
    # compare well inside the valid region
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]), atol=1e-6)


def test_text_embedding_padding_semantics(params):
    """-1-padded text embeds the filler token; longer text is truncated
    (reference: dit.py:196-229)."""
    p = params["text_embed"]
    text = jnp.array([[3, 4, -1, -1]])
    e1 = B.text_embedding(p, text, seq_len=6, dtype=jnp.float32)
    assert e1.shape == (1, 6, TINY.text_dim)
    # explicit filler tokens produce the same embedding as -1 padding
    text2 = jnp.array([[3, 4]])
    e2 = B.text_embedding(p, text2, seq_len=6, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_rope_relative_property():
    """q.k after RoPE depends only on relative distance."""
    dim = 32
    freqs = rotary_freqs(16, dim)
    q = jax.random.normal(jax.random.key(2), (1, 1, 16, dim))
    k = jax.random.normal(jax.random.key(3), (1, 1, 16, dim))
    qr = apply_rotary_pos_emb(q, freqs)
    kr = apply_rotary_pos_emb(k, freqs)
    # shift content by 1 position and compare relative dots
    q_shift = jnp.concatenate([q[..., :1, :], q[..., :-1, :]], axis=2)
    k_shift = jnp.concatenate([k[..., :1, :], k[..., :-1, :]], axis=2)
    qr2 = apply_rotary_pos_emb(q_shift, freqs)
    kr2 = apply_rotary_pos_emb(k_shift, freqs)
    a = jnp.einsum("bhd,bhd->bh", qr[..., 5, :], kr[..., 9, :])
    b = jnp.einsum("bhd,bhd->bh", qr2[..., 6, :], kr2[..., 10, :])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_grn_normalization():
    p = {"gamma": jnp.ones((1, 1, 4)), "beta": jnp.zeros((1, 1, 4))}
    x = jax.random.normal(jax.random.key(4), (2, 8, 4))
    out = B.grn(p, x)
    gx = np.linalg.norm(np.asarray(x), axis=1, keepdims=True)
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * nx + np.asarray(x), atol=1e-5)


def test_time_mods_schedule_matches_direct_forward():
    """dit_forward_precomputed(time_mods=...) must equal the direct path that
    derives the AdaLN conditioning from scalar t inside the forward — the
    contract behind hoisting the schedule out of the ODE scan
    (reference semantics: dit.py:73-82,259-290)."""
    from f5_tts_tpu.models.dit import dit_forward_precomputed, dit_text_embed, dit_time_mods

    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
        text_num_embeds=24, text_dim=16, conv_layers=1, use_flash_attention=False,
    )
    params = init_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 8))
    cond = jax.random.normal(jax.random.key(2), (2, 32, 8))
    text = jnp.zeros((2, 32), jnp.int32)
    te = dit_text_embed(params, cfg, text, 32)
    times = jnp.array([0.125, 0.625])
    mods = dit_time_mods(params, cfg, times)
    for i, tv in enumerate(np.asarray(times)):
        sliced = jax.tree.map(lambda a: a[i], mods)
        got = dit_forward_precomputed(params, cfg, x, cond, te, float(tv), time_mods=sliced)
        ref = dit_forward_precomputed(params, cfg, x, cond, te, float(tv))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
