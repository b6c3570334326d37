"""Pallas op wrappers (interpret mode on CPU), remat, and profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import CFMConfig, DiTConfig
from f5_tts_tpu.models.cfm import cfm_loss
from f5_tts_tpu.models.dit import dit_forward, init_dit
from f5_tts_tpu.models.quant import dequantize_kernel, quantize_kernel
from f5_tts_tpu.ops.qmatmul import qmatmul


def test_qmatmul_matches_dequant():
    rng = np.random.default_rng(0)
    k, n, m = 128, 256, 48
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    for bits in (4, 8):
        p = quantize_kernel(w, bits)
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        got = np.asarray(qmatmul(x, p))
        want = np.asarray(x @ dequantize_kernel(p))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_qmatmul_batched_leading_dims():
    rng = np.random.default_rng(1)
    k, n = 128, 128
    p = quantize_kernel(rng.standard_normal((k, n)).astype(np.float32), 8)
    x = jnp.asarray(rng.standard_normal((2, 24, k)).astype(np.float32))
    got = np.asarray(qmatmul(x, p))
    assert got.shape == (2, 24, n)
    want = np.asarray(x.reshape(-1, k) @ dequantize_kernel(p)).reshape(2, 24, n)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_remat_same_values_and_grads():
    cfg = DiTConfig(
        dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=16,
        text_num_embeds=32, text_dim=16, conv_layers=1, use_flash_attention=False,
    )
    params = init_dit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 24, 16))
    cond = jnp.zeros_like(x)
    text = jnp.array([[1, 2, -1]])
    time = jnp.array([0.5])

    cfg_r = cfg.replace(remat=True)
    o1 = dit_forward(params, cfg, x, cond, text, time)
    o2 = dit_forward(params, cfg_r, x, cond, text, time)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    mel = jax.random.normal(jax.random.key(2), (1, 24, 16))
    lens = jnp.array([24])
    g1 = jax.grad(lambda p: cfm_loss(p, cfg, CFMConfig(), jax.random.key(3), mel, text, lens))(params)
    g2 = jax.grad(lambda p: cfm_loss(p, cfg_r, CFMConfig(), jax.random.key(3), mel, text, lens))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_timer_and_sync():
    from f5_tts_tpu.utils.profiling import Timer, device_sync

    x = jnp.ones((8, 8)) * 2
    device_sync(x)  # no crash on plain arrays
    with Timer("t", verbose=False) as t:
        y = x @ x
        t.sync(y)
    assert t.elapsed is not None and t.elapsed >= 0


def test_compilation_cache_config(tmp_path, monkeypatch):
    from f5_tts_tpu.utils.profiling import enable_compilation_cache

    # the suite runs with F5_TTS_COMPILE_CACHE=off (conftest): jax's threaded
    # cache-write path has segfaulted under the serve tests, so "off" must be
    # a hard no-op
    monkeypatch.setenv("F5_TTS_COMPILE_CACHE", "off")
    enable_compilation_cache(str(tmp_path / "never"))
    assert not (tmp_path / "never").exists()

    monkeypatch.delenv("F5_TTS_COMPILE_CACHE")
    try:
        enable_compilation_cache(str(tmp_path / "cache"))
        assert (tmp_path / "cache").exists()
    finally:
        # leave the persistent cache OFF for the rest of the suite
        jax.config.update("jax_compilation_cache_dir", None)


def test_grouped_conv_split_lowering_grads_match_xla():
    """The k31/g16 conv position embedding uses a tap-sum forward with
    XLA-conv-derived gradients (custom_vjp; utils/modules.py:_grouped_conv).
    Forward AND all gradients must match the plain XLA feature_group_count
    lowering (reference semantics: dit.py:29-50)."""
    import f5_tts_tpu.utils.modules as m

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 33, 64)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.standard_normal((31, 8, 64)) * 0.05, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((64,)) * 0.05, jnp.float32),
    }

    def loss(p, x):
        return (m.conv1d(p, x, groups=8) ** 2).sum()

    y_tap = m.conv1d(p, x, groups=8)
    g_tap = jax.grad(loss, argnums=(0, 1))(p, x)
    assert m.TAPSUM_GROUPED_CONV
    m.TAPSUM_GROUPED_CONV = False
    try:
        y_xla = m.conv1d(p, x, groups=8)
        g_xla = jax.grad(loss, argnums=(0, 1))(p, x)
    finally:
        m.TAPSUM_GROUPED_CONV = True

    np.testing.assert_allclose(y_tap, y_xla, atol=1e-5)
    np.testing.assert_allclose(g_tap[0]["kernel"], g_xla[0]["kernel"], atol=1e-4)
    np.testing.assert_allclose(g_tap[0]["bias"], g_xla[0]["bias"], atol=1e-4)
    np.testing.assert_allclose(g_tap[1], g_xla[1], atol=1e-4)


def test_w8a8_linear_close_to_float():
    """int8-COMPUTE path (models/quant.w8a8_blocks + modules._w8a8_matmul):
    symmetric W8A8 stays within per-column quantization tolerance."""
    import jax

    from f5_tts_tpu.models.quant import w8a8_from_kernel
    from f5_tts_tpu.utils.modules import linear

    k = jax.random.normal(jax.random.key(0), (128, 256)) * 0.05
    b = jax.random.normal(jax.random.key(1), (256,)) * 0.01
    x = jax.random.normal(jax.random.key(2), (4, 32, 128))
    ref = linear({"kernel": k, "bias": b}, x)
    p8 = w8a8_from_kernel(k)
    p8["bias"] = b
    got = linear(p8, x)
    rel = float(jnp.abs(got - ref).mean() / jnp.abs(ref).mean())
    assert rel < 2e-2, rel
    # stacked-depth kernels quantize per layer
    ks = jax.random.normal(jax.random.key(3), (3, 128, 256)) * 0.05
    p = w8a8_from_kernel(ks)
    assert p["w8"].shape == (3, 128, 256) and p["w8_scale"].shape == (3, 256)


def test_w8a8_sampling_close_to_float():
    import jax

    from f5_tts_tpu.config import CFMConfig, DiTConfig
    from f5_tts_tpu.models.cfm import F5TTS

    cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=100,
                    text_num_embeds=256, text_dim=32, conv_layers=1,
                    use_flash_attention=False)
    m = F5TTS.init(jax.random.key(0), cfg, cfm_cfg=CFMConfig(duration_bucket=64))
    cond = jax.random.normal(jax.random.key(5), (1, 32, 100))
    o_f, _ = m.sample(cond, ["hello world"], duration=128, steps=4, method="euler", seed=0)
    m8 = F5TTS(m.params, cfg.replace(int8_compute=True),
               cfm_cfg=CFMConfig(duration_bucket=64))
    o_8, _ = m8.sample(cond, ["hello world"], duration=128, steps=4, method="euler", seed=0)
    a, b = np.asarray(o_f), np.asarray(o_8)
    assert float(np.abs(a - b).mean() / np.abs(a).mean()) < 1e-2
