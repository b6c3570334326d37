"""Checkpoint conversion round-trips: export (MLX naming) -> convert -> same
forward outputs; torch-EMA naming variant; quantized checkpoint path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.config import DiTConfig, DurationConfig
from f5_tts_tpu.models.convert import (
    convert_dit_state,
    convert_duration_state,
    export_dit_state,
    export_duration_state,
)
from f5_tts_tpu.models.dit import dit_forward, init_dit
from f5_tts_tpu.models.duration import duration_forward, init_duration_transformer
from f5_tts_tpu.models.quant import (
    convert_quantized_dit_state,
    dequantize_kernel,
    pack_mlx_uint32,
    quantize_kernel,
    quantize_tree,
    unpack_mlx_uint32,
)

TINY = DiTConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=12,
    text_num_embeds=30, text_dim=64, conv_layers=2, use_flash_attention=False,
)
TINY_DUR = DurationConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=12,
    text_dim=64, conv_layers=1, use_flash_attention=False,
)


def _tree_allclose(a, b, atol=0):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


def test_dit_export_convert_roundtrip():
    params = init_dit(jax.random.key(0), TINY)
    state = export_dit_state(params)
    back = convert_dit_state(state, TINY)
    _tree_allclose(params, back)


def test_dit_torch_ema_naming():
    """The published checkpoint style: ema_model. prefix, bare Sequential
    indices, torch conv layout, junk keys (reference: cfm.py:477-508)."""
    params = init_dit(jax.random.key(1), TINY)
    state = export_dit_state(params)
    torch_state = {}
    for k, v in state.items():
        k = "ema_model.transformer." + k.replace(".layers.", ".")
        if v.ndim == 3:  # MLX conv [out, k, in/g] -> torch [out, in/g, k]
            v = np.transpose(v, (0, 2, 1))
        torch_state[k] = v
    torch_state["ema_model.initted"] = np.array(True)
    torch_state["ema_model.step"] = np.array(1000)
    torch_state["ema_model.mel_spec.spec.window"] = np.zeros(4)
    back = convert_dit_state(torch_state, TINY)
    _tree_allclose(params, back)


def test_dit_conversion_preserves_forward():
    params = init_dit(jax.random.key(2), TINY)
    back = convert_dit_state(export_dit_state(params), TINY)
    x = jax.random.normal(jax.random.key(3), (1, 16, TINY.mel_dim))
    cond = jnp.zeros_like(x)
    text = jnp.array([[1, 2, -1]])
    o1 = dit_forward(params, TINY, x, cond, text, jnp.array([0.4]))
    o2 = dit_forward(back, TINY, x, cond, text, jnp.array([0.4]))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_duration_export_convert_roundtrip():
    params = init_duration_transformer(jax.random.key(4), TINY_DUR)
    back = convert_duration_state(export_duration_state(params), TINY_DUR)
    _tree_allclose(params, back)
    mel = jax.random.normal(jax.random.key(5), (1, 20, TINY_DUR.mel_dim))
    text = jnp.array([[1, 2, -1]])
    lens = jnp.array([20])
    o1 = duration_forward(params, TINY_DUR, mel, text, lens)
    o2 = duration_forward(back, TINY_DUR, mel, text, lens)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_missing_key_reports_helpfully():
    params = init_dit(jax.random.key(0), TINY)
    state = export_dit_state(params)
    del state["proj_out.weight"]
    with pytest.raises(KeyError, match="proj_out"):
        convert_dit_state(state, TINY)


def test_unconsumed_key_rejected():
    params = init_dit(jax.random.key(0), TINY)
    state = export_dit_state(params)
    state["mystery.weight"] = np.zeros((3, 3))
    with pytest.raises(ValueError, match="unconsumed"):
        convert_dit_state(state, TINY)


# ----------------------------------------------------------------- quant


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for bits in (4, 8):
        q = rng.integers(0, 1 << bits, size=(8, 128)).astype(np.uint8)
        packed = pack_mlx_uint32(q, bits)
        assert packed.shape == (8, 128 * bits // 32)
        np.testing.assert_array_equal(unpack_mlx_uint32(packed, bits), q)


@pytest.mark.parametrize("bits", [4, 8])
def test_quantize_dequantize_error_bounded(bits):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 32)).astype(np.float32)
    qp = quantize_kernel(w, bits)
    deq = np.asarray(dequantize_kernel(qp))
    # max error is half a quantization step per 64-group
    step = np.asarray(qp["scales"]).repeat(64, axis=0)
    assert (np.abs(deq - w) <= step / 2 + 1e-6).all()


def test_quantized_checkpoint_conversion():
    """Simulate an MLX-quantized published checkpoint and verify forward
    closeness to the float model."""
    bits = 8
    params = init_dit(jax.random.key(6), TINY)
    state = export_dit_state(params)

    qstate = {}
    for k, v in state.items():
        if k.endswith(".weight") and v.ndim == 2 and v.shape[1] % 64 == 0 and "text_embed.text_embed" not in k:
            qp = quantize_kernel(np.asarray(v).T, bits)  # our [in,out] layout
            offset = 1 << (bits - 1)
            codes = (np.asarray(qp["q"]).astype(np.int16) + offset).astype(np.uint8).T  # MLX unsigned codes [out, in]
            qstate[k] = pack_mlx_uint32(codes, bits)
            qstate[k[: -len(".weight")] + ".scales"] = np.asarray(qp["scales"]).T
            # MLX biases exclude the code offset
            qstate[k[: -len(".weight")] + ".biases"] = np.asarray(qp["biases"] - offset * qp["scales"]).T
        else:
            qstate[k] = v

    qparams = convert_quantized_dit_state(qstate, TINY, bits=bits)

    x = jax.random.normal(jax.random.key(7), (1, 16, TINY.mel_dim))
    cond = jnp.zeros_like(x)
    text = jnp.array([[1, 2, -1]])
    o_f = dit_forward(params, TINY, x, cond, text, jnp.array([0.4]))
    o_q = dit_forward(qparams, TINY, x, cond, text, jnp.array([0.4]))
    err = np.abs(np.asarray(o_f) - np.asarray(o_q)).mean()
    assert err < 0.05, f"8-bit forward drifted too far: {err}"


def test_quantize_tree_stacked_blocks():
    params = init_dit(jax.random.key(8), TINY)
    qparams = quantize_tree(params, 8)
    # stacked block linears got quantized with a leading depth axis
    assert "q" in qparams["blocks"]["attn"]["to_q"]
    assert qparams["blocks"]["attn"]["to_q"]["q"].shape[0] == TINY.depth
    # conv kernels untouched
    assert "kernel" in qparams["input_embed"]["conv_pos_embed"]["conv1"]
    # forward still works and is close
    x = jax.random.normal(jax.random.key(9), (1, 16, TINY.mel_dim))
    cond = jnp.zeros_like(x)
    text = jnp.array([[1, 2, -1]])
    o_f = dit_forward(params, TINY, x, cond, text, jnp.array([0.4]))
    o_q = dit_forward(qparams, TINY, x, cond, text, jnp.array([0.4]))
    assert np.abs(np.asarray(o_f) - np.asarray(o_q)).mean() < 0.05
