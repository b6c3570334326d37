"""Golden-value parity: an independent PyTorch reimplementation of the
reference semantics (dit.py / convnext_v2.py / rope.py), fed the SAME weights,
must match our JAX forward to float32 precision.

This is the strongest available proxy for the BASELINE mel-MAE criterion
without the MLX runtime: every architectural subtlety the pretrained weights
depend on (interleaved RoPE pairs, AdaLN-Zero split order, GRN over the
sequence axis, text +1 shift / re-masking, sinusoidal [sin|cos] order, tanh
GELU in FF, exact GELU in ConvNeXt) is cross-checked against a from-the-paper
torch implementation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from f5_tts_tpu.config import DiTConfig  # noqa: E402
from f5_tts_tpu.models import blocks as B  # noqa: E402
from f5_tts_tpu.models.dit import dit_forward, init_dit  # noqa: E402

CFG = DiTConfig(
    dim=128, depth=3, heads=4, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=40, text_dim=64, conv_layers=2, use_flash_attention=False,
)


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def t_linear(p, x):
    w = t(p["kernel"]).T  # torch convention [out, in]
    b = t(p["bias"]) if "bias" in p else None
    return F.linear(x, w, b)


def t_conv1d(p, x, groups=1, padding=0, dilation=1):
    # x: [b, n, c] -> torch conv over [b, c, n]
    w = t(p["kernel"]).permute(2, 1, 0)  # [k, in/g, out] -> [out, in/g, k]
    b = t(p["bias"]) if "bias" in p else None
    y = F.conv1d(x.transpose(1, 2), w, b, padding=padding, groups=groups, dilation=dilation)
    return y.transpose(1, 2)


def t_layer_norm(x, p=None, eps=1e-6):
    y = F.layer_norm(x, (x.shape[-1],), eps=eps)
    if p is not None:
        y = y * t(p["scale"]) + t(p["bias"])
    return y


# ---------------------------------------------------------------- reference
# torch reimplementation of the reference forward semantics


def t_timestep_embedding(p, time, dim=256):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half) * -emb)
    emb = 1000.0 * time[:, None] * emb[None, :]
    h = torch.cat([emb.sin(), emb.cos()], dim=-1)
    return t_linear(p["mlp2"], F.silu(t_linear(p["mlp1"], h)))


def t_grn(p, x):
    gx = torch.linalg.norm(x, ord=2, dim=1, keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    return t(p["gamma"]) * (x * nx) + t(p["beta"]) + x


def t_convnext_block(p, x):
    residual = x
    x = t_conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    x = t_layer_norm(x, p["norm"])
    x = t_linear(p["pwconv1"], x)
    x = F.gelu(x)  # exact GELU (reference: convnext_v2.py:42)
    x = t_grn(p["grn"], x)
    x = t_linear(p["pwconv2"], x)
    return residual + x


def t_text_embedding(p, text, seq_len, cfg, drop_text=False):
    text = text + 1
    text = text[:, :seq_len]
    text = F.pad(text, (0, seq_len - text.shape[1]), value=0)
    text_mask = (text == 0).unsqueeze(-1)
    if drop_text:
        text = torch.zeros_like(text)
    x = F.embedding(text, t(p["embed"]["embedding"]))
    # absolute sin/cos table (reference: rope.py:63-73, dit.py:213-218)
    freqs = 1.0 / (10000.0 ** (torch.arange(0, cfg.text_dim, 2)[: cfg.text_dim // 2] / cfg.text_dim))
    pos = torch.outer(torch.arange(seq_len).float(), freqs)
    pos_emb = torch.cat([pos.cos(), pos.sin()], dim=-1)
    x = x + pos_emb[None]
    x = torch.where(text_mask, torch.zeros_like(x), x)
    for bp in p["blocks"]:
        x = t_convnext_block(bp, x)
        x = torch.where(text_mask, torch.zeros_like(x), x)
    return x


def t_conv_pos_embed(p, x):
    y = t_conv1d(p["conv1"], x, groups=16, padding=15)
    y = y * torch.tanh(F.softplus(y))  # Mish
    y = t_conv1d(p["conv2"], y, groups=16, padding=15)
    return y * torch.tanh(F.softplus(y))


def t_rotary(seq_len, dim):
    inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
    f = torch.outer(torch.arange(seq_len).float(), inv)
    return torch.repeat_interleave(f, 2, dim=-1)  # (d r) interleave


def t_rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack([-x2, x1], dim=-1).reshape(*x.shape[:-2], -1)


def t_attention(p, x, heads, freqs):
    b, n, _ = x.shape
    q = t_linear(p["to_q"], x).reshape(b, n, heads, -1).transpose(1, 2)
    k = t_linear(p["to_k"], x).reshape(b, n, heads, -1).transpose(1, 2)
    v = t_linear(p["to_v"], x).reshape(b, n, heads, -1).transpose(1, 2)
    cos, sin = freqs.cos(), freqs.sin()
    q = q * cos + t_rotate_half(q) * sin
    k = k * cos + t_rotate_half(k) * sin
    scale = 1.0 / math.sqrt(q.shape[-1])
    attn = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
    return t_linear(p["to_out"], out)


def t_dit_block(p, x, temb, heads, freqs):
    mod = t_linear(p["attn_norm"]["linear"], F.silu(temb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mod.chunk(6, dim=1)
    norm = t_layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    x = x + gate_msa[:, None] * t_attention(p["attn"], norm, heads, freqs)
    norm = t_layer_norm(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff = t_linear(p["ff"]["w2"], F.gelu(t_linear(p["ff"]["w1"], norm), approximate="tanh"))
    return x + gate_mlp[:, None] * ff


def t_dit_forward(params, cfg, x, cond, text, time, drop_audio=False, drop_text=False):
    b, n = x.shape[0], x.shape[1]
    temb = t_timestep_embedding(params["time_embed"], time)
    text_emb = t_text_embedding(params["text_embed"], text, n, cfg, drop_text)
    if drop_audio:
        cond = torch.zeros_like(cond)
    h = t_linear(params["input_embed"]["proj"], torch.cat([x, cond, text_emb], dim=-1))
    h = t_conv_pos_embed(params["input_embed"]["conv_pos_embed"], h) + h
    freqs = t_rotary(n, cfg.dim_head)
    blocks = [
        jax.tree.map(lambda a, i=i: np.asarray(a[i]), params["blocks"]) for i in range(cfg.depth)
    ]
    for bp in blocks:
        h = t_dit_block(bp, h, temb, cfg.heads, freqs)
    mod = t_linear(params["norm_out"]["linear"], F.silu(temb))
    scale, shift = mod.chunk(2, dim=1)
    h = t_layer_norm(h) * (1 + scale[:, None]) + shift[:, None]
    return t_linear(params["proj_out"], h)


# ---------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def params():
    return init_dit(jax.random.key(0), CFG)


def _inputs(b=2, n=32, nt=10):
    ks = jax.random.split(jax.random.key(42), 3)
    x = jax.random.normal(ks[0], (b, n, CFG.mel_dim))
    cond = jax.random.normal(ks[1], (b, n, CFG.mel_dim))
    text = jax.random.randint(ks[2], (b, nt), -1, CFG.text_num_embeds)
    time = jnp.array([0.25, 0.75])[:b]
    return x, cond, text, time


def test_full_forward_matches_torch_golden(params):
    x, cond, text, time = _inputs()
    ours = np.asarray(dit_forward(params, CFG, x, cond, text, time))
    golden = t_dit_forward(
        params, CFG, t(x), t(cond), torch.from_numpy(np.asarray(text)).long(), t(time)
    ).numpy()
    assert ours.shape == golden.shape
    mae = np.abs(ours - golden).mean()
    assert mae < 1e-5, f"forward diverged from reference semantics: MAE {mae}"


def test_forward_with_cfg_drops_matches_torch(params):
    x, cond, text, time = _inputs()
    ours = np.asarray(dit_forward(params, CFG, x, cond, text, time, True, True))
    golden = t_dit_forward(
        params, CFG, t(x), t(cond), torch.from_numpy(np.asarray(text)).long(), t(time),
        drop_audio=True, drop_text=True,
    ).numpy()
    mae = np.abs(ours - golden).mean()
    assert mae < 1e-5, f"CFG-dropped forward diverged: MAE {mae}"


def test_timestep_embedding_matches(params):
    time = jnp.array([0.1, 0.9])
    ours = np.asarray(B.timestep_embedding(params["time_embed"], time))
    golden = t_timestep_embedding(params["time_embed"], t(time)).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_text_embedding_matches(params):
    text = jnp.array([[3, 5, -1, -1], [1, 2, 3, 4]])
    ours = np.asarray(B.text_embedding(params["text_embed"], text, 8, max_pos=CFG.max_pos))
    golden = t_text_embedding(
        params["text_embed"], torch.from_numpy(np.asarray(text)).long(), 8, CFG
    ).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_attention_matches(params):
    from f5_tts_tpu.models.rope import rotary_freqs

    bp = jax.tree.map(lambda a: np.asarray(a[0]), params["blocks"])
    x = jax.random.normal(jax.random.key(1), (2, 16, CFG.dim))
    ours = np.asarray(
        B.attention(bp["attn"], jnp.asarray(x), CFG.heads,
                    rope_freqs=rotary_freqs(16, CFG.dim_head), use_flash=False)
    )
    golden = t_attention(bp["attn"], t(x), CFG.heads, t_rotary(16, CFG.dim_head)).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5)


# ------------------------------------------------- duration predictor parity

from f5_tts_tpu.config import DurationConfig  # noqa: E402
from f5_tts_tpu.models.duration import (  # noqa: E402
    duration_forward,
    init_duration_transformer,
)

DUR_CFG = DurationConfig(
    dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=20,
    text_num_embeds=40, text_dim=64, conv_layers=1, use_flash_attention=False,
)


def t_rms_norm(x, p, eps=1e-5):
    y = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return y * t(p["scale"])


def t_duration_forward(params, cfg, inp, text, lens, fps=93.75):
    b, n = inp.shape[0], inp.shape[1]
    # mask + zero (reference: duration.py:228-243)
    mask = torch.arange(n)[None, :] < lens[:, None]
    x = torch.where(mask.unsqueeze(-1), inp, torch.zeros_like(inp))
    # text embed with mask_padding=False (reference: duration.py:116-118)
    text_emb = t_text_embedding_nomask(params["text_embed"], text, n, cfg)
    h = t_linear(params["input_embed"]["proj"], torch.cat([x, text_emb], dim=-1))
    h = t_conv_pos_embed(params["input_embed"]["conv_pos_embed"], h) + h
    freqs = t_rotary(n, cfg.dim_head)
    blocks = [
        jax.tree.map(lambda a, i=i: np.asarray(a[i]), params["blocks"]) for i in range(cfg.depth)
    ]
    for bp in blocks:
        h = h + t_attention(bp["attn"], t_layer_norm(h), cfg.heads, freqs)
        ff_in = t_layer_norm(h)
        h = h + t_linear(bp["ff"]["w2"], F.gelu(t_linear(bp["ff"]["w1"], ff_in), approximate="tanh"))
    h = t_rms_norm(h, params["norm_out"])
    # masked mean (reference: utils.py:82-90)
    hm = torch.where(mask.unsqueeze(-1), h, torch.zeros_like(h))
    pooled = hm.sum(1) / mask.sum(1, keepdim=True).clamp(min=1)
    return F.softplus(t_linear(params["to_pred"], pooled)).squeeze(-1)


def t_text_embedding_nomask(p, text, seq_len, cfg):
    text = text + 1
    text = text[:, :seq_len]
    text = F.pad(text, (0, seq_len - text.shape[1]), value=0)
    x = F.embedding(text, t(p["embed"]["embedding"]))
    freqs = 1.0 / (10000.0 ** (torch.arange(0, cfg.text_dim, 2)[: cfg.text_dim // 2] / cfg.text_dim))
    pos = torch.outer(torch.arange(seq_len).float(), freqs)
    x = x + torch.cat([pos.cos(), pos.sin()], dim=-1)[None]
    for bp in p["blocks"]:
        x = t_convnext_block(bp, x)
    return x


def test_duration_predictor_matches_torch_golden():
    params = init_duration_transformer(jax.random.key(5), DUR_CFG)
    inp = jax.random.normal(jax.random.key(6), (2, 24, DUR_CFG.mel_dim))
    text = jnp.array([[3, 5, -1, -1], [1, 2, 3, 4]])
    lens = jnp.array([20, 24])

    ours = np.asarray(duration_forward(params, DUR_CFG, inp, text, lens))
    golden = t_duration_forward(
        params, DUR_CFG, t(inp), torch.from_numpy(np.asarray(text)).long(),
        torch.from_numpy(np.asarray(lens)).long(),
    ).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-5)


# ------------------------------------------------- vocos vocoder parity

from f5_tts_tpu.config import VocosConfig  # noqa: E402
from f5_tts_tpu.models.vocos import init_vocos, vocos_decode  # noqa: E402

VOCOS_CFG = VocosConfig(input_channels=20, dim=64, intermediate_dim=128, num_layers=2)


def t_vocos_convnext(p, x):
    residual = x
    x = t_conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    x = t_layer_norm(x, p["norm"])
    x = t_linear(p["pwconv1"], x)
    x = F.gelu(x)
    x = t_linear(p["pwconv2"], x)
    return residual + t(p["gamma"]) * x


def t_vocos_decode(params, cfg, mel):
    x = t_conv1d(params["embed"], mel, padding=3)
    x = t_layer_norm(x, params["norm"])
    for bp in params["convnext"]:
        x = t_vocos_convnext(bp, x)
    x = t_layer_norm(x, params["final_layer_norm"])
    x = t_linear(params["head"], x)
    mag, phase = x.chunk(2, dim=-1)
    mag = torch.exp(mag).clamp(max=1e2)
    spec = torch.complex(mag * phase.cos(), mag * phase.sin())
    window = torch.hann_window(cfg.n_fft, periodic=True)
    return torch.istft(
        spec.transpose(1, 2), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.n_fft, window=window, center=True,
    )


def test_vocos_matches_torch_golden():
    params = init_vocos(jax.random.key(7), VOCOS_CFG)
    mel = 0.3 * jax.random.normal(jax.random.key(8), (2, 24, VOCOS_CFG.input_channels))
    ours = np.asarray(vocos_decode(params, VOCOS_CFG, mel))
    golden = t_vocos_decode(params, VOCOS_CFG, t(mel)).numpy()
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-3)
