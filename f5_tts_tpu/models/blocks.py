"""Neural network blocks for the DiT backbone and duration predictor.

Pure functions over param pytrees. Behavioral parity with reference: dit.py
(blocks) and convnext_v2.py; re-designed as stateless functions so the DiT
backbone can stack per-layer params and run the depth dimension under
`lax.scan` (one compiled block body instead of 22 unrolled copies).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from f5_tts_tpu.ops.attention import scaled_dot_product_attention
from f5_tts_tpu.utils.modules import (
    Params,
    conv1d,
    conv1d_init,
    embedding,
    embedding_init,
    gelu,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mish,
)
from f5_tts_tpu.models.rope import (
    apply_rotary_pos_emb,
    get_pos_embed_indices,
    precompute_freqs_cis,
)


def dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Inverted dropout (reference: nn.Dropout at dit.py:96,125). Callers pass
    a key only in training; inference paths never take this branch."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _as_batch_flag(flag, batch: int) -> jax.Array:
    """Normalize a drop flag (python bool, scalar, or [b] array) to bool [b].

    Per-sample flags are what make batched CFG possible: the conditional and
    unconditional streams run as one 2B-batch forward (the reference instead
    calls the transformer twice, cfm.py:342-363).
    """
    flag = jnp.asarray(flag)
    if flag.ndim == 0:
        flag = jnp.broadcast_to(flag, (batch,))
    return flag.astype(bool)


# ------------------------------------------------------------ timestep embed


def timestep_embedding_init(key, dim: int, freq_embed_dim: int = 256) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "mlp1": linear_init(k1, freq_embed_dim, dim),
        "mlp2": linear_init(k2, dim, dim),
    }


def sinus_position_embedding(x: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """Sinusoidal embedding, [sin|cos] concat (reference: dit.py:56-67)."""
    half_dim = dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = scale * x.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def timestep_embedding(p: Params, timestep: jax.Array, freq_embed_dim: int = 256, dtype=jnp.float32) -> jax.Array:
    """t [b] -> [b, dim] (reference: dit.py:73-82)."""
    h = sinus_position_embedding(timestep, freq_embed_dim).astype(dtype)
    return linear(p["mlp2"], jax.nn.silu(linear(p["mlp1"], h)))


# ------------------------------------------------------------ conv pos embed


def conv_position_embedding_init(key, dim: int, kernel_size: int = 31, groups: int = 16) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, dim, dim, kernel_size, groups=groups),
        "conv2": conv1d_init(k2, dim, dim, kernel_size, groups=groups),
    }


def conv_position_embedding(
    p: Params, x: jax.Array, mask: jax.Array | None = None, groups: int = 16
) -> jax.Array:
    """Two grouped conv1d + Mish, mask-aware (reference: dit.py:29-50)."""
    if mask is not None:
        x = x * mask[..., None]
    out = mish(conv1d(p["conv1"], x, groups=groups))
    out = mish(conv1d(p["conv2"], out, groups=groups))
    if mask is not None:
        out = out * mask[..., None]
    return out


# ------------------------------------------------------------ ConvNeXt V2


def convnext_v2_block_init(key, dim: int, intermediate_dim: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": conv1d_init(k1, dim, dim, 7, groups=dim),
        "norm": layer_norm_init(dim),
        "pwconv1": linear_init(k2, dim, intermediate_dim),
        "grn": {"gamma": jnp.zeros((1, 1, intermediate_dim)), "beta": jnp.zeros((1, 1, intermediate_dim))},
        "pwconv2": linear_init(k3, intermediate_dim, dim),
    }


def grn(p: Params, x: jax.Array) -> jax.Array:
    """Global response normalization over the sequence axis
    (reference: convnext_v2.py:9-18)."""
    gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True))
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    nx = nx.astype(x.dtype)
    return p["gamma"].astype(x.dtype) * (x * nx) + p["beta"].astype(x.dtype) + x


def convnext_v2_block(p: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    """dwconv k7 -> LN -> pwconv -> GELU -> GRN -> pwconv -> residual
    (reference: convnext_v2.py:24-54)."""
    dim = x.shape[-1]
    residual = x
    padding = (dilation * (7 - 1)) // 2
    x = conv1d(p["dwconv"], x, groups=dim, padding=padding, dilation=dilation)
    x = layer_norm(x, p["norm"], eps=1e-6)
    x = linear(p["pwconv1"], x)
    x = gelu(x, approximate=False)
    x = grn(p["grn"], x)
    x = linear(p["pwconv2"], x)
    return residual + x


# ------------------------------------------------------------ text embedding


from functools import lru_cache


@lru_cache(maxsize=None)
def _freqs_cis_table(text_dim: int, max_pos: int):
    return precompute_freqs_cis(text_dim, max_pos)


def text_embedding_init(
    key,
    text_num_embeds: int,
    text_dim: int,
    conv_layers: int = 0,
    conv_mult: int = 2,
    max_pos: int = 4096,
) -> Params:
    keys = jax.random.split(key, conv_layers + 1)
    p: Params = {"embed": embedding_init(keys[0], text_num_embeds + 1, text_dim)}
    if conv_layers > 0:
        p["blocks"] = [
            convnext_v2_block_init(keys[i + 1], text_dim, text_dim * conv_mult)
            for i in range(conv_layers)
        ]
    return p


def text_embedding(
    p: Params,
    text: jax.Array,  # [b, nt] int ids, padded with -1
    seq_len: int,
    drop_text=False,
    mask_padding: bool = True,
    max_pos: int = 4096,
    dtype=jnp.float32,
) -> jax.Array:
    """Text ids -> [b, seq_len, text_dim] (reference: dit.py:181-229).

    Semantics preserved exactly: +1 shift so -1 padding becomes filler token 0,
    truncate/pad to the mel sequence length, CFG text drop zeroes the *shifted
    ids* (so dropped text embeds the filler token), absolute positions from the
    precomputed table, ConvNeXt blocks with padding re-zeroed after each block.
    """
    batch, text_len = text.shape
    text = text + 1
    text = text[:, :seq_len]
    if seq_len > text_len:
        text = jnp.pad(text, ((0, 0), (0, seq_len - text_len)), constant_values=0)

    text_mask = (text == 0)[..., None]  # [b, n, 1]; True = filler/padding

    drop = _as_batch_flag(drop_text, batch)
    text = jnp.where(drop[:, None], jnp.zeros_like(text), text)
    x = embedding(p["embed"], text, dtype=dtype)

    if "blocks" in p:
        # absolute sin/cos table (reference: dit.py:190-191): a pure function
        # of (text_dim, max_pos), kept OUT of the param tree — the reference's
        # `_freqs_cis` underscore naming makes it non-trainable in MLX, and a
        # param-tree leaf here would get trained/weight-decayed by optax
        table = _freqs_cis_table(x.shape[-1], max_pos)
        batch_start = jnp.zeros((batch,), dtype=jnp.int32)
        pos_idx = get_pos_embed_indices(batch_start, seq_len, max_pos=max_pos)
        x = x + jnp.asarray(table).astype(dtype)[pos_idx]

        if mask_padding:
            x = jnp.where(text_mask, 0.0, x)
            for block_p in p["blocks"]:
                x = convnext_v2_block(block_p, x)
                x = jnp.where(text_mask, 0.0, x)
        else:
            for block_p in p["blocks"]:
                x = convnext_v2_block(block_p, x)
    return x


# ------------------------------------------------------------ input embedding


def input_embedding_init(key, mel_dim: int, text_dim: int, out_dim: int) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "proj": linear_init(k1, mel_dim * 2 + text_dim, out_dim),
        "conv_pos_embed": conv_position_embedding_init(k2, out_dim),
    }


def input_embedding(
    p: Params,
    x: jax.Array,  # [b, n, mel]
    cond: jax.Array,  # [b, n, mel]
    text_embed: jax.Array,  # [b, n, text_dim]
    drop_audio_cond=False,
) -> jax.Array:
    """concat -> proj -> conv pos embed residual (reference: dit.py:235-252)."""
    batch = x.shape[0]
    drop = _as_batch_flag(drop_audio_cond, batch)
    cond = jnp.where(drop[:, None, None], jnp.zeros_like(cond), cond)
    x = linear(p["proj"], jnp.concatenate([x, cond, text_embed], axis=-1))
    return conv_position_embedding(p["conv_pos_embed"], x) + x


# ------------------------------------------------------------ attention


def attention_init(key, dim: int, heads: int, dim_head: int) -> Params:
    inner = heads * dim_head
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "to_q": linear_init(k1, dim, inner),
        "to_k": linear_init(k2, dim, inner),
        "to_v": linear_init(k3, dim, inner),
        "to_out": linear_init(k4, inner, dim),
    }


def attention(
    p: Params,
    x: jax.Array,  # [b, n, dim]
    heads: int,
    mask: jax.Array | None = None,  # [b, n] bool padding mask
    rope_freqs: jax.Array | None = None,  # [n, dim_head]
    use_flash: bool = True,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """Non-causal MHA with RoPE and key-padding mask (reference: dit.py:105-175).

    Matches the reference's semantics: scale 1/sqrt(dim_head), mask broadcast
    over queries (keys masked only), output-proj dropout (dit.py:125), output
    rows re-zeroed by the mask.
    """
    b, n, _ = x.shape
    q = linear(p["to_q"], x).reshape(b, n, heads, -1).transpose(0, 2, 1, 3)
    k = linear(p["to_k"], x).reshape(b, n, heads, -1).transpose(0, 2, 1, 3)
    v = linear(p["to_v"], x).reshape(b, n, heads, -1).transpose(0, 2, 1, 3)

    rope = None
    if rope_freqs is not None:
        if isinstance(rope_freqs, tuple):
            cos, sin = rope_freqs
        else:
            cos, sin = jnp.cos(rope_freqs), jnp.sin(rope_freqs)
        # Full-head rotation on the flash path is applied INSIDE the kernel
        # (same math, two fewer HBM round-trips per layer — ~44% faster per
        # attention layer at base config, docs/PERFORMANCE.md); partial
        # rotation or non-kernel backends rotate here with XLA ops.
        fused = False
        if use_flash and cos.shape[-1] == q.shape[-1]:
            # mirror ops/attention.py: a failed pallas import degrades to the
            # XLA path instead of raising (flash_attention imports
            # jax.experimental.pallas at module level)
            try:
                from f5_tts_tpu.ops.flash_attention import flash_supported
            except ImportError:
                fused = False
            else:
                fused = flash_supported(q)
        if fused:
            rope = (cos[-n:, :], sin[-n:, :])
        else:
            q = apply_rotary_pos_emb(q, (cos, sin))
            k = apply_rotary_pos_emb(k, (cos, sin))

    scale = 1.0 / math.sqrt(q.shape[-1])
    out = scaled_dot_product_attention(
        q, k, v, scale, key_mask=mask, use_flash=use_flash, rope=rope
    )
    out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
    out = linear(p["to_out"], out)
    if dropout_key is not None and dropout_rate > 0.0:
        out = dropout(out, dropout_rate, dropout_key)
    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)
    return out


# ------------------------------------------------------------ feed forward


def feed_forward_init(key, dim: int, mult: int = 4, dim_out: int | None = None) -> Params:
    inner = int(dim * mult)
    dim_out = dim if dim_out is None else dim_out
    k1, k2 = jax.random.split(key)
    return {"w1": linear_init(k1, dim, inner), "w2": linear_init(k2, inner, dim_out)}


def feed_forward(
    p: Params,
    x: jax.Array,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """Linear -> GELU(tanh) -> Dropout -> Linear (reference: dit.py:88-99)."""
    h = gelu(linear(p["w1"], x), approximate=True)
    if dropout_key is not None and dropout_rate > 0.0:
        h = dropout(h, dropout_rate, dropout_key)
    return linear(p["w2"], h)


# ------------------------------------------------------------ AdaLN-Zero


def adaln_zero_init(key, dim: int) -> Params:
    return {"linear": linear_init(key, dim, dim * 6)}


def adaln_mods(p: Params, emb: jax.Array) -> jax.Array:
    """time-emb -> SiLU -> Linear(k*dim) modulation vector (reference:
    dit.py:259-271,278-290). Split out from adaln_zero[_final] so the ODE
    sampler can precompute the modulations for its whole (known) time grid
    in one batched matmul instead of 22 m=2 matmuls per step — those run at
    weight-read bandwidth (~0.3 ms/step of serial time at base config)."""
    return linear(p["linear"], jax.nn.silu(emb))


def adaln_zero(p: Params, x: jax.Array, emb: jax.Array | None, mod: jax.Array | None = None):
    """time-emb -> SiLU -> Linear(6*dim) -> (modulated x, gates/shifts)
    (reference: dit.py:259-271). Split order: shift_msa, scale_msa, gate_msa,
    shift_mlp, scale_mlp, gate_mlp. `mod` supplies a precomputed modulation
    vector [b or 1, 6*dim] (see adaln_mods), identical math.
    """
    if mod is None:
        mod = adaln_mods(p, emb)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    x = layer_norm(x, None, eps=1e-6) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


def adaln_zero_final_init(key, dim: int) -> Params:
    return {"linear": linear_init(key, dim, dim * 2)}


def adaln_zero_final(
    p: Params, x: jax.Array, emb: jax.Array | None, mod: jax.Array | None = None
) -> jax.Array:
    """Final modulation: scale/shift only; split order scale, shift
    (reference: dit.py:278-290)."""
    if mod is None:
        mod = adaln_mods(p, emb)
    scale, shift = jnp.split(mod, 2, axis=-1)
    return layer_norm(x, None, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]


# ------------------------------------------------------------ DiT block


def dit_block_init(key, dim: int, heads: int, dim_head: int, ff_mult: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn_norm": adaln_zero_init(k1, dim),
        "attn": attention_init(k2, dim, heads, dim_head),
        "ff": feed_forward_init(k3, dim, mult=ff_mult),
    }


def dit_block(
    p: Params,
    x: jax.Array,
    t: jax.Array | None,  # [b, dim] time embedding (None when mod is given)
    heads: int,
    mask: jax.Array | None = None,
    rope_freqs: jax.Array | None = None,
    use_flash: bool = True,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    mod: jax.Array | None = None,  # precomputed adaln_mods output [b or 1, 6*dim]
) -> jax.Array:
    """AdaLN-Zero -> attention -> gated residual -> modulated FF -> gated
    residual (reference: dit.py:296-325)."""
    if dropout_key is not None:
        k_attn, k_ff = jax.random.split(dropout_key)
    else:
        k_attn = k_ff = None
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = adaln_zero(p["attn_norm"], x, t, mod=mod)
    attn_out = attention(
        p["attn"], norm, heads, mask=mask, rope_freqs=rope_freqs, use_flash=use_flash,
        dropout_rate=dropout_rate, dropout_key=k_attn,
    )
    x = x + gate_msa[:, None] * attn_out
    norm = layer_norm(x, None, eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    x = x + gate_mlp[:, None] * feed_forward(p["ff"], norm, dropout_rate=dropout_rate, dropout_key=k_ff)
    return x
