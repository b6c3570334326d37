"""Diffusion Transformer backbone.

Behavioral parity with reference: dit.py:331-401, re-architected TPU-first:
the depth dimension is a stacked parameter pytree driven by `lax.scan`, so XLA
compiles ONE block body instead of unrolling 22 copies (faster compiles, same
math), and all compute can run in bfloat16 with float32 outputs for the ODE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f5_tts_tpu.config import DiTConfig
from f5_tts_tpu.models import blocks as B
from f5_tts_tpu.models.rope import rotary_freqs
from f5_tts_tpu.utils.modules import Params, linear, linear_init


def stack_block_params(block_list: list[Params]) -> Params:
    """Stack per-layer param dicts into a single pytree with a leading depth
    axis, ready for lax.scan."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *block_list)


def init_dit(key: jax.Array, cfg: DiTConfig) -> Params:
    """Initialize the full DiT parameter tree (reference: dit.py:331-372)."""
    keys = jax.random.split(key, cfg.depth + 5)
    block_list = [
        B.dit_block_init(keys[i], cfg.dim, cfg.heads, cfg.dim_head, cfg.ff_mult)
        for i in range(cfg.depth)
    ]
    return {
        "time_embed": B.timestep_embedding_init(keys[-5], cfg.dim),
        "text_embed": B.text_embedding_init(
            keys[-4],
            cfg.text_num_embeds,
            cfg.text_dim,
            conv_layers=cfg.conv_layers,
            conv_mult=cfg.conv_mult,
            max_pos=cfg.max_pos,
        ),
        "input_embed": B.input_embedding_init(keys[-3], cfg.mel_dim, cfg.text_dim, cfg.dim),
        "blocks": stack_block_params(block_list),
        "norm_out": B.adaln_zero_final_init(keys[-2], cfg.dim),
        "proj_out": linear_init(keys[-1], cfg.dim, cfg.mel_dim),
    }


def dit_text_embed(
    params: Params,
    cfg: DiTConfig,
    text: jax.Array,  # [b, nt] int ids padded with -1
    seq_len: int,
    drop_text=False,  # bool | [b] bool
) -> jax.Array:
    """Text branch only -> [b, seq_len, text_dim].

    Split out because it is constant across ODE steps: the sampler computes it
    ONCE and reuses it for all flow evaluations (the reference recomputes the
    4-block ConvNeXt text encoder inside every transformer call,
    dit.py:390) — worth ~1.5 ms/step at base config."""
    dtype = jnp.dtype(cfg.compute_dtype)
    return B.text_embedding(
        params["text_embed"],
        text,
        seq_len,
        drop_text=drop_text,
        mask_padding=cfg.text_mask_padding,
        max_pos=cfg.max_pos,
        dtype=dtype,
    )


def dit_time_mods(params: Params, cfg: DiTConfig, times: jax.Array) -> dict:
    """Precompute the time-conditioning schedule for a batch of flow times.

    `times` [m] -> {"blocks": [m, depth, 1, 6*dim], "final": [m, 1, 2*dim]}.

    Everything the DiT derives from the timestep — the sinusoidal MLP
    embedding (reference: dit.py:73-82) and every layer's AdaLN-Zero
    modulation (dit.py:259-290) — depends only on t, and the ODE sampler's
    evaluation times are known up front. Computing the whole schedule as a
    few batched matmuls BEFORE the step scan removes ~138M params of AdaLN
    weight reads per ODE step (the in-scan alternative is 22 m=2 matmuls that
    run at HBM weight-read speed, ~0.3 ms of serial time per step at base
    config). The leading-1 axis broadcasts over the (CFG-doubled) batch,
    which always shares the step's scalar time during sampling.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    t_emb = B.timestep_embedding(params["time_embed"], times, dtype=dtype)  # [m, dim]
    block_mods = jax.vmap(lambda bp: B.adaln_mods(bp, t_emb))(
        params["blocks"]["attn_norm"]
    )  # [depth, m, 6*dim]
    return {
        "blocks": jnp.transpose(block_mods, (1, 0, 2))[:, :, None, :],
        "final": B.adaln_mods(params["norm_out"], t_emb)[:, None, :],
    }


def dit_forward_precomputed(
    params: Params,
    cfg: DiTConfig,
    x: jax.Array,  # [b, n, mel] noised input audio
    cond: jax.Array,  # [b, n, mel] masked cond audio
    text_embed: jax.Array,  # [b, n, text_dim] from dit_text_embed
    time: jax.Array,  # [b] or scalar in [0, 1]
    drop_audio_cond=False,  # bool | [b] bool — per-sample flags enable batched CFG
    mask: jax.Array | None = None,  # [b, n] bool padding mask
    dropout_key: jax.Array | None = None,  # training-only; None = deterministic
    time_mods: dict | None = None,  # one dit_time_mods slice: {"blocks": [depth, 1, 6*dim], "final": [1, 2*dim]}
) -> jax.Array:
    """Backbone forward with a precomputed text embedding -> [b, n, mel]
    float32 flow prediction (reference: dit.py:374-401).

    `time_mods` (sampling hot path) supplies this evaluation time's
    precomputed AdaLN modulations — see dit_time_mods; `time` is then unused.
    Mutually exclusive with dropout (the sampler never trains)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    batch = x.shape[0]

    x = x.astype(dtype)
    cond = cond.astype(dtype)

    if time_mods is None:
        time = jnp.asarray(time)
        if time.ndim == 0:
            time = jnp.broadcast_to(time, (batch,))
        t = B.timestep_embedding(params["time_embed"], time, dtype=dtype)
    else:
        t = None
    x = B.input_embedding(params["input_embed"], x, cond, text_embed, drop_audio_cond=drop_audio_cond)

    raw = rotary_freqs(x.shape[1], cfg.dim_head)
    freqs = (jnp.cos(raw), jnp.sin(raw))  # once per forward, not per layer

    use_dropout = dropout_key is not None and cfg.dropout > 0.0

    def block_fn(h, block_p, layer_key, mod=None):
        return B.dit_block(
            block_p, h, t, cfg.heads, mask=mask, rope_freqs=freqs,
            use_flash=cfg.use_flash_attention,
            dropout_rate=cfg.dropout,
            dropout_key=layer_key if use_dropout else None,
            mod=mod,
        )

    if cfg.remat:
        block_fn = jax.checkpoint(block_fn)

    if time_mods is not None:

        def body(h, xs):
            block_p, mod = xs
            return block_fn(h, block_p, None, mod), None

        x, _ = jax.lax.scan(body, x, (params["blocks"], time_mods["blocks"]))
    elif use_dropout:
        layer_keys = jax.random.split(dropout_key, cfg.depth)

        def body(h, xs):
            block_p, layer_key = xs
            return block_fn(h, block_p, layer_key), None

        x, _ = jax.lax.scan(body, x, (params["blocks"], layer_keys))
    else:

        def body(h, block_p):
            return block_fn(h, block_p, None), None

        x, _ = jax.lax.scan(body, x, params["blocks"])

    x = B.adaln_zero_final(
        params["norm_out"], x, t,
        mod=None if time_mods is None else time_mods["final"],
    )
    out = linear(params["proj_out"], x)
    return out.astype(jnp.float32)


def dit_forward(
    params: Params,
    cfg: DiTConfig,
    x: jax.Array,
    cond: jax.Array,
    text: jax.Array,
    time: jax.Array,
    drop_audio_cond=False,
    drop_text=False,
    mask: jax.Array | None = None,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    """Full backbone forward (text ids in) -> [b, n, mel] float32
    (reference: dit.py:374-401)."""
    text_embed = dit_text_embed(params, cfg, text, x.shape[1], drop_text=drop_text)
    return dit_forward_precomputed(
        params, cfg, x, cond, text_embed, time, drop_audio_cond=drop_audio_cond,
        mask=mask, dropout_key=dropout_key,
    )
