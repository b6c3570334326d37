"""Ablation profile of one CFG-batched flow step on the real TPU.

Times the full DiT forward at serving shape (CFG batch 2, n=1024 frames,
bf16) and ablations that null out one component at a time, so the per-
component cost = full - ablated. Guides kernel work (docs/PERFORMANCE.md
roofline section).

Run alone on the chip:  python tools/profile_step.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.config import F5TTS_V1_BASE
from f5_tts_tpu.models import blocks as B
from f5_tts_tpu.models.dit import init_dit
from f5_tts_tpu.models.rope import rotary_freqs
from f5_tts_tpu.utils.modules import layer_norm, linear
from f5_tts_tpu.utils.profiling import device_sync

BATCH = 2  # CFG pair
N = 1024
REPS = 20


def timed(fn, *args) -> float:
    out = fn(*args)
    device_sync(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def build(cfg, skip: str | None):
    """dit_forward_precomputed clone with one component nulled out."""

    def block(p, x, t, mask, freqs):
        if skip != "adaln":
            norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = B.adaln_zero(p["attn_norm"], x, t)
        else:
            norm = x
            gate_msa = shift_mlp = scale_mlp = gate_mlp = jnp.zeros(
                (x.shape[0], x.shape[-1]), x.dtype
            )
        if skip != "attention":
            attn_out = B.attention(
                p["attn"], norm, cfg.heads, mask=mask, rope_freqs=freqs,
                use_flash=cfg.use_flash_attention,
            )
        else:
            attn_out = norm
        x = x + gate_msa[:, None] * attn_out
        if skip != "adaln":
            norm = layer_norm(x, None, eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        else:
            norm = x
        if skip != "ff":
            ff = B.feed_forward(p["ff"], norm)
        else:
            ff = norm
        return x + gate_mlp[:, None] * ff

    @jax.jit
    def fwd(params, x, cond, text_embed, time_v, mask):
        dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dtype)
        cond = cond.astype(dtype)
        t = B.timestep_embedding(params["time_embed"], time_v, dtype=dtype)
        if skip != "input_embed":
            x = B.input_embedding(params["input_embed"], x, cond, text_embed)
        else:
            x = jnp.concatenate([x, cond, text_embed], axis=-1) @ jnp.zeros(
                (2 * cfg.mel_dim + cfg.text_dim, cfg.dim), dtype
            )
        raw = rotary_freqs(x.shape[1], cfg.dim_head)
        freqs = (jnp.cos(raw), jnp.sin(raw))

        def body(h, bp):
            return block(bp, h, t, mask, freqs), None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = B.adaln_zero_final(params["norm_out"], x, t)
        return linear(params["proj_out"], x).astype(jnp.float32)

    return fwd


def main() -> None:
    cfg = F5TTS_V1_BASE.replace(compute_dtype="bfloat16")
    params = init_dit(jax.random.key(0), cfg)

    x = jax.random.normal(jax.random.key(1), (BATCH, N, cfg.mel_dim))
    cond = jax.random.normal(jax.random.key(2), (BATCH, N, cfg.mel_dim))
    text_embed = jax.random.normal(jax.random.key(3), (BATCH, N, cfg.text_dim), jnp.bfloat16)
    time_v = jnp.full((BATCH,), 0.5)
    mask = jnp.ones((BATCH, N), bool)

    # cast once like the sampler does
    cast = jax.jit(lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t))
    params = cast(params)
    device_sync(jax.tree.leaves(params)[0])

    full = timed(build(cfg, None), params, x, cond, text_embed, time_v, mask)
    print(f"full step:        {full:7.3f} ms")
    for skip in ("attention", "ff", "adaln", "input_embed"):
        t = timed(build(cfg, skip), params, x, cond, text_embed, time_v, mask)
        print(f"minus {skip:<12} {t:7.3f} ms  -> component ~{full - t:6.3f} ms")

    # attention microbench: the 22-layer aggregate in isolation
    from f5_tts_tpu.ops.flash_attention import flash_attention

    h, d = cfg.heads, cfg.dim_head
    q = jax.random.normal(jax.random.key(5), (BATCH, h, N, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(6), (BATCH, h, N, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(7), (BATCH, h, N, d), jnp.bfloat16)

    @jax.jit
    def attn22(q, k, v):
        def body(c, _):
            return flash_attention(q + c * 0, k, v, 1.0 / np.sqrt(d), None), None

        o, _ = jax.lax.scan(body, q, jnp.arange(22))
        return o

    t = timed(attn22, q, k, v)
    print(f"flash attention x22 (SDPA only): {t:7.3f} ms")


if __name__ == "__main__":
    main()
