"""Amortized TPU probes for the round-2 fusion work (VERDICT item 5).

Every call through the axon tunnel pays a fixed ~30 ms dispatch+sync cost,
so single-call timings are meaningless.  Each candidate here is wrapped in a
`lax.scan` of ITERS serialized iterations inside ONE jit; the per-iteration
time is (total - empty_scan_baseline) / ITERS.

Run alone on the chip:  python tools/fusion_probe.py [attn|layer|conv|adaln]
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from f5_tts_tpu.utils.profiling import device_sync

B, H, N, D = 2, 16, 1024, 64
DIM = H * D
SCALE = 1.0 / math.sqrt(D)
ITERS = 64
REPS = 8


def bench_scan(body, init, label: str, baseline_ms: float = 0.0) -> float:
    """Time ITERS serialized iterations of body inside one jit."""

    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None

        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    out = run(init)
    device_sync(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(init)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    per_iter = (best * 1e3 - baseline_ms) / ITERS
    print(f"{label:42} {per_iter:7.3f} ms/iter   (total {best*1e3:7.1f} ms)")
    return per_iter


def measure_baseline() -> float:
    @jax.jit
    def run(x):
        def step(c, _):
            return c + 1.0, None

        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    x = jnp.zeros((8, 128), jnp.float32)
    out = run(x)
    device_sync(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(x)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{'empty scan baseline':42} total {best*1e3:7.1f} ms")
    return best * 1e3


# --------------------------------------------------------------- variants


def rope_tables(n: int, d: int):
    from f5_tts_tpu.models.rope import rotary_freqs

    raw = rotary_freqs(n, d)
    return jnp.cos(raw), jnp.sin(raw)


def perm_matrix(d: int) -> np.ndarray:
    """P such that x @ P == rotate_half(x) for the interleaved-pair layout."""
    P = np.zeros((d, d), np.float32)
    for j in range(0, d, 2):
        P[j + 1, j] = -1.0
        P[j, j + 1] = 1.0
    return P


def _kernel_nhd(q_ref, k_ref, v_ref, cos_ref, sin_ref, p_ref, o_ref, *, scale):
    """q/k/v blocks come in [b=1, BQ, h=1, d] layout; RoPE fused in-kernel."""
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    cos = cos_ref[...].astype(q.dtype)
    sin = sin_ref[...].astype(q.dtype)
    P = p_ref[...].astype(q.dtype)
    qr = (q * cos + jax.lax.dot(q, P, preferred_element_type=jnp.float32).astype(q.dtype) * sin)
    kr = (k * cos + jax.lax.dot(k, P, preferred_element_type=jnp.float32).astype(k.dtype) * sin)
    s = jax.lax.dot_general(
        qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, :, 0, :] = (o / denom).astype(o_ref.dtype)


def flash_nhd(q, k, v, cos, sin, P, scale):
    b, n, h, d = q.shape
    grid = (b, h)
    qspec = pl.BlockSpec((1, n, 1, d), lambda bi, hi: (bi, 0, hi, 0))
    tab = pl.BlockSpec((n, d), lambda bi, hi: (0, 0))
    pm = pl.BlockSpec((d, d), lambda bi, hi: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_nhd, scale=scale),
        grid=grid,
        in_specs=[qspec, qspec, qspec, tab, tab, pm],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, cos, sin, P)


def _kernel_bhnd_rope(q_ref, k_ref, v_ref, cos_ref, sin_ref, p_ref, o_ref, *, scale):
    """Standard [b,h,n,d] blocks with RoPE fused in-kernel."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    cos = cos_ref[...].astype(q.dtype)
    sin = sin_ref[...].astype(q.dtype)
    P = p_ref[...].astype(q.dtype)
    qr = (q * cos + jax.lax.dot(q, P, preferred_element_type=jnp.float32).astype(q.dtype) * sin)
    kr = (k * cos + jax.lax.dot(k, P, preferred_element_type=jnp.float32).astype(k.dtype) * sin)
    s = jax.lax.dot_general(
        qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


def flash_bhnd_rope(q, k, v, cos, sin, P, scale):
    b, h, n, d = q.shape
    grid = (b, h)
    spec = pl.BlockSpec((1, 1, n, d), lambda bi, hi: (bi, hi, 0, 0))
    tab = pl.BlockSpec((n, d), lambda bi, hi: (0, 0))
    pm = pl.BlockSpec((d, d), lambda bi, hi: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_bhnd_rope, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec, tab, tab, pm],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, cos, sin, P)


def probe_attn():
    from f5_tts_tpu.ops.flash_attention import flash_attention

    base = measure_baseline()
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    cos, sin = rope_tables(N, D)
    P = jnp.asarray(perm_matrix(D))

    bench_scan(lambda c: flash_attention(c, k, v, SCALE, None), q,
               "flash current (kernel only)", base)

    def xla(c):
        s = jnp.einsum("bhqd,bhkd->bhqk", c, k, preferred_element_type=jnp.float32) * SCALE
        p = jax.nn.softmax(s, axis=-1).astype(c.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    bench_scan(xla, q, "xla unfused (kernel only)", base)
    bench_scan(lambda c: flash_bhnd_rope(c, k, v, cos, sin, P, SCALE), q,
               "flash bhnd + in-kernel rope", base)


    # numerical check of the P-matmul rope vs the reference apply
    from f5_tts_tpu.models.rope import apply_rotary_pos_emb

    ref = apply_rotary_pos_emb(q.astype(jnp.float32), (cos, sin))
    got = q.astype(jnp.float32) * cos + (q.astype(jnp.float32) @ jnp.asarray(perm_matrix(D))) * sin
    print("rope-as-matmul maxerr:", float(jnp.abs(ref - got).max()))


def probe_layer():
    """Full attention layer: projections + rope + sdpa + out proj."""
    from f5_tts_tpu.models import blocks as Bk
    from f5_tts_tpu.ops.flash_attention import flash_attention

    base = measure_baseline()
    key = jax.random.key(0)
    p = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        Bk.attention_init(key, DIM, H, D),
    )
    x = jax.random.normal(jax.random.key(1), (B, N, DIM), jnp.bfloat16)
    cos, sin = rope_tables(N, D)
    Pm = jnp.asarray(perm_matrix(D))

    from f5_tts_tpu.utils.modules import linear

    def current(c):
        return Bk.attention(p, c, H, mask=None, rope_freqs=(cos, sin), use_flash=True)

    bench_scan(current, x, "layer: current (transpose + rope outside)", base)

    def bhnd_ropek(c):
        q = linear(p["to_q"], c).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        k = linear(p["to_k"], c).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        v = linear(p["to_v"], c).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        o = flash_bhnd_rope(q, k, v, cos, sin, Pm, SCALE)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, DIM)
        return linear(p["to_out"], o)

    bench_scan(bhnd_ropek, x, "layer: transposes, rope in kernel", base)

    def xla_layer(c):
        return Bk.attention(p, c, H, mask=None, rope_freqs=(cos, sin), use_flash=False)

    bench_scan(xla_layer, x, "layer: xla sdpa", base)

    # parity check current vs in-kernel-rope variant
    a = current(x).astype(jnp.float32)
    b2 = bhnd_ropek(x).astype(jnp.float32)
    print("layer ropek maxerr vs current:", float(jnp.abs(a - b2).max()))


def probe_conv():
    from f5_tts_tpu.utils.modules import conv1d, conv1d_init, mish

    base = measure_baseline()
    G, K = 16, 31
    p = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        conv1d_init(jax.random.key(0), DIM, DIM, K, groups=G),
    )
    x = jax.random.normal(jax.random.key(1), (B, N, DIM), jnp.bfloat16)

    bench_scan(lambda c: conv1d(p, c, groups=G), x, "grouped conv (current, lax.conv g=16)", base)

    # groups folded into a vmapped dense conv over a leading axis
    w = p["kernel"]  # [K, in_per_group=64, out=DIM]
    wg = w.reshape(K, DIM // G, G, DIM // G)  # per-group out channels
    wg = jnp.transpose(wg, (2, 0, 1, 3))  # [G, K, in=64, out=64]
    bias = p.get("bias")

    def vmapped(c):
        xg = c.reshape(B, N, G, DIM // G).transpose(2, 0, 1, 3)  # [G, B, N, 64]

        def one(xs, ws):
            return jax.lax.conv_general_dilated(
                xs, ws, (1,), [(K // 2, K // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )

        yg = jax.vmap(one)(xg, wg)  # [G, B, N, 64]
        y = yg.transpose(1, 2, 0, 3).reshape(B, N, DIM)
        return y if bias is None else y + bias

    bench_scan(vmapped, x, "grouped conv as vmapped dense conv", base)

    # tap-sum matmul formulation: y = sum_k shift(x, k) @ Wk_blockdiag,
    # but per-group einsum keeps FLOPs exact: [B,N,G,64] x [G,64,64] per tap
    def tapsum(c):
        xg = c.reshape(B, N, G, DIM // G)
        y = jnp.zeros((B, N, G, DIM // G), c.dtype)
        pad = K // 2
        xp = jnp.pad(xg, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        for k in range(K):
            y = y + jnp.einsum("bngi,gio->bngo", xp[:, k : k + N], wg[:, k])
        y = y.reshape(B, N, DIM)
        return y if bias is None else y + bias

    bench_scan(tapsum, x, "grouped conv as 31-tap einsum sum", base)

    # parity
    a = conv1d(p, x, groups=G).astype(jnp.float32)
    for name, fn in [("vmapped", vmapped), ("tapsum", tapsum)]:
        err = float(jnp.abs(fn(x).astype(jnp.float32) - a).max())
        print(f"conv {name} maxerr: {err}")


def _ln_mod_kernel(x_ref, scale_ref, shift_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # [BQ, dim]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    s = scale_ref[0, 0].astype(jnp.float32)
    b = shift_ref[0, 0].astype(jnp.float32)
    o_ref[0] = (y * (1.0 + s) + b).astype(o_ref.dtype)


def ln_modulate_pallas(x, scale, shift, eps=1e-6, block=256):
    b, n, d = x.shape
    grid = (b, n // block)
    return pl.pallas_call(
        functools.partial(_ln_mod_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda bi, ni: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, scale[:, None, :], shift[:, None, :])


def probe_adaln():
    from f5_tts_tpu.utils.modules import layer_norm

    base = measure_baseline()
    x = jax.random.normal(jax.random.key(0), (B, N, DIM), jnp.bfloat16)
    scale = jax.random.normal(jax.random.key(1), (B, DIM), jnp.bfloat16)
    shift = jax.random.normal(jax.random.key(2), (B, DIM), jnp.bfloat16)

    def xla_chain(c):
        return layer_norm(c, None, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]

    bench_scan(xla_chain, x, "LN+modulate: xla chain", base)
    bench_scan(lambda c: ln_modulate_pallas(c, scale, shift), x,
               "LN+modulate: pallas fused", base)

    a = xla_chain(x).astype(jnp.float32)
    b2 = ln_modulate_pallas(x, scale, shift).astype(jnp.float32)
    print("ln_mod maxerr:", float(jnp.abs(a - b2).max()))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("attn", "all"):
        probe_attn()
    if which in ("layer", "all"):
        probe_layer()
    if which in ("conv", "all"):
        probe_conv()
    if which in ("adaln", "all"):
        probe_adaln()
