"""Probe: int8 MXU throughput vs bf16, and the W8A8 end-to-end matmul cost
(quantize-activations + int8 dot + rescale) at the DiT's hot shapes.

Methodology per docs/PERFORMANCE.md: every probe is a `lax.scan` of ITERS
serialized iterations inside ONE jit (single-call timings are dispatch-bound
~30 ms behind the axon tunnel); per-iteration time = (total - empty-scan
baseline) / ITERS.

Run alone on the chip: python tools/int8_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.utils.profiling import device_sync

ITERS = 512
REPS = 8


def bench_scan(body, init, baseline_ms: float = 0.0) -> float:
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
    return (best * 1e3 - baseline_ms) / ITERS


def baseline() -> float:
    return bench_scan(lambda c: c + 1.0, jnp.zeros((8, 128), jnp.float32)) * ITERS


def main():
    rng = np.random.default_rng(0)
    base_ms = baseline()
    print(f"empty-scan baseline: {base_ms:.2f} ms")

    for (m, k, n) in [(2048, 1024, 1024), (2048, 1024, 2048), (2048, 2048, 1024),
                      (2048, 1024, 3072)]:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        sw = jnp.asarray(rng.standard_normal((n,)) ** 2 + 0.1, jnp.float32)

        def body_bf16(c):
            y = jax.lax.dot(c, w, preferred_element_type=jnp.float32)
            # depend on EVERY output element through a NON-factorable
            # reduction: a [:, :1] slice lets XLA shrink the dot to one
            # column, and sum(dot) refactors to a matvec — max() does neither
            return c + (y.max(axis=-1, keepdims=True) * 1e-9).astype(c.dtype)

        def body_i8(c):
            y = jax.lax.dot(c, wq, preferred_element_type=jnp.int32)
            return c ^ (y.max(axis=-1, keepdims=True) & 1).astype(jnp.int8)

        def body_w8a8(c):
            cf = c.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1, keepdims=True), 1e-8) / 127.0
            q = jnp.clip(jnp.round(cf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot(q, wq, preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (sx * sw[None, :])
            return c + (y.max(axis=-1, keepdims=True) * 1e-9).astype(c.dtype)

        t_bf = bench_scan(body_bf16, x, base_ms)
        t_i8 = bench_scan(body_i8, xq, base_ms)
        t_w8 = bench_scan(body_w8a8, x, base_ms)
        fl = 2 * m * k * n
        print(f"[{m},{k}]x[{k},{n}]  bf16 {t_bf:6.3f} ms ({fl/t_bf/1e9:6.1f} TF/s)"
              f"  int8 {t_i8:6.3f} ms ({fl/t_i8/1e9:6.1f} TOP/s)"
              f"  w8a8-e2e {t_w8:6.3f} ms  speedup {t_bf/t_w8:4.2f}x")

    # CFG-resident lever: concatenate([x, x]) cost per flow evaluation
    b, nfr, d = 1, 1024, 100
    x0 = jnp.asarray(rng.standard_normal((b, nfr, d)), jnp.float32)

    def body_cat(c):
        x2 = jnp.concatenate([c, c])
        y2 = x2 * 1.0001 + 0.001  # stand-in for the (already-timed) DiT call
        pred, null = y2[:b], y2[b:]
        return pred + (pred - null) * 2.0

    def body_nocat(c):
        y = c * 1.0001 + 0.001
        return y + (y - y * 0.999) * 2.0

    t_cat = bench_scan(body_cat, x0, base_ms)
    t_no = bench_scan(body_nocat, x0, base_ms)
    print(f"concat([x,x]) {b}x{nfr}x{d}: {max(t_cat - t_no, 0)*1e3:.1f} us/eval "
          f"(cat {t_cat*1e3:.1f} us, nocat {t_no*1e3:.1f} us; "
          f"x32 steps = {max(t_cat - t_no, 0)*32:.3f} ms per request)")


if __name__ == "__main__":
    main()
