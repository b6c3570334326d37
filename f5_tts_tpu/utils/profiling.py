"""Profiling, timing, and compilation-cache utilities.

The reference's only observability is wall-clock prints (reference:
generate.py:169,186-189, trainer.py:102,118-119); this adds jax.profiler trace
capture, device-synchronized timers (block_until_ready is unreliable on some
tunneled backends — sync is a tiny host readback), and a persistent XLA
compilation cache so the 20-40 s first-compile cost is paid once per machine.
"""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path

import jax
import numpy as np

DEFAULT_CACHE_DIR = os.environ.get(
    "F5_TTS_COMPILE_CACHE", str(Path.home() / ".cache" / "f5_tts_tpu" / "xla_cache")
)


def enable_compilation_cache(cache_dir: str | None = None, force: bool = False) -> None:
    """Persist compiled executables across processes.

    No-op on the axon tunnel backend unless forced: cache round-trips there
    measured slower than recompilation (warm bench run 9m30s vs ~6m cold).
    Also a no-op when F5_TTS_COMPILE_CACHE=off — the test suite sets this
    (tests/conftest.py): tiny test models gain nothing from a persistent
    cache, and jax's threaded cache-write path has segfaulted under the
    suite's serve tests (compile in a batcher thread while HTTP threads
    run) — a kill switch beats a flaky suite.
    """
    if os.environ.get("F5_TTS_COMPILE_CACHE", "").lower() == "off":
        return
    if not force and jax.devices()[0].platform.lower() == "axon":
        return
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def host_map_count() -> int:
    """Number of memory mappings this process holds (`/proc/self/maps` rows;
    0 where procfs is unavailable).

    Why it matters: every XLA:CPU executable is ORC-JIT-loaded as ~3 anonymous
    mappings per codegen object (code/rodata/data; ~20+ mappings per
    real-model executable). The kernel caps a process at `vm.max_map_count`
    mappings (65530 default), and when mmap hits the cap it fails with ENOMEM
    even with hundreds of GB free — LLVM then reports "compilation error:
    Cannot allocate memory" and, depending on which allocation dies, XLA
    deadlocks or segfaults in `backend_compile_and_load` / the compile-cache
    zstd writer. A process that keeps compiling NEW executables for ~25 min
    (the full test suite; a server fed unbounded novel shapes) accumulates
    into the cap. Root-caused 2026-08-19: the hung suite held 64,458 maps
    (63,277 anonymous, in r-xp/r--p/rw-p triplets) vs the 65,530 limit.
    """
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def release_executables_if_crowded(threshold: int = 40_000) -> bool:
    """Drop jit caches when the mapping count nears `vm.max_map_count`.

    `jax.clear_caches()` releases the compiled executables the jit caches
    own (measured: ~88% of accumulated anonymous mappings return to the
    kernel); live references (warmed server executables, loaded AOT
    artifacts, a model's cast cache) survive and simply recompile on next
    miss elsewhere. Returns True when a release was triggered. Call from
    long loops that compile unboundedly (the test suite does, per test —
    tests/conftest.py)."""
    if host_map_count() < threshold:
        return False
    import gc

    jax.clear_caches()
    gc.collect()
    return True


def device_sync(x) -> None:
    """Force completion of the computation producing x (host readback of one
    element; works on backends where block_until_ready is a no-op)."""
    import jax.numpy as jnp

    np.asarray(jnp.reshape(x, (-1,))[:1])


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/f5tts_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that device-syncs on stop.

    >>> with Timer("sample") as t: out = model.sample(...); t.sync(out[0])
    """

    def __init__(self, name: str = "", verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed: float | None = None
        self._sync_target = None

    def sync(self, x) -> None:
        self._sync_target = x

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        if self._sync_target is not None:
            device_sync(self._sync_target)
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose and self.name:
            print(f"[{self.name}] {self.elapsed:.3f}s")
