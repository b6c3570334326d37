"""Minimizer for the (since root-caused) full-suite native SIGSEGV.

RESOLVED 2026-08-19: the "accumulated suite state" was the process MAPPING
COUNT — every XLA:CPU executable stays ORC-JIT-loaded as ~20+ anonymous
mappings, the suite's thousands of distinct compiles crossed the kernel's
`vm.max_map_count` cap (65530; a hung run held 64,458 maps with 120 GB RAM
free), and mmap's ENOMEM surfaced as "LLVM compilation error: Cannot
allocate memory" followed by a deadlock or a SIGSEGV in whatever allocated
next (`backend_compile_and_load`, the compile-cache zstd writer). The
batcher thread was incidental — it merely issued the straw compile. Fix:
conftest's per-test map-count guard (utils/profiling.host_map_count +
jax.clear_caches above 40k; tests/test_map_guard.py). This tool is kept as
the generic accumulate-state-then-compile-from-a-thread harness; enough
--executables to cross the cap (watch `wc -l /proc/<pid>/maps`) should
reproduce the ENOMEM path.

Original symptom, for the record: a single `pytest tests/` process died at
~96% with a native SIGSEGV inside `backend_compile_and_load` — the first
XLA compile issued from a non-main thread (serve.py's MicroBatcher
resolving the duration predictor) after ~25 min of accumulated suite state;
test_serve alone was 26/26 green.

This script builds candidate states cheaply and then compiles from a fresh
thread, so hypotheses can be bisected in minutes instead of 25-minute suite
runs:

    python tools/segv_repro.py --executables 300 --thread-compiles 5
    python tools/segv_repro.py --torch --executables 300
    python tools/segv_repro.py --torch-after --threads 3
    python tools/segv_repro.py --suite-imports --executables 100

Install the native backtrace handler first (the box has no gdb and cores
are unusable at ~3 MB/s disk):

    gcc -shared -fPIC -O1 -g -o /tmp/segv_bt.so tools/segv_bt.c
    SEGV_BT=/tmp/segv_bt.so python tools/segv_repro.py ...

Exits 0 and prints OK when nothing crashed (the hypothesis did not
reproduce); a reproduction prints the native stack and dies.
"""

from __future__ import annotations

import argparse
import ctypes
import os
import sys
import threading


def install_bt() -> None:
    path = os.environ.get("SEGV_BT")
    if path and os.path.exists(path):
        ctypes.CDLL(path).install_bt_handler()
        print(f"[segv_repro] native backtrace handler installed from {path}")


def make_fn(i: int):
    import jax
    import jax.numpy as jnp

    # a distinct shape per i -> a distinct compiled executable per call
    @jax.jit
    def fn(x):
        return jnp.tanh(x @ x.T) * (i % 7 + 1)

    return fn


def compile_one(i: int, tag: str) -> None:
    import jax
    import numpy as np

    fn = make_fn(i)
    x = np.ones((4 + i % 61, 8), np.float32)
    np.asarray(fn(x))
    if i % 50 == 0:
        print(f"[segv_repro] {tag}: compiled #{i}", flush=True)
    del jax


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--executables", type=int, default=300,
                    help="distinct executables to compile on the MAIN thread first")
    ap.add_argument("--thread-compiles", type=int, default=5,
                    help="fresh compiles to issue from each spawned thread")
    ap.add_argument("--threads", type=int, default=1,
                    help="number of spawned compiler threads (sequential)")
    ap.add_argument("--torch", action="store_true",
                    help="import torch BEFORE jax initializes (suite order: "
                         "golden-parity modules import torch early)")
    ap.add_argument("--torch-after", action="store_true",
                    help="import torch after the main-thread compiles")
    ap.add_argument("--suite-imports", action="store_true",
                    help="import the heavy libraries the suite accumulates "
                         "(torch, orbax, safetensors, einops, PIL)")
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent compile cache (known-bad "
                         "zstandard write path)")
    args = ap.parse_args()

    install_bt()
    os.environ.setdefault("F5_TTS_COMPILE_CACHE", "off")
    if args.torch:
        import torch  # noqa: F401
        print(f"[segv_repro] torch {torch.__version__} imported first")

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.cache:
        os.environ.pop("F5_TTS_COMPILE_CACHE", None)
        jax.config.update("jax_compilation_cache_dir", "/tmp/segv_repro_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.suite_imports:
        import einops  # noqa: F401
        import orbax.checkpoint  # noqa: F401
        import safetensors  # noqa: F401
        import torch  # noqa: F401
        print("[segv_repro] suite-adjacent imports loaded")

    for i in range(args.executables):
        compile_one(i, "main")
    print(f"[segv_repro] main thread holds {args.executables} executables")

    if args.torch_after:
        import torch  # noqa: F401
        print(f"[segv_repro] torch {torch.__version__} imported after compiles")

    base = args.executables
    for t in range(args.threads):
        errs: list[BaseException] = []

        def work(t=t):
            try:
                for j in range(args.thread_compiles):
                    compile_one(base + t * args.thread_compiles + j, f"thread{t}")
            except BaseException as e:  # pragma: no cover
                errs.append(e)

        th = threading.Thread(target=work, name=f"compiler-{t}")
        th.start()
        th.join()
        if errs:
            raise errs[0]
        print(f"[segv_repro] thread {t}: {args.thread_compiles} compiles OK")

    print("[segv_repro] OK — no crash under this state")


if __name__ == "__main__":
    sys.exit(main())
