"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (the driver validates the real-TPU path separately)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# never write a persistent compile cache from tests: tiny test models gain
# nothing, and jax's threaded cache-write path (zstandard serialization) has
# segfaulted when a serve test compiles in its batcher thread after a CLI
# test enabled the cache process-globally (utils/profiling honors "off")
os.environ["F5_TTS_COMPILE_CACHE"] = "off"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config route reliably forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    """Optional native-crash tracing (tools/segv_bt.c): build the handler and
    export F5_TTS_SEGV_BT=/path/to/segv_bt.so to get a native backtrace on
    stderr on SIGSEGV/SIGABRT/SIGBUS. Installed here — AFTER pytest's
    faulthandler plugin — so it runs first and chains to faulthandler's
    Python dump."""
    bt = os.environ.get("F5_TTS_SEGV_BT")
    if bt and os.path.exists(bt):
        import ctypes

        ctypes.CDLL(bt).install_bt_handler()


def pytest_runtest_teardown(item, nextitem):
    """Keep the process under the kernel's `vm.max_map_count` mapping cap.

    Every XLA:CPU executable stays ORC-JIT-loaded as ~20+ anonymous mappings;
    the full suite compiles thousands of distinct executables and, left
    alone, crosses the 65,530-mapping cap at ~80-95% of the run — mmap then
    fails with ENOMEM and XLA deadlocks or segfaults inside
    backend_compile_and_load (the historical "~25 min of accumulated state"
    SIGSEGV, root-caused 2026-08-19: 64,458 maps at the hang). Releasing the
    jit caches when the count crosses the threshold returns the mappings to
    the kernel (~88% measured) at the cost of a few recompiles, keeping a
    single-process `pytest tests/` green. Threshold overridable via
    F5_TTS_MAP_GUARD for the guard's own test."""
    from f5_tts_tpu.utils.profiling import release_executables_if_crowded

    threshold = int(os.environ.get("F5_TTS_MAP_GUARD", "40000"))
    if release_executables_if_crowded(threshold):
        import warnings

        # a warning, not a print: passing tests' teardown stdout is swallowed
        # by pytest capture, but warnings surface in the end-of-run summary
        warnings.warn(
            f"map-count guard fired after {item.nodeid}: jit caches cleared "
            "to stay under vm.max_map_count", stacklevel=1)
