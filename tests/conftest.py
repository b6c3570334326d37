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
    """Optional native-crash tracing for the documented full-suite SIGSEGV
    (CLAUDE.md; tools/segv_bt.c): build the handler and export
    F5_TTS_SEGV_BT=/path/to/segv_bt.so to get a native backtrace on stderr
    when the crash fires. Installed here — AFTER pytest's faulthandler
    plugin — so it runs first and chains to faulthandler's Python dump."""
    bt = os.environ.get("F5_TTS_SEGV_BT")
    if bt and os.path.exists(bt):
        import ctypes

        ctypes.CDLL(bt).install_bt_handler()
