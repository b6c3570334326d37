"""The vm.max_map_count guard (utils/profiling.host_map_count /
release_executables_if_crowded; wired suite-wide in conftest's
pytest_runtest_teardown).

Every XLA:CPU executable stays ORC-JIT-loaded as ~20+ anonymous mappings;
a process that compiles unboundedly (this suite, ~25 min in) crosses the
kernel's 65,530-mapping cap and mmap starts failing with ENOMEM — the
root cause (found 2026-08-19) of the historical full-suite SIGSEGV /
deadlock inside backend_compile_and_load. reference: none — this guards
the repo's own test/serving reliability bar.
"""

import jax
import jax.numpy as jnp

from f5_tts_tpu.utils.profiling import (
    host_map_count,
    release_executables_if_crowded,
)


def test_host_map_count_reads_procfs():
    n = host_map_count()
    assert n > 100  # any live CPython+jax process holds hundreds


def test_compiling_grows_map_count_and_release_frees():
    """Distinct executables add mappings; clearing the jit caches returns
    most of them to the kernel."""
    def f(a, w):
        return jnp.tanh(a @ w).sum()

    before = host_map_count()
    for i in range(6):
        d = 64 + i  # distinct shapes -> distinct executables
        jax.jit(f)(jnp.ones((4, d)), jnp.ones((d, d))).block_until_ready()
    grown = host_map_count()
    assert grown > before  # executables really do hold mappings

    # threshold below the current count -> guard fires and releases
    assert release_executables_if_crowded(threshold=1)
    after = host_map_count()
    assert after < grown


def test_guard_is_noop_below_threshold():
    assert not release_executables_if_crowded(threshold=10_000_000)
