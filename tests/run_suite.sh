#!/bin/sh
# Full test suite, split into two pytest processes.
#
# A single `pytest tests/` run on this box can die at ~96% with a native
# SIGSEGV: after ~25 min of accumulated compiled executables, the first XLA
# compile issued from a non-main thread (test_serve's MicroBatcher) crashes
# inside jax's backend_compile_and_load. The serve tests pass in isolation
# (26/26), so running the threaded-server modules in a fresh process avoids
# the accumulation trigger. See CLAUDE.md "Environment gotchas".
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --ignore=tests/test_serve.py --ignore=tests/test_artifact_serve.py "$@"
python -m pytest tests/test_serve.py tests/test_artifact_serve.py -q "$@"
