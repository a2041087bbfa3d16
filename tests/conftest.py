"""Test harness: force a virtual 8-device CPU platform (SURVEY §4d).

Multi-device sharding tests run against ``xla_force_host_platform_device_count``
without needing TPU hardware; numerics tests are platform-agnostic.

The runtime image pre-registers a tunneled-TPU PJRT plugin ("axon") from
``sitecustomize`` at interpreter start, which also pre-imports jax — so env
vars alone are too late.  Backends still initialize lazily, so forcing the
platform via ``jax.config`` here (before any backend init) pins the whole
test session to the in-process CPU client.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache, READ-ONLY by default: on this single-core machine
# compilation dominates test wall-clock; repeat runs hit pre-populated
# entries.  The dir is keyed by a host CPU-feature fingerprint
# (utils/cache.py): XLA:CPU AOT executables cached on a machine with
# different vector extensions SIGILL/segfault when loaded here (observed —
# the cache outlives VM reassignment).  Writes are disabled because XLA:CPU's
# native executable.serialize() has segfaulted mid-suite (round 4, twice, in
# put_executable_and_time) — a SIGSEGV cannot be caught, and the default lane
# must always reach its summary line.  Populate the cache with
# `make warm-test-cache` (per-file subprocesses, crash-resilient), or opt
# writes back on with VQATTACK_TESTS_CACHE_WRITE=1.
from vqattack_tpu.utils.cache import cpu_fingerprint, disable_cache_writes  # noqa: E402

_cache = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    f".jax_cache_tests-{cpu_fingerprint()}",
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
if os.environ.get("VQATTACK_TESTS_CACHE_WRITE", "") != "1":
    disable_cache_writes()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---- vm.max_map_count guard (the r4/r5 full-suite SIGSEGV root cause) ----
# Every retained XLA:CPU executable holds ~6 process memory maps (measured);
# the full suite accumulates ~27k maps by test ~104 and crosses the kernel's
# vm.max_map_count (65530 here) right where two rounds of suite runs
# segfaulted inside XLA:CPU native code (r4: executable serialize during a
# cache write; r5: backend_compile_and_load) at ~test 334 — a failed mmap in
# the JIT code loader is a SIGSEGV, not a Python exception.  The guard:
# clear jax's program caches whenever the map count crosses a safety
# threshold.  jax.clear_caches() drops the maps back to baseline (measured
# 2898 -> 505) and live jitted callables simply recompile on next use.
_MAP_GUARD_THRESHOLD = int(os.environ.get("VQATTACK_MAP_GUARD", "45000"))


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: guard inert
        return 0


def pytest_runtest_teardown(item, nextitem):
    n = _map_count()
    if os.environ.get("VQATTACK_TESTS_DIAG"):
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        with open("/tmp/suite_maps.log", "a") as f:
            f.write(f"{n}\t{rss}\t{item.nodeid}\n")
    if n > _MAP_GUARD_THRESHOLD:
        import gc
        import sys

        jax.clear_caches()
        gc.collect()
        # sys.__stderr__: pytest captures sys.stderr during teardown, which
        # would swallow the only visible record of a guard firing
        print(
            f"\n[conftest] map-count guard: {n} maps > "
            f"{_MAP_GUARD_THRESHOLD}, cleared jax caches -> {_map_count()}",
            file=sys.__stderr__,
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
