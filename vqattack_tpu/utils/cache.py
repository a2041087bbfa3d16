"""Persistent XLA compile cache wiring.

Full-size compiles through the tunneled-TPU remote-compile relay take
minutes; every entry point (run/predict/transfer_eval/train CLIs, bench,
the driver hooks) shares one on-disk cache so repeats are instant —
call :func:`enable_compile_cache` at startup.

CPU-platform runs get a *separate* cache dir keyed by a host CPU-feature
fingerprint: XLA:CPU serializes AOT executables specialized to the build
machine's vector extensions, and loading an entry cached on a different
machine can SIGILL/segfault (observed — these caches outlive VM
reassignment).  TPU executables have no such host dependence.
"""

from __future__ import annotations

import hashlib
import os


def cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags + jaxlib version.

    The jaxlib version is part of the key because the serialized AOT
    executable format (and XLA's target-feature autodetection, which can
    see cpuid bits /proc/cpuinfo does not list) changes across releases —
    a cache written by another jaxlib has segfaulted the loader
    (round 4: SIGSEGV in ``compilation_cache.get_executable_and_time``
    deserializing an entry whose compile-machine features did not match
    the host)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 lists "flags"; ARM/s390x use "Features"
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not feats:
        import platform

        feats = platform.processor() or platform.machine()
    try:
        import jaxlib

        feats += f"|jaxlib-{jaxlib.__version__}"
    except Exception:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def _platform() -> str:
    """The platform jax will (or did) initialize.

    Prefers the explicit signals (config / env var) so the common paths
    never touch the backend; with no signal — jax silently falling back
    to CPU on a host without accelerators — asks jax directly, because
    misclassifying an implicit-CPU run would hand it the shared
    unfingerprinted cache and reintroduce the cross-host SIGILL hazard.
    """
    try:
        import jax

        p = jax.config.values.get("jax_platforms")
        if p:
            return str(p).split(",")[0]
    except Exception:
        return os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "default"
    env = os.environ.get("JAX_PLATFORMS", "").split(",")[0]
    if env:
        return env
    try:
        return jax.default_backend()
    except Exception:
        return "default"


def default_cache_dir(repo_root: str | None = None) -> str:
    if repo_root is None:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
    if _platform() == "cpu":
        return os.path.join(repo_root, f".jax_cache_cpu-{cpu_fingerprint()}")
    return os.path.join(repo_root, ".jax_cache")


def disable_cache_writes() -> None:
    """Make the persistent compile cache read-only for this process.

    XLA:CPU's ``executable.serialize()`` has segfaulted mid-write
    (``compilation_cache.put_executable_and_time``) late in long
    many-compilation processes on this host (round 4: rc=139 at ~86% of
    the test suite, twice; the preceding 334 tests and the remaining 11
    standalone all pass).  A SIGSEGV in native code cannot be caught, so
    the only robust fix for a lane that must always reach its summary
    line is to never enter the write path: reads (deserialize) still hit
    any pre-populated entries, writes become no-ops.

    Populate the cache out-of-band with ``make warm-test-cache`` — it
    runs one pytest process per test file with writes enabled, so a
    serialize crash loses only that file's entries, never the lane.
    """
    from jax._src import compilation_cache as _cc

    def _no_put(*args, **kwargs):  # signature-compatible no-op
        return None

    _cc.put_executable_and_time = _no_put


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax's persistent compile cache at ``cache_dir`` (default:
    the repo-level platform-appropriate dir; override with
    ``VQATTACK_CACHE_DIR``).  Safe to call more than once — e.g. again
    after forcing the CPU platform in-process."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("VQATTACK_CACHE_DIR") or default_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
