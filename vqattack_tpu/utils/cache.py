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
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.processor()
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
