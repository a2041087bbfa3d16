"""Persistent XLA compile cache (one switch for every entry point).

On this runtime, full-size compiles go through a remote-compile relay and
take minutes; the on-disk cache makes every repeat instant.  bench.py,
``vqattack_tpu.run``, ``vqattack_tpu.transfer_eval`` and the training CLI all
call :func:`enable_compile_cache` at startup.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "VQATTACK_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
