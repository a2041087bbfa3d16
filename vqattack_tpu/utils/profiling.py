"""Profiling/tracing harness (from-scratch addition; SURVEY §5.1 — the
reference has none beyond timing meters).

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
- :class:`StepTimer` — wall-clock step timing that forces a real device
  sync.  IMPORTANT: on the tunneled-TPU runtime ``block_until_ready`` can
  return before execution finishes; the only reliable sync is a device->host
  transfer, so the timer reads back one scalar element of the result.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hard_sync(tree: Any) -> None:
    """Force completion by transferring one scalar from EACH leaf (reliable
    even where block_until_ready is advisory).  Syncing only the first leaf
    would let independently-dispatched computations still be in flight when
    the timer stops."""
    import jax

    for x in jax.tree_util.tree_leaves(tree):
        if not hasattr(x, "shape"):
            continue
        flat = x.reshape(-1) if x.ndim else x
        np.asarray(jax.device_get(flat[:1] if x.ndim else flat))


class StepTimer:
    def __init__(self):
        self.times: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def timeit(self, fn, *args, warmup: int = 1, reps: int = 3, **kw):
        """Run ``fn`` with hard sync; returns (mean_seconds, last_result)."""
        out = None
        for _ in range(warmup):
            out = fn(*args, **kw)
            hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, **kw)
            hard_sync(out)
        self.times.append((time.perf_counter() - t0) / reps)
        return self.times[-1], out

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))
