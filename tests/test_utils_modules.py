"""Host-side utility modules: prefetch iterator, retry, step timer."""

import time

import numpy as np
import pytest

from vqattack_tpu.data.iter_utils import threaded_iter
from vqattack_tpu.utils.profiling import StepTimer, hard_sync
from vqattack_tpu.utils.retry import with_retries


class _SlowDataset:
    """Items whose load time is anti-correlated with index: without
    reordering, results would come back reversed."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(0.02 * (self.n - i))
        return {"i": i}


def test_threaded_iter_preserves_order():
    out = [d["i"] for d in threaded_iter(_SlowDataset(8), num_workers=4)]
    assert out == list(range(8))


def test_threaded_iter_zero_workers_inline():
    out = [d["i"] for d in threaded_iter(_SlowDataset(3), num_workers=0)]
    assert out == [0, 1, 2]


def test_threaded_iter_index_subset():
    out = [d["i"] for d in threaded_iter(_SlowDataset(8), indices=[5, 1, 3],
                                         num_workers=2)]
    assert out == [5, 1, 3]


class _ExplodingDataset:
    def __len__(self):
        return 6

    def __getitem__(self, i):
        if i == 3:
            raise ValueError("bad sample 3")
        return {"i": i}


def test_threaded_iter_propagates_worker_exception_no_deadlock():
    """A raising dataset item must surface (in order) instead of killing
    the worker silently and deadlocking the consumer."""
    got = []
    with pytest.raises(ValueError, match="bad sample 3"):
        for d in threaded_iter(_ExplodingDataset(), num_workers=2):
            got.append(d["i"])
    assert got == [0, 1, 2]  # everything before the bad sample, in order


def test_threaded_iter_duplicate_indices():
    """Oversampling (duplicate indices) must yield every requested position —
    an idx-keyed reorder map would collide the duplicates and drop items."""
    out = [d["i"] for d in threaded_iter(_SlowDataset(4), indices=[0, 1, 0, 2],
                                         num_workers=2)]
    assert out == [0, 1, 0, 2]


def test_threaded_iter_early_break_releases_workers():
    """Breaking out of the iterator must unblock workers stuck on the full
    prefetch queue (they would otherwise leak threads + decoded batches)."""
    import threading

    before = threading.active_count()
    for _ in range(5):
        it = threaded_iter(_SlowDataset(32), num_workers=4, prefetch=2)
        next(it)
        it.close()  # what GC / a `break` does to the generator
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1  # workers drained, no leak


def test_maybe_cached_keys_on_converter_tag(tmp_path):
    """The conversion cache must key on (file, converter tag): the same
    torch file ingested as pretrain vs vqa (or at different geometries) is a
    DIFFERENT tree — a basename-only key would return the first conversion
    for both."""
    from vqattack_tpu.checkpoint.io import _maybe_cached

    src = tmp_path / "ALBEF.pth"
    src.write_bytes(b"x")
    cache = str(tmp_path / "cache")
    import os

    os.makedirs(cache)
    a = _maybe_cached(str(src), cache, lambda: {"w": np.ones(2)}, "pretrain480")
    b = _maybe_cached(str(src), cache, lambda: {"w": np.zeros(2)}, "vqa480")
    np.testing.assert_array_equal(a["w"], np.ones(2))
    np.testing.assert_array_equal(b["w"], np.zeros(2))
    # same tag -> cache hit (build not called again)
    c = _maybe_cached(str(src), cache, lambda: {"w": np.full(2, 9.0)}, "pretrain480")
    np.testing.assert_array_equal(c["w"], np.ones(2))
    assert len(os.listdir(cache)) == 2


def test_with_retries_transient_then_success():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("remote_compile: response body closed early")
        return "ok"

    assert with_retries(flaky, attempts=3, backoff_s=0.0, log=lambda *_: None) == "ok"
    assert calls["n"] == 3


def test_with_retries_non_transient_raises_immediately():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise RuntimeError("shape mismatch: this is a real bug")

    with pytest.raises(RuntimeError, match="real bug"):
        with_retries(broken, attempts=3, backoff_s=0.0, log=lambda *_: None)
    assert calls["n"] == 1


def test_with_retries_exhaustion_reraises_last():
    def always():
        raise RuntimeError("DEADLINE_EXCEEDED again")

    with pytest.raises(RuntimeError, match="DEADLINE_EXCEEDED"):
        with_retries(always, attempts=2, backoff_s=0.0, log=lambda *_: None)


def test_step_timer_and_hard_sync():
    import jax.numpy as jnp

    t = StepTimer()
    mean_s, out = t.timeit(lambda: jnp.ones((4, 4)) * 2.0, warmup=1, reps=2)
    assert mean_s >= 0.0
    assert float(np.asarray(out)[0, 0]) == 2.0
    assert t.mean >= 0.0
    hard_sync({"a": out, "b": None})  # mixed pytree, no crash
    hard_sync([])  # empty pytree, no crash
