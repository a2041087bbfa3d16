"""Threaded, order-preserving prefetch iterator shared by the dataset
classes (stands in for torch DataLoader workers: JPEG decode + resize overlap
with device compute)."""

from __future__ import annotations

import queue as queue_mod
import threading
from typing import Any, Dict, Iterator, Optional, Sequence


def threaded_iter(
    dataset,
    indices: Optional[Sequence[int]] = None,
    num_workers: int = 4,
    prefetch: int = 8,
) -> Iterator[Dict[str, Any]]:
    indices = list(indices if indices is not None else range(len(dataset)))
    if num_workers <= 0:
        for i in indices:
            yield dataset[i]
        return
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    it = iter(indices)
    lock = threading.Lock()
    sentinel = object()

    class _WorkerError:
        def __init__(self, exc: BaseException):
            self.exc = exc

    def worker():
        # the sentinel MUST reach the consumer even if dataset[i] raises —
        # a dead worker without its sentinel would deadlock the iterator
        try:
            while True:
                with lock:
                    i = next(it, None)
                if i is None:
                    return
                try:
                    item = dataset[i]
                except BaseException as e:  # re-raised in order, consumer side
                    q.put((i, _WorkerError(e)))
                    continue
                q.put((i, item))
        finally:
            q.put(sentinel)

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
    for t in threads:
        t.start()
    done = 0
    buf: Dict[int, Any] = {}
    want = 0
    order = {idx: pos for pos, idx in enumerate(indices)}
    while done < num_workers:
        got = q.get()
        if got is sentinel:
            done += 1
            continue
        i, item = got
        buf[order[i]] = item
        while want in buf:
            nxt = buf.pop(want)
            want += 1
            if isinstance(nxt, _WorkerError):
                raise nxt.exc
            yield nxt
    while want in buf:
        nxt = buf.pop(want)
        want += 1
        if isinstance(nxt, _WorkerError):
            raise nxt.exc
        yield nxt
