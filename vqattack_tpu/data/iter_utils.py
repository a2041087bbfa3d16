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
    # workers draw (position, index) pairs so duplicate indices (oversampling)
    # fill distinct output slots instead of colliding in an idx-keyed map
    it = iter(enumerate(indices))
    lock = threading.Lock()
    stop = threading.Event()
    sentinel = object()

    class _WorkerError:
        def __init__(self, exc: BaseException):
            self.exc = exc

    def _put(x) -> bool:
        # bounded put that gives up once the consumer is gone (early break /
        # GC sets ``stop``) — a plain q.put would block the worker forever
        # against a full queue nobody drains
        while not stop.is_set():
            try:
                q.put(x, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        # the sentinel MUST reach the consumer even if dataset[i] raises —
        # a dead worker without its sentinel would deadlock the iterator
        try:
            while not stop.is_set():
                with lock:
                    nxt = next(it, None)
                if nxt is None:
                    return
                pos, i = nxt
                try:
                    item = dataset[i]
                except BaseException as e:  # re-raised in order, consumer side
                    if not _put((pos, _WorkerError(e))):
                        return
                    continue
                if not _put((pos, item)):
                    return
        finally:
            _put(sentinel)

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
    for t in threads:
        t.start()
    done = 0
    buf: Dict[int, Any] = {}
    want = 0
    try:
        while done < num_workers:
            got = q.get()
            if got is sentinel:
                done += 1
                continue
            pos, item = got
            buf[pos] = item
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
    finally:
        # consumer exited (exhaustion, break, error): release any workers
        # blocked on a full queue, then drain so their puts complete
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue_mod.Empty:
            pass
