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

    def worker():
        while True:
            with lock:
                i = next(it, None)
            if i is None:
                q.put(sentinel)
                return
            q.put((i, dataset[i]))

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
            yield buf.pop(want)
            want += 1
    while want in buf:
        yield buf.pop(want)
        want += 1
