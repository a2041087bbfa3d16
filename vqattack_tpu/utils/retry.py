"""Retry helper for transient runtime failures.

The tunneled-TPU relay occasionally aborts remote compiles mid-stream
("response body closed before all bytes were read"); the compile is
idempotent and cache-backed, so an immediate retry succeeds.  This wrapper
retries only on error text matching known-transient signatures.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")

TRANSIENT_SIGNATURES = (
    "remote_compile",
    "response body closed",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "Connection reset",
)


def with_retries(
    fn: Callable[[], T],
    attempts: int = 3,
    backoff_s: float = 2.0,
    signatures: Sequence[str] = TRANSIENT_SIGNATURES,
    log=print,
) -> T:
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by signature below
            msg = str(e)
            if not any(s in msg for s in signatures):
                raise
            last = e
            log(f"transient runtime error (attempt {i + 1}/{attempts}): {msg[:140]}")
            time.sleep(backoff_s * (i + 1))
    raise last  # type: ignore[misc]
