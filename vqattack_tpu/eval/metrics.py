"""Attack + task metrics.

Reference: ``vlmo/gadgets/my_metrics.py`` (``Accuracy`` ignoring -100,
``Scalar``, ``VQAScore`` = one-hot . soft-target sum — the official soft VQA
accuracy over the 3,129-label space) and the running ``attack_accuracy``
(flip-rate) bookkeeping (``adv_attack.py:727-733``).  Re-derived without
torchmetrics; ``sync()`` reduces across hosts via a jax collective when a
distributed runtime is initialized.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class Scalar:
    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.total += float(value) * n
        self.count += n

    def compute(self) -> float:
        return self.total / max(1, self.count)

    def reset(self):
        self.total, self.count = 0.0, 0


class VQAScore(Scalar):
    """sum over batch of soft-target score at the argmax label
    (``my_metrics.py:49-69``)."""

    def update_logits(self, logits: np.ndarray, targets: np.ndarray):
        """logits [B, L]; targets [B, L] soft scores."""
        preds = np.argmax(logits, axis=-1)
        picked = targets[np.arange(len(preds)), preds]
        self.total += float(picked.sum())
        self.count += len(preds)


class AttackAccuracy:
    """Running flip-rate: fraction of attacked samples whose victim answer
    differs from the stored clean answer; printable every N samples
    (``adv_attack.py:727-733``)."""

    def __init__(self, print_every: int = 50):
        self.flips: List[int] = []
        self.print_every = print_every

    def update(self, answer_after_attack: str, clean_answer: str) -> None:
        self.flips.append(int(answer_after_attack != clean_answer))

    @property
    def value(self) -> float:
        return sum(self.flips) / max(1, len(self.flips))

    def maybe_log(self, log_fn=print) -> None:
        if self.flips and len(self.flips) % self.print_every == 0:
            log_fn(f"attack_accuracy {self.value:.4f} ({len(self.flips)} samples)")


def all_reduce_mean(values: Sequence[float]) -> float:
    """Cross-host mean via jax (replaces torch.distributed meter sync,
    ``ALBEF_attack/utils.py:24-38``); single-process falls through."""
    import jax

    arr = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return float(arr.mean()) if arr.size else 0.0
    # the submodule is not reachable as an attribute of jax.experimental —
    # it must be imported explicitly
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(arr.sum())
    count = multihost_utils.process_allgather(np.float64(arr.size))
    return float(np.sum(total) / max(1.0, float(np.sum(count))))
