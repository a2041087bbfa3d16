"""Per-task metric registry + epoch aggregation.

Reference: ``vlmo/modules/vlmo_utils.py`` — ``set_metrics:16`` attaches
per-task torchmetrics (accuracy/scalar/VQAScore), ``epoch_wrapup:55``
aggregates them into per-task epoch values and the single ``the_metric``
model-selection scalar.  Re-derived without torchmetrics/Lightning; the
reduce hook covers multi-host runs.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from vqattack_tpu.eval.metrics import Scalar, VQAScore


class Accuracy(Scalar):
    """argmax accuracy ignoring -100 labels (``my_metrics.py:5``)."""

    def update_logits(self, logits: np.ndarray, labels: np.ndarray):
        logits = logits.reshape(-1, logits.shape[-1])
        labels = labels.reshape(-1)
        keep = labels != -100
        if keep.sum() == 0:
            return
        preds = logits[keep].argmax(-1)
        self.total += float((preds == labels[keep]).sum())
        self.count += int(keep.sum())


# which aggregated value feeds ``the_metric`` per task (epoch_wrapup:55-200):
# accuracies and scores add, vqa uses score/100-style scaling in the ref; we
# add the raw epoch value like the reference's `the_metric += value`
_TASK_METRICS: Dict[str, Callable[[], Scalar]] = {
    "mlm": Accuracy,
    "textmlm": Accuracy,
    "itm": Accuracy,
    "itc": Scalar,
    "irtr": Scalar,
    "vqa": VQAScore,
    "nlvr2": Accuracy,
}


class TaskMetricRegistry:
    def __init__(self, tasks: List[str], reduce_fn: Optional[Callable] = None):
        """``tasks``: active task names (the reference's loss_names > 0 set);
        ``reduce_fn(value, count) -> (value, count)`` for cross-host sync."""
        self.tasks = list(tasks)
        self.reduce_fn = reduce_fn
        self.metrics: Dict[str, Scalar] = {}
        self.losses: Dict[str, Scalar] = {}
        for t in tasks:
            self.metrics[t] = _TASK_METRICS.get(t, Scalar)()
            self.losses[t] = Scalar()

    def update(self, task: str, *, loss: Optional[float] = None,
               logits=None, labels=None, targets=None):
        if loss is not None:
            self.losses[task].update(float(loss))
        m = self.metrics[task]
        if logits is not None:
            if isinstance(m, VQAScore):
                m.update_logits(np.asarray(logits), np.asarray(targets))
            elif isinstance(m, Accuracy):
                m.update_logits(np.asarray(logits), np.asarray(labels))
            else:
                m.update(float(np.asarray(logits).mean()))

    def epoch_wrapup(self) -> Dict[str, float]:
        """Aggregate all tasks -> {"<task>/metric", "<task>/loss", ...,
        "the_metric"} and reset (``epoch_wrapup:55-200``)."""
        out: Dict[str, float] = {}
        the_metric = 0.0
        for t in self.tasks:
            m, l = self.metrics[t], self.losses[t]
            if self.reduce_fn is not None:
                m.total, m.count = self.reduce_fn(m.total, m.count)
                l.total, l.count = self.reduce_fn(l.total, l.count)
            value = m.compute()
            out[f"{t}/metric"] = value
            out[f"{t}/loss"] = l.compute()
            the_metric += value
            m.reset()
            l.reset()
        out["the_metric"] = the_metric
        return out
