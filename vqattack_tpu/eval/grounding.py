"""RefCOCO visual-grounding evaluation: REFER loader + weakly-supervised
box accuracy.

Rebuilds the surface the reference's grounding pipeline uses
(``Grounding.py:28,177,233``): ``refTools/refer_python3.py``'s ``REFER``
class (only the members that pipeline touches — ``Refs``, ``refToAnn``,
``Imgs``, ``getRefIds``, ``getRefBox``) and ``dataset/utils.py:149-213``'s
``grounding_eval``/``computeIoU``.  Heatmaps come from the Grad-CAM probe
(:mod:`vqattack_tpu.utils.gradcam`), which replaces the reference's hook-based
visualization; the bicubic mask upsample runs through ``jax.image.resize``
instead of ``F.interpolate`` (both implement Keys bicubic).

Data layout (the standard UNC RefCOCO distribution): ``{root}/{dataset}/``
holding ``refs({splitBy}).p`` (pickled list of ref dicts) and
``instances.json`` (COCO-style images/annotations/categories).  A ``.json``
refs file with the same record structure is accepted too, which keeps test
fixtures dependency-free.
"""

from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from typing import Any, Dict, List, Mapping, Sequence

import numpy as np


class Refer:
    """Minimal REFER api (``refer_python3.py:39-140``)."""

    def __init__(self, data_root: str, dataset: str = "refcoco+",
                 split_by: str = "unc"):
        data_dir = os.path.join(data_root, dataset)
        refs_p = os.path.join(data_dir, f"refs({split_by}).p")
        if os.path.exists(refs_p):
            with open(refs_p, "rb") as f:
                refs = pickle.load(f)
        else:  # json twin for fixture-driven tests
            with open(os.path.join(data_dir, f"refs({split_by}).json")) as f:
                refs = json.load(f)
        with open(os.path.join(data_dir, "instances.json")) as f:
            instances = json.load(f)

        self.Anns: Dict[Any, dict] = {a["id"]: a for a in instances["annotations"]}
        self.Imgs: Dict[Any, dict] = {i["id"]: i for i in instances["images"]}
        self.Cats: Dict[Any, str] = {
            c["id"]: c["name"] for c in instances.get("categories", [])
        }
        self.Refs: Dict[Any, dict] = {}
        self.refToAnn: Dict[Any, dict] = {}
        self.imgToRefs: Dict[Any, List[dict]] = defaultdict(list)
        for ref in refs:
            self.Refs[ref["ref_id"]] = ref
            self.refToAnn[ref["ref_id"]] = self.Anns[ref["ann_id"]]
            self.imgToRefs[ref["image_id"]].append(ref)

    def getRefIds(self, split: str = "") -> List[Any]:
        return [
            rid for rid, ref in self.Refs.items()
            if not split or ref.get("split") == split
        ]

    def getRefBox(self, ref_id) -> List[float]:
        return self.refToAnn[ref_id]["bbox"]


def compute_iou(box1: Sequence[float], box2: Sequence[float]) -> float:
    """[x, y, w, h] IoU with the reference's inclusive-pixel convention
    (``dataset/utils.py:200-213``)."""
    inter_x1 = max(box1[0], box2[0])
    inter_y1 = max(box1[1], box2[1])
    inter_x2 = min(box1[0] + box1[2] - 1, box2[0] + box2[2] - 1)
    inter_y2 = min(box1[1] + box1[3] - 1, box2[1] + box2[3] - 1)
    if inter_x1 < inter_x2 and inter_y1 < inter_y2:
        inter = (inter_x2 - inter_x1 + 1) * (inter_y2 - inter_y1 + 1)
    else:
        inter = 0
    union = box1[2] * box1[3] + box2[2] * box2[3] - inter
    return float(inter) / union


def _upsample_bicubic(mask: np.ndarray, height: int, width: int) -> np.ndarray:
    import jax

    return np.asarray(
        jax.image.resize(np.asarray(mask, np.float32), (height, width),
                         method="bicubic")
    )


def grounding_accuracy(
    results: Sequence[Mapping[str, Any]],
    dets: Mapping[str, Sequence[Sequence[float]]],
    refer: Refer,
    alpha: float = 0.5,
    mask_size: int = 24,
) -> Dict[str, float]:
    """Weakly-supervised grounding accuracy (``dataset/utils.py:149-195``).

    ``results`` rows are ``{"ref_id", "pred"}`` with ``pred`` a
    ``[mask_size, mask_size]`` Grad-CAM heatmap; ``dets`` maps
    ``str(image_id)`` to candidate ``[x, y, w, h(, score...)]`` boxes.  Each
    heatmap is bicubic-upsampled to the image, every candidate box scored by
    ``mask.sum-over-box / area**alpha``, and the best box counted correct
    when IoU with the ref box >= 0.5.  Returns per-split accuracy
    ``{"val_d", "testA_d", "testB_d"}`` (splits with no refs are omitted
    rather than dividing by zero).
    """
    correct = {"val": 0, "testA": 0, "testB": 0}
    num = {"val": 0, "testA": 0, "testB": 0}
    for res in results:
        ref = refer.Refs[res["ref_id"]]
        ref_box = refer.getRefBox(res["ref_id"])
        image = refer.Imgs[ref["image_id"]]
        mask = _upsample_bicubic(
            np.asarray(res["pred"], np.float32).reshape(mask_size, mask_size),
            image["height"], image["width"],
        )
        max_score, pred_box = 0.0, None
        for det in dets[str(ref["image_id"])]:
            # slice bounds follow the reference exactly: int(y):int(y+h),
            # int(x):int(x+w) (utils.py:168) — int(y+h) != int(y)+int(h)
            # for fractional detections
            score = float(
                mask[int(det[1]):int(det[1] + det[3]),
                     int(det[0]):int(det[0] + det[2])].sum()
            ) / (det[2] * det[3]) ** alpha
            if score > max_score:
                max_score, pred_box = score, det[:4]
        split = ref.get("split")
        if split in num:
            num[split] += 1
            if pred_box is not None and compute_iou(ref_box, pred_box) >= 0.5:
                correct[split] += 1
    return {
        f"{split}_d": correct[split] / num[split]
        for split in ("val", "testA", "testB") if num[split]
    }
