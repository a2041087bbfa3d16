"""Image-text retrieval recall evaluation.

Reference: ``vlmo/modules/objectives.py:477-799`` (``compute_irtr_recall`` and
``compute_irtr_recall_with_rerank``): rank all caption-image pairs by
contrastive similarity, report R@1/5/10 both directions; the re-rank variant
rescoreds the top-k shortlist with the fusion ITM head.  The reference
distributes this with torch DataLoaders + dist gather; here the score matrix
is one jitted matmul and the shortlist re-rank is a batched fusion call.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


def recall_at_k(
    scores: np.ndarray, gt_image_per_text: np.ndarray, ks=(1, 5, 10)
) -> Dict[str, float]:
    """``scores[t, i]`` similarity of text t vs image i; ``gt_image_per_text``
    maps each text row to its positive image column."""
    order = np.argsort(-scores, axis=1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == gt_image_per_text[:, None]).any(axis=1)
        out[f"r@{k}"] = float(hit.mean())
    return out


def irtr_recall(
    image_feats: np.ndarray,   # [Ni, D] normalized
    text_feats: np.ndarray,    # [Nt, D] normalized
    text_to_image: np.ndarray, # [Nt] gt image index per text
    ks=(1, 5, 10),
) -> Dict[str, float]:
    """Two-direction contrastive recall."""
    t2i = text_feats @ image_feats.T  # [Nt, Ni]
    res = {f"t2i_{k}": v for k, v in recall_at_k(t2i, text_to_image, ks).items()}

    # image->text: an image's positives are all texts mapping to it
    i2t = t2i.T  # [Ni, Nt]
    order = np.argsort(-i2t, axis=1)
    for k in ks:
        hits = []
        for i in range(i2t.shape[0]):
            positives = np.where(text_to_image == i)[0]
            if positives.size == 0:
                continue
            hits.append(np.isin(order[i, :k], positives).any())
        res[f"i2t_r@{k}"] = float(np.mean(hits)) if hits else 0.0
    return res


def irtr_recall_with_rerank(
    image_feats: np.ndarray,
    text_feats: np.ndarray,
    text_to_image: np.ndarray,
    itm_score_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    k_test: int = 32,
    ks=(1, 5, 10),
) -> Dict[str, float]:
    """Contrastive shortlist -> ITM re-rank (``objectives.py:612-799``).

    ``itm_score_fn(text_indices [M], image_indices [M]) -> match logit [M]``
    is the caller-provided batched fusion scorer.
    """
    t2i = text_feats @ image_feats.T
    nt = t2i.shape[0]
    shortlist = np.argsort(-t2i, axis=1)[:, :k_test]  # [Nt, K]
    rescored = np.full_like(t2i, -np.inf)
    for t in range(nt):
        cols = shortlist[t]
        logits = itm_score_fn(np.full(len(cols), t), cols)
        rescored[t, cols] = logits
    return {f"rerank_t2i_{k}": v for k, v in recall_at_k(rescored, text_to_image, ks).items()}


def irtr_loss_np(sim_pos: np.ndarray, sim_negs: np.ndarray) -> float:
    """In-batch IRTR CE (``objectives.py:301-373``): positive vs sampled
    negative ITM scores, softmax over (1 + n_neg)."""
    logits = np.concatenate([sim_pos[:, None], sim_negs], axis=1)
    logits = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    return float(-np.log(np.maximum(p[:, 0], 1e-12)).mean())
