"""Sentence-similarity gates for the word-substitution attack.

The reference gates every substitution on Universal-Sentence-Encoder cosine
similarity > 0.95 vs the original question, computed on CPU TensorFlow
(``adv_attack.py:101-103,315-318``).  The gate is pluggable here:

- :class:`USEGate` — TF-hub USE (requires a local copy of
  ``universal-sentence-encoder-large_5``; byte-parity with the reference);
- :class:`BertMeanPoolGate` — default offline gate: mean-pooled hidden states
  of the surrogate's own BERT text tower under the attack tokenizer, cosine
  in that space.  Runs on-device (a batch of candidate texts is one jitted
  call), no TF dependency;
- :class:`NullGate` — accept everything (ablation).

All gates implement ``scores(reference_text, candidate_texts) -> [N] cosine
similarities in [-1, 1]``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class SimilarityGate:
    def scores(self, reference: str, candidates: Sequence[str]) -> np.ndarray:
        raise NotImplementedError


class NullGate(SimilarityGate):
    def scores(self, reference, candidates):
        return np.ones(len(candidates), dtype=np.float32)


class USEGate(SimilarityGate):
    """TF-hub Universal Sentence Encoder (local path; CPU-pinned like the
    reference)."""

    def __init__(self, model_path: str):
        import tensorflow as tf
        import tensorflow_hub as hub  # noqa: F401 — optional dep

        with tf.device("cpu"):
            self._model = hub.load(model_path)

    def scores(self, reference, candidates):
        embs = np.asarray(self._model([reference, *candidates]))
        embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        return embs[1:] @ embs[0]


class BertMeanPoolGate(SimilarityGate):
    """Mean-pooled BERT text-tower embeddings, cosine similarity.

    Uses the surrogate's own text encoder (mode="text") — fully offline and
    on-device.  ``embed_fn(ids, mask) -> [B, S, D]`` hidden states.
    """

    def __init__(self, embed_fn, tokenizer, max_length: int = 25):
        self._embed_fn = embed_fn
        self._tokenizer = tokenizer
        self._max_length = max_length

    def _pool(self, texts: Sequence[str]) -> np.ndarray:
        import jax.numpy as jnp

        ids, mask = self._tokenizer.encode_batch(texts, self._max_length)
        hidden = np.asarray(self._embed_fn(jnp.asarray(ids), jnp.asarray(mask)))
        m = mask[..., None].astype(np.float32)
        pooled = (hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)
        return pooled / np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-9)

    def scores(self, reference, candidates):
        embs = self._pool([reference, *candidates])
        return embs[1:] @ embs[0]


def make_gate(
    kind: str = "bert",
    *,
    use_path: Optional[str] = None,
    embed_fn=None,
    tokenizer=None,
    max_length: int = 25,
) -> SimilarityGate:
    if kind == "use":
        assert use_path, "USEGate needs a local TF-hub model path"
        return USEGate(use_path)
    if kind == "bert":
        assert embed_fn is not None and tokenizer is not None
        return BertMeanPoolGate(embed_fn, tokenizer, max_length)
    if kind == "null":
        return NullGate()
    raise ValueError(f"unknown similarity gate: {kind!r}")
