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

**Operating points.** The reference's 0.95 threshold is a *USE-space*
constant (``adv_attack.py:303``); cosines in other embedding spaces
concentrate differently, so each gate maps the configured USE-space
threshold into its own space via :meth:`SimilarityGate.operating_point`.
Mean-pooled BERT cosines are strongly anisotropic — near-paraphrases and
even unrelated sentences cluster far above USE's range — so
:class:`BertMeanPoolGate` defaults to a tighter 0.985 point.  To calibrate
on real checkpoints/data, run :mod:`vqattack_tpu.text.calibrate` (or the
sweep CLI's ``--calibrate-gate``) and pass the suggested value via
``BertMeanPoolGate(..., threshold=...)``, ``make_gate(bert_threshold=...)``,
or the CLI flag ``--bert-threshold``.  See ``docs/GATES.md`` for the
threshold table and the known blind spots of each space.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def next_pow2(n: int) -> int:
    """Smallest power of two >= max(n, 1)."""
    return 1 << max(n - 1, 0).bit_length()


def pad_to_bucket(texts: Sequence[str]) -> Tuple[List[str], int]:
    """Pad a text batch to the next power-of-two size with empty strings.

    Batched text entry points (candidate embedding, this module's gates) see
    a different batch size on nearly every call; each distinct size would
    compile a fresh XLA program.  Rows are independent, so padding to
    power-of-two buckets bounds the compiled-program count at
    ``log2(max batch)`` — callers slice the first ``n`` result rows."""
    n = len(texts)
    return list(texts) + [""] * (next_pow2(n) - n), n

# the reference's USE-space gate constant (adv_attack.py:303)
USE_SPACE_DEFAULT = 0.95
# mean-pooled-BERT-space equivalent (anisotropy adjustment; docs/GATES.md)
BERT_SPACE_DEFAULT = 0.985


class SimilarityGate:
    def scores(self, reference: str, candidates: Sequence[str]) -> np.ndarray:
        raise NotImplementedError

    def scores_pairs(
        self, references: Sequence[str], candidates: Sequence[str]
    ) -> np.ndarray:
        """``[sim(references[i], candidates[i])]`` — the cross-sample batched
        entry point (one call scores a whole bucket's trials against each
        trial's own original question).  Default: group by reference and
        delegate to :meth:`scores`; gates with batched encoders override."""
        out = np.empty(len(candidates), np.float32)
        groups: dict = {}
        for i, r in enumerate(references):
            groups.setdefault(r, []).append(i)
        for r, idxs in groups.items():
            s = np.asarray(self.scores(r, [candidates[i] for i in idxs]))
            for j, i in enumerate(idxs):
                out[i] = s[j]
        return out

    def operating_point(self, use_space_threshold: float) -> float:
        """Map the configured USE-space threshold into this gate's score
        space.  Identity for USE itself (and the ablation gate)."""
        return use_space_threshold


class NullGate(SimilarityGate):
    def scores(self, reference, candidates):
        return np.ones(len(candidates), dtype=np.float32)

    def operating_point(self, use_space_threshold: float) -> float:
        return 0.0  # accepts everything regardless


class USEGate(SimilarityGate):
    """TF-hub Universal Sentence Encoder (local path; CPU-pinned like the
    reference, ``adv_attack.py:101-103``).

    ``tensorflow_hub`` is optional: for a *local* SavedModel directory
    (the only case here — zero egress), ``hub.load`` reduces to
    ``tf.saved_model.load``, so the gate falls back to it when hub is not
    installed.  The code path (loading, CPU pinning, batching,
    scores/scores_pairs, ratchet integration) is exercised in CI against a
    tiny stand-in SavedModel (tests/test_use_gate_structural.py); numeric
    parity vs the reference's USE scores stays asset-gated
    (test_use_gate_parity_vs_tfhub, ``pytest -m assets``)."""

    def __init__(self, model_path: str):
        import os

        import tensorflow as tf

        def _load(path):
            try:
                import tensorflow_hub as hub
            except ImportError:
                # hub missing: for a LOCAL SavedModel directory
                # tf.saved_model.load is equivalent
                if os.path.isdir(path):
                    return tf.saved_model.load(path)
                raise
            try:
                return hub.load(path)
            except Exception as e:
                # a stand-in hub that refuses (e.g. the test shim's
                # placeholder raises NotImplementedError): fall back for
                # local dirs, but CHAIN the original error so a genuinely
                # corrupt SavedModel doesn't fail twice with only the
                # second, less informative message surfacing
                if os.path.isdir(path):
                    try:
                        return tf.saved_model.load(path)
                    except Exception as e2:
                        raise e2 from e
                raise

        with tf.device("cpu"):
            self._model = _load(model_path)

    def scores(self, reference, candidates):
        embs = np.asarray(self._model([reference, *candidates]))
        embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        return embs[1:] @ embs[0]

    def scores_pairs(self, references, candidates):
        uniq = list(dict.fromkeys(references))
        embs = np.asarray(self._model([*uniq, *candidates]))
        embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
        ref_rows = {r: embs[i] for i, r in enumerate(uniq)}
        cand = embs[len(uniq):]
        return np.asarray(
            [cand[i] @ ref_rows[r] for i, r in enumerate(references)], np.float32
        )


class BertMeanPoolGate(SimilarityGate):
    """Mean-pooled BERT text-tower embeddings, cosine similarity.

    Uses the surrogate's own text encoder (mode="text") — fully offline and
    on-device.  ``embed_fn(ids, mask) -> [B, S, D]`` hidden states.

    ``threshold``: this gate's own operating point standing in for the
    reference's USE-space 0.95 (default :data:`BERT_SPACE_DEFAULT`; calibrate
    with :mod:`vqattack_tpu.text.calibrate` when real weights are loaded).
    Caveat: mean pooling is order-insensitive except through the contextual
    encoder, so pure word *reorderings* score higher here than in USE space
    (docs/GATES.md) — the tighter default compensates.
    """

    def __init__(self, embed_fn, tokenizer, max_length: int = 25,
                 threshold: float = BERT_SPACE_DEFAULT):
        self._embed_fn = embed_fn
        self._tokenizer = tokenizer
        self._max_length = max_length
        self._threshold = threshold

    def operating_point(self, use_space_threshold: float) -> float:
        # maps USE_SPACE_DEFAULT (0.95) to exactly self._threshold, and
        # preserves the user's margin relative to 0.95 by scaling it into
        # the remaining headroom of this space
        scale = (1.0 - self._threshold) / (1.0 - USE_SPACE_DEFAULT)
        return 1.0 - (1.0 - use_space_threshold) * scale

    def _pool(self, texts: Sequence[str]) -> np.ndarray:
        import jax.numpy as jnp

        padded, n = pad_to_bucket(texts)
        ids, mask = self._tokenizer.encode_batch(padded, self._max_length)
        hidden = np.asarray(self._embed_fn(jnp.asarray(ids), jnp.asarray(mask)))[:n]
        mask = mask[:n]
        m = mask[..., None].astype(np.float32)
        pooled = (hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)
        return pooled / np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True), 1e-9)

    def scores(self, reference, candidates):
        embs = self._pool([reference, *candidates])
        return embs[1:] @ embs[0]

    def scores_pairs(self, references, candidates):
        uniq = list(dict.fromkeys(references))
        embs = self._pool([*uniq, *candidates])
        ref_rows = {r: embs[i] for i, r in enumerate(uniq)}
        cand = embs[len(uniq):]
        return np.asarray(
            [cand[i] @ ref_rows[r] for i, r in enumerate(references)], np.float32
        )


def make_gate(
    kind: str = "bert",
    *,
    use_path: Optional[str] = None,
    embed_fn=None,
    tokenizer=None,
    max_length: int = 25,
    bert_threshold: float = BERT_SPACE_DEFAULT,
) -> SimilarityGate:
    if kind == "use":
        assert use_path, "USEGate needs a local TF-hub model path"
        return USEGate(use_path)
    if kind == "bert":
        assert embed_fn is not None and tokenizer is not None
        return BertMeanPoolGate(embed_fn, tokenizer, max_length,
                                threshold=bert_threshold)
    if kind == "null":
        return NullGate()
    raise ValueError(f"unknown similarity gate: {kind!r}")
