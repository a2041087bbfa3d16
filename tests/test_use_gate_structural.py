"""USE-gate readiness drill (VERDICT r3 Next #7).

The asset-gated numeric-parity test (``test_use_gate_parity_vs_tfhub``)
needs the real ``universal-sentence-encoder-large_5`` SavedModel, which is
not mounted in CI — so until now the ``USEGate`` code path (loading,
CPU pinning, list-of-strings batching, scores/scores_pairs, operating
point, ratchet integration) had never executed.  This file proves all of
that against a tiny stand-in TF SavedModel with the same calling
convention as the TF-hub USE module: callable on a 1-D string tensor,
returns ``[N, D]`` float32 embeddings.  Only the *numeric* parity vs the
reference's USE scores remains asset-gated.

Reference comparator: ``ALBEF_attack/adv_attack.py:101-103`` (hub.load on
a local path, CPU-pinned) and ``:315-318`` (per-candidate cosine gate at
threshold 0.95).
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from vqattack_tpu.attacks.text_attack import (  # noqa: E402
    WordCandidates,
    compute_iter_schedule,
    select_substitutions,
)
from vqattack_tpu.text.similarity import (  # noqa: E402
    SimilarityGate,
    USEGate,
    make_gate,
)

EMBED_DIM = 16


class _StandInEncoder(tf.Module):
    """Deterministic string->embedding module with the USE calling shape.

    Embeds each sentence as the normalized bag of salted token hashes —
    order-insensitive like a bag-of-words, so similar word sets score
    high and disjoint word sets score low, enough structure to drive the
    acceptance ratchet both ways in tests.
    """

    @tf.function(input_signature=[tf.TensorSpec([None], tf.string)])
    def __call__(self, sentences):
        tokens = tf.strings.split(sentences)  # ragged [N, None]
        cols = []
        for salt in range(EMBED_DIM):
            salted = tf.strings.join([tf.strings.as_string(salt), tokens])
            buckets = tf.strings.to_hash_bucket_fast(salted, 1000)
            col = tf.reduce_sum(
                tf.cast(buckets, tf.float32) / 1000.0 - 0.5, axis=1
            )
            cols.append(col)
        emb = tf.stack(cols, axis=1)  # [N, D]
        return emb / tf.maximum(tf.norm(emb, axis=1, keepdims=True), 1e-9)


@pytest.fixture(scope="module")
def use_gate(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("use_standin") / "model")
    tf.saved_model.save(_StandInEncoder(), path)
    # loads through USEGate's own loader (tf.saved_model.load fallback when
    # tensorflow_hub is absent; hub.load when present — identical for a
    # local SavedModel directory)
    return make_gate(kind="use", use_path=path)


def test_loads_and_is_usegate(use_gate):
    assert isinstance(use_gate, USEGate)


def test_scores_shape_range_and_self_similarity(use_gate):
    ref = "what color is the dog"
    cands = ["what color is the dog", "what color is the cat", "two dogs"]
    s = use_gate.scores(ref, cands)
    assert s.shape == (3,)
    assert np.all(s >= -1.0 - 1e-6) and np.all(s <= 1.0 + 1e-6)
    # identical sentence embeds identically -> cosine 1
    assert s[0] == pytest.approx(1.0, abs=1e-5)
    # one-word change stays far above a disjoint sentence
    assert s[1] > s[2]


def test_scores_pairs_matches_grouped_scores(use_gate):
    """scores_pairs is the batched bucket entry point — must agree with the
    per-reference scores() grouping (the base-class contract)."""
    refs = ["what color is the dog", "how many cats are there",
            "what color is the dog"]
    cands = ["what color is the cat", "how many dogs are there",
             "what shade is the dog"]
    batched = use_gate.scores_pairs(refs, cands)
    fallback = SimilarityGate.scores_pairs(use_gate, refs, cands)
    np.testing.assert_allclose(batched, fallback, atol=1e-6)


def test_operating_point_is_identity(use_gate):
    # USE *is* the reference's score space: the 0.95 constant passes through
    assert use_gate.operating_point(0.95) == 0.95
    assert use_gate.operating_point(0.9) == 0.9


def test_ratchet_integration_accepts_and_rejects(use_gate):
    """Drive the real greedy-substitution walk with USEGate as the gate:
    a near-identical candidate passes the threshold, a destructive one is
    rejected (``update_adv_text`` semantics, adv_attack.py:265-324)."""
    words = ["what", "color", "is", "the", "dog"]
    # one attackable word ("dog"), two candidates: one similar-sentence
    # winner and one that wrecks the sentence
    cands = WordCandidates(
        words=words,
        spans=[(i, i + 1) for i in range(len(words))],
        candidate_lists=[None, None, None, None, ["cat", "zzqqx"]],
        iter_list=compute_iter_schedule(1, 40),
    )
    pos = cands.attack_positions
    emb_dim = 8
    rng = np.random.default_rng(0)
    ori_emb = rng.normal(size=(25, emb_dim)).astype(np.float32)

    def embed_texts(texts):
        # deterministic per-text embeddings; the greedy ranker only needs
        # them to differ across candidates
        out = np.stack([
            rng_for(t).normal(size=(25, emb_dim)).astype(np.float32)
            for t in texts
        ])
        return out

    def rng_for(t):
        return np.random.default_rng(abs(hash(t)) % (2**32))

    text_grad = np.ones((len(pos), emb_dim), np.float32)
    # permissive threshold in USE space: similar sentence passes
    new_text, ops = select_substitutions(
        "what color is the dog", "what color is the dog", text_grad, cands,
        ori_emb, embed_texts, use_gate.scores,
        sim_threshold=use_gate.operating_point(0.5), max_length=25,
    )
    assert ops, "a near-paraphrase substitution should be accepted"
    assert new_text != "what color is the dog"

    # threshold above the self-similarity of any CHANGED sentence: nothing
    # can be accepted
    new_text2, ops2 = select_substitutions(
        "what color is the dog", "what color is the dog", text_grad, cands,
        ori_emb, embed_texts, use_gate.scores,
        sim_threshold=use_gate.operating_point(0.999999), max_length=25,
    )
    assert not ops2
    assert new_text2 == "what color is the dog"
