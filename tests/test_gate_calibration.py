"""Similarity-gate operating points + calibration machinery (docs/GATES.md).

The BERT gate is exercised with a deterministic one-hot token embedding
space, where mean-pool cosines have closed-form structure: identity and
pure reorderings score exactly 1 (the pooling-level blind spot the docs
call out), single substitutions score strictly below 1, unrelated text
lowest.  This pins the acceptance *ordering* per gate and the USE->gate
threshold mapping without needing real checkpoints.
"""

import numpy as np
import pytest

from vqattack_tpu.text.calibrate import gate_score_profile, suggest_threshold
from vqattack_tpu.text.similarity import (
    BERT_SPACE_DEFAULT,
    BertMeanPoolGate,
    NullGate,
    SimilarityGate,
    USE_SPACE_DEFAULT,
)
from vqattack_tpu.text.tokenizer import WordPieceTokenizer

WORDS = ["what", "color", "is", "the", "dog", "cat", "red", "blue", "man",
         "frisbee", "ball", "holding", "wearing", "hat", "a"]


def make_gate():
    tok = WordPieceTokenizer.toy(WORDS)

    def embed_fn(ids, mask):
        # one-hot token embeddings -> mean pool == normalized bag of tokens
        ids = np.asarray(ids)
        out = np.zeros((*ids.shape, tok.vocab_size), np.float32)
        np.put_along_axis(out, ids[..., None], 1.0, axis=-1)
        return out

    return BertMeanPoolGate(embed_fn, tok, max_length=16), tok


def test_bert_gate_score_ordering():
    gate, _ = make_gate()
    q = "what color is the dog"
    scores = gate.scores(
        q,
        [
            "what color is the dog",      # identity
            "dog the is color what",      # scrambled (same bag)
            "what color is the cat",      # single substitution
            "man holding a red frisbee",  # unrelated
        ],
    )
    ident, scrambled, sub, unrelated = map(float, scores)
    assert ident == pytest.approx(1.0, abs=1e-6)
    # pooling-level blind spot: reorderings keep the bag -> score 1 here
    assert scrambled == pytest.approx(1.0, abs=1e-6)
    assert sub < 1.0 - 1e-3
    assert unrelated < sub


def test_operating_point_mapping():
    gate, _ = make_gate()
    # the reference's USE-space 0.95 maps to the BERT-space default
    assert gate.operating_point(USE_SPACE_DEFAULT) == BERT_SPACE_DEFAULT
    # non-default thresholds preserve their margin proportionally
    mapped = gate.operating_point(0.90)
    scale = (1 - BERT_SPACE_DEFAULT) / (1 - USE_SPACE_DEFAULT)
    assert mapped == pytest.approx(1 - (1 - 0.90) * scale)
    assert mapped < BERT_SPACE_DEFAULT
    # identity gates pass the threshold through / disable it
    assert SimilarityGate().operating_point(0.95) == 0.95
    assert NullGate().operating_point(0.95) == 0.0


def test_gate_profile_and_suggested_threshold():
    gate, _ = make_gate()
    questions = [
        "what color is the dog",
        "what is the man holding",
        "is the cat wearing a hat",
        "what color is the frisbee",
        "is the man holding a ball",
        "what is the dog wearing",
    ]
    profile = gate_score_profile(gate, questions, seed=0)
    assert all(len(profile.scores[k]) > 0 for k in ("identity", "substitution",
                                                    "scrambled", "unrelated"))
    assert profile.scores["identity"].min() == pytest.approx(1.0, abs=1e-6)
    assert profile.table()  # renders
    thr = suggest_threshold(profile)
    # clamped strictly below the identity ceiling so substitutions CAN pass
    assert thr < 1.0
    assert np.isfinite(thr)


def test_threshold_gates_substitution_acceptance():
    """End to end through select_substitutions: with the gate's operating
    point, a meaning-preserving substitution passes while the ratchet
    rejects anything scoring below an already-accepted one."""
    from vqattack_tpu.attacks.text_attack import WordCandidates, select_substitutions

    gate, tok = make_gate()
    q = "what color is the dog"
    words = q.split()
    spans = [(i, i + 1) for i in range(len(words))]
    cands = WordCandidates(
        words=words, spans=spans,
        candidate_lists=[None, None, None, None, ["cat", "frisbee"]],
        iter_list=[20, 20],
    )
    D = tok.vocab_size
    ori_emb = np.zeros((16, D), np.float32)
    # gradient aligned with the 'cat' direction at the dog position
    grad = np.zeros((1, D), np.float32)
    grad[0, tok.vocab["cat"]] = 1.0
    grad[0, tok.vocab["dog"]] = -1.0

    def embed_texts(texts):
        ids, _ = tok.encode_batch(list(texts), 16)
        out = np.zeros((len(texts), 16, D), np.float32)
        np.put_along_axis(out, ids[..., None], 1.0, axis=-1)
        return out

    new_text, ops = select_substitutions(
        q, q, grad, cands, ori_emb, embed_texts, gate.scores,
        sim_threshold=0.5, max_length=16,
    )
    assert ops == [("dog", "cat")]
    assert new_text == "what color is the cat"

    # an impossible threshold rejects everything
    new_text2, ops2 = select_substitutions(
        q, q, grad, cands, ori_emb, embed_texts, gate.scores,
        sim_threshold=0.9999, max_length=16,
    )
    assert ops2 == [] and new_text2 == q


def test_bert_gate_scores_pairs_matches_scores():
    """The batched pairs entry point must agree with per-reference scores,
    including when the batch is padded to a power-of-two bucket."""
    gate, _ = make_gate()
    refs = ["what color is the dog", "is the cat red",
            "what color is the dog"]
    texts = ["what color is the cat", "is the hat red",
             "what color is a dog"]
    got = gate.scores_pairs(refs, texts)
    want = np.array(
        [float(gate.scores(r, [t])[0]) for r, t in zip(refs, texts)],
        np.float32,
    )
    assert np.allclose(got, want, atol=1e-6)
