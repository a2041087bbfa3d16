"""Text layer: WordPiece tokenizer, schedule math, candidate generation,
substitution selection."""

import zlib

import numpy as np

from vqattack_tpu.attacks.text_attack import (
    WordCandidates,
    apply_substitutions_to_paraphrase,
    compute_iter_schedule,
    generate_candidates,
    select_substitutions,
)
from vqattack_tpu.text.filter_words import default_filter_words, filter_answer_words
from vqattack_tpu.text.tokenizer import WordPieceTokenizer


def make_tok():
    return WordPieceTokenizer.toy(
        ["what", "color", "is", "the", "dog", "cat", "red", "blue", "frisbee",
         "play", "##ing", "hat", "a"]
    )


def test_tokenize_roundtrip():
    tok = make_tok()
    ids, mask = tok.encode("what color is the dog", max_length=10)
    assert ids.shape == (10,) and mask.sum() == 7  # CLS + 5 + SEP
    assert ids[0] == tok.cls_token_id and ids[6] == tok.sep_token_id
    assert tok.decode(ids) == "what color is the dog"


def test_wordpiece_subword_and_unk():
    tok = make_tok()
    assert tok.tokenize("playing") == ["play", "##ing"]
    assert tok.tokenize("@") == ["@"] if "@" in tok.vocab else True
    # unknown word without char pieces path
    toks = tok.tokenize("zzz")
    assert all(t in tok.vocab for t in toks)
    assert tok.convert_tokens_to_string(["play", "##ing", "dog"]) == "playing dog"


def test_word_spans():
    tok = make_tok()
    words, subs, spans = tok.word_spans("the dog playing")
    assert words == ["the", "dog", "playing"]
    assert spans == [(0, 1), (1, 2), (2, 4)]
    assert subs == ["the", "dog", "play", "##ing"]


def test_iter_schedule_reference_math():
    # 2 substitutable words -> count=3, 40//3=13 odd -> [12,12,16]
    assert compute_iter_schedule(2, 40) == [12, 12, 16]
    # 1 word -> count=2, 40//2=20 even -> [20,20]
    assert compute_iter_schedule(1, 40) == [20, 20]
    # 3 words -> count=4, 10 even -> [10,10,10,10]
    assert compute_iter_schedule(3, 40) == [10, 10, 10, 10]
    # 4 -> count=5, 8 even -> [8]*5
    assert compute_iter_schedule(4, 40) == [8, 8, 8, 8, 8]
    # 7 -> count=8, 5 odd -> [4]*8 last += 8
    sched = compute_iter_schedule(7, 40)
    assert sched[:-1] == [4] * 7 and sum(sched) == 40
    assert compute_iter_schedule(0, 40) == []


def test_generate_candidates_filters():
    tok = make_tok()
    fw = default_filter_words()
    v = tok.vocab_size

    def fake_mlm(ids, mask):
        # favor 'cat' (a real single token) everywhere, with big logits
        logits = np.zeros((ids.shape[0], ids.shape[1], v), np.float32)
        logits[:, :, tok.vocab["cat"]] = 5.0
        logits[:, :, tok.vocab["hat"]] = 4.0
        logits[:, :, tok.vocab["the"]] = 3.0  # filtered (stopword)
        logits[:, :, tok.vocab["dog"]] = 2.0
        return logits

    cands = generate_candidates("what color is the dog", tok, fake_mlm, fw)
    # 'color' is a filler word (filtered); 'dog' is substitutable
    assert cands.candidate_lists[4] is not None
    assert "cat" in cands.candidate_lists[4]
    assert "the" not in cands.candidate_lists[4]  # stopword filtered
    assert "dog" not in cands.candidate_lists[4]  # original word filtered
    assert sum(cands.iter_list) == 40
    # attack positions point at the sub-token index + 1 for [CLS]
    wi = cands.attack_word_indices
    assert all(cands.candidate_lists[i] for i in wi)


def test_select_substitutions_greedy_gate():
    tok = make_tok()
    d = 8
    s = 25
    cands = WordCandidates(
        words=["what", "color", "is", "the", "dog"],
        spans=[(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)],
        candidate_lists=[None, None, None, None, ["cat", "hat"]],
        iter_list=[20, 20],
    )
    pos = cands.attack_positions[0]
    rng = np.random.default_rng(0)
    ori_emb = rng.normal(size=(s, d)).astype(np.float32)
    grad = np.zeros((1, d), np.float32)
    grad[0, 0] = 1.0

    cat_emb = ori_emb.copy()
    hat_emb = ori_emb.copy()

    def embed_texts(texts):
        out = []
        for t in texts:
            if "cat" in t:
                e = cat_emb.copy()
                e[pos, 0] += 2.0  # aligned with grad -> high dir_sim
            else:
                e = hat_emb.copy()
                e[pos, 0] -= 2.0  # anti-aligned
            out.append(e)
        return np.stack(out)

    def gate(ref, texts):
        return np.array([0.99] * len(texts), np.float32)

    new_text, ops = select_substitutions(
        "what color is the dog", "what color is the dog", grad, cands,
        ori_emb, embed_texts, gate,
    )
    assert new_text == "what color is the cat"
    assert ops == [("dog", "cat")]

    # gate rejection blocks the swap
    def strict_gate(ref, texts):
        return np.array([0.5] * len(texts), np.float32)

    same_text, ops2 = select_substitutions(
        "what color is the dog", "what color is the dog", grad, cands,
        ori_emb, embed_texts, strict_gate,
    )
    assert same_text == "what color is the dog" and ops2 == []


def test_apply_substitutions_to_paraphrase():
    out = apply_substitutions_to_paraphrase(
        ["the", "dog", "is", "red", "dog"], [("dog", "cat")]
    )
    assert out == ["the", "cat", "is", "red", "cat"]


def test_filter_answer_words():
    assert filter_answer_words(["red", "on", "dog"]) == ["red", "dog"]


def test_encode_truncation_and_overflow():
    tok = make_tok()
    long_text = " ".join(["dog"] * 50)
    ids, mask = tok.encode(long_text, max_length=10)
    assert ids.shape == (10,) and mask.sum() == 10
    assert ids[-1] == tok.sep_token_id  # [SEP] survives truncation
    # batch encoding keeps row alignment
    import numpy as np

    bids, bmask = tok.encode_batch(["dog", long_text, ""], max_length=10)
    assert bids.shape == (3, 10)
    assert bmask[2].sum() == 2  # empty text -> [CLS][SEP]


def test_word_spans_with_specials_and_punct():
    tok = make_tok()
    words, subs, spans = tok.word_spans("the [MASK] dog?")
    assert "[mask]" in words[1] or words[1] == "[mask]"
    assert subs[spans[1][0]] == "[MASK]"  # atomic special
    # '?' splits into its own sub-token inside the last word
    last_s, last_e = spans[-1]
    assert last_e - last_s == 2


def test_generate_candidates_no_substitutable():
    tok = make_tok()
    from vqattack_tpu.text.filter_words import default_filter_words

    def fake_mlm(ids, mask):
        import numpy as np

        return np.zeros((ids.shape[0], ids.shape[1], tok.vocab_size), np.float32)

    # all words filtered (stop/filler) -> empty schedule, like the reference
    cands = generate_candidates("what is the", tok, fake_mlm, default_filter_words())
    assert cands.iter_list == []
    assert cands.attack_word_indices == []


def test_select_substitutions_batched_gate_matches_sequential():
    """The speculative batched gate (1 + #acceptances calls) must make the
    exact decisions of the reference's per-trial sequential loop
    (``adv_attack.py:300-324``), including the threshold ratchet and the
    occupied-word skip."""
    rng = np.random.default_rng(3)
    d, s = 8, 25
    words = ["what", "color", "is", "the", "dog"]
    cands = WordCandidates(
        words=words,
        spans=[(i, i + 1) for i in range(len(words))],
        candidate_lists=[["hat", "cat"], None, None, ["a", "red"], ["blue", "frisbee"]],
        iter_list=[10, 10, 10, 10],
    )
    ori_emb = rng.normal(size=(s, d)).astype(np.float32)
    grad = rng.normal(size=(len(cands.attack_positions), d)).astype(np.float32)

    def embed_texts(texts):
        # deterministic pseudo-embedding per sentence content
        out = []
        for t in texts:
            r = np.random.default_rng(zlib.crc32(t.encode()))
            out.append(r.normal(size=(s, d)).astype(np.float32))
        return np.stack(out)

    def gate_value(text):
        # deterministic in [0.9, 1.0): some accept, some reject at 0.95
        return 0.9 + (zlib.crc32(("g" + text).encode()) % 1000) / 10000.0

    calls = {"n": 0}

    def batched_gate(ref, texts):
        calls["n"] += 1
        return np.array([gate_value(t) for t in texts], np.float32)

    question = "what color is the dog"
    got_text, got_ops = select_substitutions(
        question, question, grad, cands, ori_emb, embed_texts, batched_gate,
        sim_threshold=0.95,
    )

    # sequential reference: the pre-batching greedy loop, verbatim semantics
    adv_words = question.split(" ")
    entries, sentences = [], []
    max_pos = min(25, ori_emb.shape[0]) - 1
    for p, (wi, pos) in enumerate(
        zip(cands.attack_word_indices, cands.attack_positions)
    ):
        if pos >= max_pos:
            continue
        for ci, cand in enumerate(cands.candidate_lists[wi]):
            trial = list(adv_words)
            trial[wi] = cand
            sentences.append(" ".join(trial))
            entries.append((wi, ci, p, pos))
    embs = embed_texts(sentences)
    dir_sims = np.empty(len(entries), np.float32)
    for n, (wi, ci, p, pos) in enumerate(entries):
        dvec = embs[n, pos] - ori_emb[pos]
        g = grad[p]
        denom = max(np.linalg.norm(dvec) * np.linalg.norm(g), 1e-6)
        dir_sims[n] = float(np.dot(dvec, g) / denom)
    order = np.argsort(-dir_sims)
    occupied, ops, threshold, current = set(), [], 0.95, list(adv_words)
    for n in order:
        wi, ci, _, _ = entries[n]
        if wi in occupied:
            continue
        trial = list(current)
        trial[wi] = cands.candidate_lists[wi][ci]
        sim = gate_value(" ".join(trial))
        if sim > threshold:
            threshold = sim
            occupied.add(wi)
            current = trial
            ops.append((adv_words[wi], cands.candidate_lists[wi][ci]))
    assert got_text == " ".join(current)
    assert got_ops == ops
    assert len(ops) >= 1  # scenario must exercise acceptance + re-scoring
    assert calls["n"] == 1 + len(ops)  # one batched call per generation


def test_pad_to_bucket_and_empty_text_rows():
    from vqattack_tpu.text.similarity import pad_to_bucket

    padded, n = pad_to_bucket(["a", "b", "c"])
    assert n == 3 and len(padded) == 4 and padded[3] == ""
    padded, n = pad_to_bucket([])
    assert n == 0 and len(padded) == 1
    padded, n = pad_to_bucket(["x"] * 8)
    assert n == 8 and len(padded) == 8

    # the tokenizer must encode the "" padding rows without error
    tok = make_tok()
    ids, mask = tok.encode_batch(["what color", ""], 10)
    assert ids.shape == (2, 10)
    assert mask[1].sum() == 2  # [CLS] [SEP]


def test_select_substitutions_multi_matches_per_sample():
    """Bucket-level selection must reproduce each sample's per-sample result
    with gate rounds batched across samples (1 + max acceptances calls)."""
    from vqattack_tpu.attacks.text_attack import (
        SubstitutionRequest,
        select_substitutions_multi,
    )

    rng = np.random.default_rng(7)
    d, s = 8, 25

    def embed_texts(texts):
        out = []
        for t in texts:
            r = np.random.default_rng(zlib.crc32(t.encode()))
            out.append(r.normal(size=(s, d)).astype(np.float32))
        return np.stack(out)

    def gate_value(ref, text):
        return 0.9 + (zlib.crc32((ref + "|" + text).encode()) % 1000) / 10000.0

    def gate_scores(ref, texts):
        return np.array([gate_value(ref, t) for t in texts], np.float32)

    pair_calls = {"n": 0}

    def gate_pairs(refs, texts):
        pair_calls["n"] += 1
        return np.array(
            [gate_value(r, t) for r, t in zip(refs, texts)], np.float32
        )

    questions = [
        "what color is the dog",
        "is the cat red",
        "what is playing",   # will have no candidates -> early-out
    ]
    cand_lists = [
        [["hat", "cat"], None, None, ["a", "red"], ["blue", "frisbee"]],
        [None, None, ["dog", "hat"], ["blue"]],
        [None, None, None],
    ]
    reqs = []
    for q, cl in zip(questions, cand_lists):
        words = q.split(" ")
        cands = WordCandidates(
            words=words,
            spans=[(i, i + 1) for i in range(len(words))],
            candidate_lists=cl,
            iter_list=[10, 10],
        )
        n_attack = len(cands.attack_word_indices)
        grad = rng.normal(size=(max(n_attack, 1), d)).astype(np.float32)
        ori_emb = rng.normal(size=(s, d)).astype(np.float32)
        reqs.append(SubstitutionRequest(q, q, grad, cands, ori_emb, 0.95))

    got = select_substitutions_multi(reqs, embed_texts, gate_pairs)

    want, max_acc = [], 0
    for r in reqs:
        want.append(
            select_substitutions(
                r.adv_text, r.ori_text, r.text_grad, r.cands, r.ori_emb,
                embed_texts, lambda ref, ts: gate_scores(ref, ts),
                sim_threshold=r.sim_threshold,
            )
        )
        max_acc = max(max_acc, len(want[-1][1]))
    assert got == want
    assert max_acc >= 1  # scenario must exercise an acceptance round
    assert pair_calls["n"] == 1 + max_acc
    assert got[2] == (questions[2], [])  # no-candidate early-out preserved


def test_scores_pairs_default_matches_scores():
    from vqattack_tpu.text.similarity import NullGate, SimilarityGate

    class FakeGate(SimilarityGate):
        def scores(self, reference, candidates):
            return np.array(
                [0.9 + (abs(hash((reference, c))) % 100) / 1000.0
                 for c in candidates],
                np.float32,
            )

    g = FakeGate()
    refs = ["q one", "q two", "q one", "q two"]
    texts = ["a", "b", "c", "d"]
    got = g.scores_pairs(refs, texts)
    want = [float(g.scores(r, [t])[0]) for r, t in zip(refs, texts)]
    assert np.allclose(got, want)
    assert np.all(NullGate().scores_pairs(refs, texts) == 1.0)


def test_generate_candidates_batch_matches_per_question():
    """Chunked batched candidate generation must reproduce per-question
    results with ceil(#substitutable-questions / chunk) MLM calls."""
    from vqattack_tpu.attacks.text_attack import generate_candidates_batch

    tok = make_tok()
    vocab = len(tok.vocab) if hasattr(tok, "vocab") else 120

    calls = {"n": 0}

    def mlm_logits(ids, mask):
        calls["n"] += 1
        out = np.zeros((*ids.shape, vocab), np.float32)
        for b in range(ids.shape[0]):
            r = np.random.default_rng(int(ids[b].sum()))
            out[b] = r.normal(size=(ids.shape[1], vocab)).astype(np.float32)
        return out

    fw = frozenset({"the", "is", "a", "what"})
    questions = [
        "what color is the dog",
        "the cat is playing",
        "what is the a",          # everything filtered -> no MLM row
        "dog cat hat",
    ]
    got = generate_candidates_batch(
        questions, tok, mlm_logits, fw, max_length=16, max_mlm_batch=2
    )
    n_batch_calls = calls["n"]
    assert n_batch_calls == 2  # 3 substitutable questions, chunk 2 -> 2 calls

    for q, g in zip(questions, got):
        calls["n"] = 0
        single = generate_candidates(q, tok, mlm_logits, fw, max_length=16)
        assert g.words == single.words
        assert g.spans == single.spans
        assert g.candidate_lists == single.candidate_lists
        assert g.iter_list == single.iter_list
    assert got[2].iter_list == [] and all(c is None for c in got[2].candidate_lists)
    assert any(c for c in got[0].candidate_lists)  # scenario non-trivial


def test_generate_candidates_topk_fn_matches_logits_fn():
    from vqattack_tpu.attacks.text_attack import generate_candidates_batch
    """The device-side top-k path (mlm_topk_fn, round 5) must select the
    identical candidates as the full-logits path."""
    rng = np.random.default_rng(3)
    tok = make_tok()
    fw = default_filter_words()
    v = tok.vocab_size

    def logits_of(ids):
        r = np.random.default_rng(int(ids.sum()) % 2**31)
        return r.normal(size=(ids.shape[0], ids.shape[1], v)).astype(np.float32)

    def mlm_logits(ids, mask):
        return logits_of(ids)

    def mlm_topk(ids, mask, k=5):
        li = logits_of(ids)
        idx = np.argsort(-li, axis=-1)[..., :k]
        return np.take_along_axis(li, idx, axis=-1), idx

    questions = ["what color is the dog", "dog cat hat", "what is the"]
    a = generate_candidates_batch(questions, tok, mlm_logits, fw,
                                  max_length=16, score_threshold=0.0)
    b = generate_candidates_batch(questions, tok, None, fw,
                                  max_length=16, score_threshold=0.0,
                                  mlm_topk_fn=mlm_topk)
    for x, y in zip(a, b):
        assert x.words == y.words
        assert x.candidate_lists == y.candidate_lists
        assert x.iter_list == y.iter_list
