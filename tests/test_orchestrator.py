"""End-to-end tiny attack: tiny ALBEF surrogate/victim + toy tokenizer run
the full per-sample pipeline (SURVEY §4c analogue at test scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks.mar_labels import build_mar_labels
from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline, save_artifacts
from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.text.similarity import NullGate
from vqattack_tpu.text.tokenizer import WordPieceTokenizer

CFG = tiny_test_config()
WORDS = ["what", "color", "is", "the", "dog", "cat", "red", "blue", "hat",
         "a", "frisbee", "park"]


@pytest.fixture(scope="module")
def pipeline():
    tok = WordPieceTokenizer.toy(WORDS)
    # tiny configs must agree with the toy vocab size
    import dataclasses

    bert = dataclasses.replace(CFG.albef.bert, vocab_size=tok.vocab_size)
    albef_cfg = dataclasses.replace(CFG.albef, bert=bert)
    cfg = dataclasses.replace(CFG, albef=albef_cfg)

    surrogate = AlbefPretrain(albef_cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(surrogate.init)(jax.random.key(0), px, ids, mask)

    mlm_cfg = dataclasses.replace(bert, fusion_layer=bert.num_layers)
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids, mask))(jax.random.key(1))

    victim = AlbefVQA(albef_cfg)
    n_ans, l_ans = 6, 4
    answer_ids = jnp.asarray(
        np.random.default_rng(0).integers(5, tok.vocab_size, (n_ans, l_ans)),
        jnp.int32,
    ).at[:, 0].set(tok.cls_token_id)
    answer_mask = jnp.ones((n_ans, l_ans), jnp.int32)
    vparams = jax.jit(
        lambda k: victim.init(k, px, ids, mask, answer_ids, answer_mask, cfg.k_test)
    )(jax.random.key(2))

    pipe = AlbefAttackPipeline(
        cfg, surrogate, sparams, tok, NullGate(),
        victim=victim, victim_params=vparams,
        mlm_model=mlm, mlm_params=mparams,
        use_pallas=False,  # interpret-mode pallas is slow; covered in test_pgd
    )
    return pipe, answer_ids, answer_mask


def _sample_pixels():
    return np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)


def test_feature_only_attack(pipeline):
    """old_alg==1 path: no paraphrase -> feature-only PGD."""
    pipe, _, _ = pipeline
    px = _sample_pixels()
    res = pipe.attack_sample(px, "what color is the dog", "1001", None, None)
    assert res.old_alg == 1
    a = res.adv_image
    assert (np.abs(a - px) <= pipe.cfg.attack.eps + 1e-5).all()
    assert (a <= 1 + 1e-6).all() and (a >= -1 - 1e-6).all()
    assert res.feat_losses.shape[0] == pipe.cfg.attack.num_iters
    # the adversarial image moved
    assert np.abs(a - px).max() > 1e-3


def test_mar_attack_with_paraphrase(pipeline):
    """old_alg==0: answer appears in the paraphrase -> alternating PGD."""
    pipe, _, _ = pipeline
    px = _sample_pixels()
    res = pipe.attack_sample(
        px, "what color is the dog", "1002",
        paraphrase="the dog is red.", target_answer="red",
        all_correct_answers=["red", "blue"],
    )
    assert res.old_alg == 0
    assert res.mlm_losses is not None and res.mlm_losses.shape[0] >= 1
    assert (np.abs(res.adv_image - px) <= pipe.cfg.attack.eps + 1e-5).all()


def test_victim_eval_and_artifacts(pipeline, tmp_path):
    pipe, answer_ids, answer_mask = pipeline
    px = _sample_pixels()
    res = pipe.attack_sample(px, "what color is the dog", "1003", None, None)
    topk_ids, topk_probs = pipe.evaluate_victim(
        res.adv_image, res.adv_text, answer_ids, answer_mask
    )
    assert topk_ids.shape == (1, pipe.cfg.k_test)
    save_artifacts([res], str(tmp_path))
    assert (tmp_path / "1003.npy").exists()
    assert (tmp_path / "adv_txt_dict.json").exists()


def test_save_artifacts_survive_without_torch(tmp_path, monkeypatch, caplog):
    """With torch unimportable the sweep's primary product (the adversarial
    images + adv-text JSON, ``adv_attack.py:713-715``) must survive as .npy
    with a logged warning, not silently vanish (only the optional
    reference-compatible .pt copy is dropped)."""
    import builtins
    import json
    import logging

    from vqattack_tpu.attacks.orchestrator import AttackResult

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    res = AttackResult(
        qid="77", adv_image=np.zeros((1, 4, 4, 3), np.float32),
        adv_text="what color", old_alg=1,
        feat_losses=np.zeros(2, np.float32), mlm_losses=None,
        num_blocks=1, substitutions=[],
    )
    with caplog.at_level(logging.WARNING):
        save_artifacts([res], str(tmp_path))
    assert (tmp_path / "77.npy").exists()
    assert not (tmp_path / "77.pt").exists()
    assert json.loads((tmp_path / "adv_txt_dict.json").read_text())["77"] == "what color"
    assert any("npy" in r.message for r in caplog.records)


def test_mar_labels_construction():
    tok = WordPieceTokenizer.toy(WORDS)
    mar = build_mar_labels(
        "the dog is red.", "red", ["red", "blue"], tok, max_len=12, max_answers=4
    )
    assert mar.old_alg == 0
    # the masked paraphrase has [MASK] where 'red' was
    assert "[MASK]" in mar.paraphrase_words
    ids = mar.mlm_ids
    assert (ids == tok.mask_token_id).sum() == 1
    # labels: variant 0 supervises exactly the masked position with 'red'
    lab = mar.labels
    assert lab.shape == (4, 12)
    pos = int(np.where(lab[0] != -100)[0][0])
    assert lab[0, pos] == tok.vocab["red"]
    # variant 1 is 'blue' at the same position (same sub-token length)
    assert lab[1, pos] == tok.vocab["blue"]
    # padded variants all ignored
    assert (lab[2] == -100).all() and (lab[3] == -100).all()


def test_mar_labels_no_match():
    tok = WordPieceTokenizer.toy(WORDS)
    mar = build_mar_labels("a cat in the park.", "frisbee", [], tok, max_len=12)
    assert mar.old_alg == 1 and mar.labels is None


def test_evaluate_victim_batch_matches_single(pipeline):
    """One batched rank_answer call must reproduce the per-sample decode
    (including the power-of-two padding rows being sliced away)."""
    pipe, answer_ids, answer_mask = pipeline
    rng = np.random.default_rng(5)
    images = [
        rng.uniform(-1, 1, _sample_pixels().shape).astype(np.float32)
        for _ in range(3)
    ]
    texts = ["what color is the dog", "is the cat red", "dog cat hat"]
    got_ids, got_probs = pipe.evaluate_victim_batch(
        images, texts, answer_ids, answer_mask
    )
    assert got_ids.shape == (3, pipe.cfg.k_test)
    for i, (img, txt) in enumerate(zip(images, texts)):
        one_ids, one_probs = pipe.evaluate_victim(img, txt, answer_ids, answer_mask)
        assert np.array_equal(np.asarray(one_ids)[0], got_ids[i])
        assert np.allclose(np.asarray(one_probs)[0], got_probs[i], atol=1e-5)


def test_evaluate_victim_batch_empty(pipeline):
    pipe, answer_ids, answer_mask = pipeline
    ids, probs = pipe.evaluate_victim_batch([], [], answer_ids, answer_mask)
    assert ids.shape == (0, pipe.cfg.k_test) and probs.shape == (0, pipe.cfg.k_test)
