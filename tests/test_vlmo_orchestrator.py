"""End-to-end tiny VLMo attack pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks.vlmo_orchestrator import VlmoAttackPipeline
from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.models.vlmo import VLMo
from vqattack_tpu.text.similarity import NullGate
from vqattack_tpu.text.tokenizer import WordPieceTokenizer

WORDS = ["what", "color", "is", "the", "dog", "cat", "red", "blue", "hat", "a"]


@pytest.fixture(scope="module")
def pipeline():
    tok = WordPieceTokenizer.toy(WORDS)
    base = tiny_test_config()
    vlmo_cfg = dataclasses.replace(base.vlmo, vocab_size=tok.vocab_size)
    cfg = dataclasses.replace(base, vlmo=vlmo_cfg)

    model = VLMo(vlmo_cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, vlmo_cfg.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(0))
    vparams = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(1))

    mlm_cfg = dataclasses.replace(
        base.albef.bert, vocab_size=tok.vocab_size,
        fusion_layer=base.albef.bert.num_layers,
    )
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids[:, :8], mask[:, :8]))(jax.random.key(2))

    pipe = VlmoAttackPipeline(
        cfg, model, sparams, vparams, tok, NullGate(),
        mlm_model=mlm, mlm_params=mparams,
        id2answer={i: f"ans{i}" for i in range(vlmo_cfg.vqa_label_size)},
        use_pallas=False,
    )
    return pipe


def _px():
    return np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)


def test_vlmo_feature_attack(pipeline):
    px = _px()
    res = pipeline.attack_sample(px, "what color is the dog", "2001", None, None)
    assert res.old_alg == 1
    assert (np.abs(res.adv_image - px) <= pipeline.cfg.attack.eps + 1e-5).all()
    assert res.feat_losses.shape[0] == pipeline.cfg.attack.num_iters
    assert np.abs(res.adv_image - px).max() > 1e-3


def test_vlmo_mar_attack_and_eval(pipeline):
    px = _px()
    res = pipeline.attack_sample(
        px, "what color is the dog", "2002",
        paraphrase="the dog is red.", target_answer="red",
        all_correct_answers=["red", "blue"],
    )
    assert res.old_alg == 0 and res.mlm_losses is not None
    pred, ans = pipeline.evaluate_victim(res.adv_image, res.adv_text)
    assert ans == f"ans{pred}"


def test_vlmo_recover_probe(pipeline):
    from vqattack_tpu.attacks.mar_labels import build_mar_labels

    px = jnp.asarray(_px())
    mar = build_mar_labels(
        "the dog is red.", "red", [], pipeline.tokenizer,
        pipeline.max_text_len, 2,
    )
    out = pipeline.recover_answer_probe(px, mar)
    assert isinstance(out, str) and len(out) > 0


def test_vlmo_evaluate_victim_batch_matches_single(pipeline):
    rng = np.random.default_rng(5)
    images = [rng.uniform(-1, 1, _px().shape).astype(np.float32) for _ in range(3)]
    texts = ["what color is the dog?", "is the cat red?", "dog cat hat?"]
    got = pipeline.evaluate_victim_batch(images, texts)
    assert len(got) == 3
    for (img, txt), (pid, ans) in zip(zip(images, texts), got):
        one_pid, one_ans = pipeline.evaluate_victim(img, txt)
        assert (one_pid, one_ans) == (pid, ans)


def test_vlmo_evaluate_victim_batch_empty(pipeline):
    assert pipeline.evaluate_victim_batch([], []) == []
