"""Shape/behavior tests for the core model family (ViT, FusionBert, ALBEF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA, mlm_random_mask
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.models.vit import VisionTransformer

CFG = tiny_test_config()


def test_vit_feature_taps():
    """ViT returns embedding output + one tap per block (vit.py:160-177)."""
    model = VisionTransformer(CFG.albef.vit)
    pixels = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), pixels)
    out, feats = model.apply(params, pixels)
    n = CFG.albef.vit.seq_len
    assert out.shape == (2, n, CFG.albef.vit.hidden_size)
    assert feats.shape == (2, CFG.albef.vit.depth + 1, n, CFG.albef.vit.hidden_size)
    # final norm applies to the output only, not the last tap
    assert not np.allclose(np.asarray(out), np.asarray(feats[:, -1]))


def test_fusion_bert_modes():
    """text mode runs [0,fusion); fusion runs [fusion,L); multi_modal all."""
    cfg = CFG.albef.bert
    model = FusionBert(cfg, with_mlm_head=True)
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    enc = jnp.zeros((2, 5, cfg.encoder_width))
    enc_mask = jnp.ones((2, 5), dtype=jnp.int32)
    params = model.init(jax.random.key(0), ids, mask, enc, enc_mask)

    _, feats_text, _ = model.apply(params, ids, mask, mode="text")
    assert feats_text.shape[1] == cfg.fusion_layer + 1

    _, feats_mm, logits = model.apply(params, ids, mask, enc, enc_mask, mode="multi_modal")
    assert feats_mm.shape[1] == cfg.num_layers + 1
    assert logits.shape == (2, 8, cfg.vocab_size)

    # fusion mode consumes pre-embedded inputs
    embeds = model.apply(params, ids, method=FusionBert.embed)
    last, feats_fu = model.apply(
        params, embeds, mask, enc, enc_mask, mode="fusion", method=FusionBert.encode
    )
    assert feats_fu.shape[1] == cfg.num_layers - cfg.fusion_layer + 1


def test_fusion_bert_mask_matters():
    cfg = CFG.albef.bert
    model = FusionBert(cfg)
    ids = jnp.array([[5, 6, 7, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    mask1 = jnp.array([[1, 1, 1, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    mask2 = jnp.ones_like(mask1)
    enc = jnp.zeros((1, 5, cfg.encoder_width))
    enc_mask = jnp.ones((1, 5), dtype=jnp.int32)
    params = model.init(jax.random.key(0), ids, mask1, enc, enc_mask)
    out1, _, _ = model.apply(params, ids, mask1, mode="text")
    out2, _, _ = model.apply(params, ids, mask2, mode="text")
    assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]), atol=1e-6)


def test_mlm_random_mask():
    rng = jax.random.key(1)
    ids = jnp.array([[101, 5, 6, 7, 8, 9, 10, 0, 0, 0]] * 64, dtype=jnp.int32)
    masked, labels = mlm_random_mask(
        rng, ids, vocab_size=CFG.albef.bert.vocab_size, mask_token_id=103,
        pad_token_id=0, cls_token_id=101, mlm_probability=0.5,
    )
    m, l = np.asarray(masked), np.asarray(labels)
    # pad and cls never masked
    assert (m[:, 0] == 101).all() and (m[:, 7:] == 0).all()
    assert (l[:, 0] == -100).all() and (l[:, 7:] == -100).all()
    # some positions masked, labels hold original ids there
    changed = l != -100
    assert changed.sum() > 0
    assert (np.where(changed, np.asarray(ids), 0) == np.where(changed, l, 0)).all()
    # determinism under the same key
    m2, _ = mlm_random_mask(
        rng, ids, vocab_size=CFG.albef.bert.vocab_size, mask_token_id=103,
        pad_token_id=0, cls_token_id=101, mlm_probability=0.5,
    )
    assert (np.asarray(m2) == m).all()


def test_albef_pretrain_gen_feats():
    model = AlbefPretrain(CFG.albef)
    pixels = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    params = model.init(jax.random.key(0), pixels, ids, mask)
    img_feats, txt_feats, mlm_logits = model.apply(
        params, pixels, ids, mask, method=AlbefPretrain.gen_feats
    )
    assert img_feats.shape[1] == CFG.albef.vit.depth + 1
    assert txt_feats.shape[1] == CFG.albef.bert.num_layers + 1
    assert mlm_logits.shape == (2, 8, CFG.albef.bert.vocab_size)

    # embedding-differentiable path agrees with the ids path when embeds match
    embeds = model.apply(params, ids, method=AlbefPretrain.embed_text)
    img2, txt2 = model.apply(
        params, pixels, embeds, mask, method=AlbefPretrain.gen_feats_from_embeds
    )
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img_feats), atol=1e-5)
    np.testing.assert_allclose(np.asarray(txt2), np.asarray(txt_feats), atol=1e-5)


def test_albef_vqa_rank_answer():
    cfg = CFG.albef
    model = AlbefVQA(cfg)
    b, n_ans, l_ans, k = 2, 10, 4, 4
    pixels = jnp.zeros((b, 32, 32, 3))
    ids = jnp.ones((b, 8), dtype=jnp.int32)
    mask = jnp.ones((b, 8), dtype=jnp.int32)
    rng = np.random.default_rng(0)
    answer_ids = jnp.asarray(
        rng.integers(1, cfg.bert.vocab_size, size=(n_ans, l_ans)), dtype=jnp.int32
    )
    answer_ids = answer_ids.at[:, 0].set(2)  # shared BOS
    answer_mask = jnp.ones((n_ans, l_ans), dtype=jnp.int32)
    params = model.init(jax.random.key(0), pixels, ids, mask, answer_ids, answer_mask, k)
    topk_ids, topk_probs = model.apply(
        params, pixels, ids, mask, answer_ids, answer_mask, k
    )
    assert topk_ids.shape == (b, k) and topk_probs.shape == (b, k)
    p = np.asarray(topk_probs)
    assert (p[:, :-1] >= p[:, 1:] - 1e-6).all()  # sorted desc
    assert ((0 <= np.asarray(topk_ids)) & (np.asarray(topk_ids) < n_ans)).all()


def test_decoder_is_causal():
    """Answer decoder: changing a later token must not affect earlier logits."""
    cfg = CFG.albef
    model = AlbefVQA(cfg)
    b = 1
    pixels = jnp.zeros((b, 32, 32, 3))
    qids = jnp.ones((b, 8), dtype=jnp.int32)
    qmask = jnp.ones((b, 8), dtype=jnp.int32)
    answer_ids = jnp.array([[2, 5, 6, 7]], dtype=jnp.int32)
    answer_mask = jnp.ones((1, 4), dtype=jnp.int32)
    params = model.init(jax.random.key(0), pixels, qids, qmask, answer_ids, answer_mask, 1)

    states = model.apply(params, pixels, qids, qmask, method=AlbefVQA.encode_question)
    nll1 = model.apply(
        params, answer_ids, answer_mask, states, qmask, method=AlbefVQA.answer_nll
    )
    answer_ids2 = answer_ids.at[0, 3].set(9)
    nll2 = model.apply(
        params, answer_ids2, answer_mask, states, qmask, method=AlbefVQA.answer_nll
    )
    # positions predicting tokens 1,2 (i.e. nll[:, :2]) are unaffected
    np.testing.assert_allclose(np.asarray(nll1[:, :2]), np.asarray(nll2[:, :2]), atol=1e-6)
    assert not np.allclose(np.asarray(nll1[:, 2]), np.asarray(nll2[:, 2]))


def test_patch_embed_matches_conv():
    """The matmul formulation of PatchEmbed (round-5 MXU lever) is the same
    math as the stride-p VALID conv it replaced: identical param tree
    (HWIO kernel under proj/) and numerically-equal output."""
    from flax import linen as nn

    from vqattack_tpu.models.layers import PatchEmbed

    p, d = 8, 32
    pe = PatchEmbed(patch_size=p, hidden_size=d)
    px = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 24, 3)), jnp.float32)
    params = pe.init(jax.random.key(1), px)
    k = params["params"]["proj"]["kernel"]
    b = params["params"]["proj"]["bias"]
    assert k.shape == (p, p, 3, d) and b.shape == (d,)
    out = pe.apply(params, px)

    conv = nn.Conv(d, kernel_size=(p, p), strides=(p, p), padding="VALID")
    ref = conv.apply({"params": {"kernel": k, "bias": b}}, px)
    ref = ref.reshape(ref.shape[0], -1, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
