"""VLMo model family: rel-pos index parity vs reference math, MoME routing,
attack feature shapes, VQA head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.vlmo import VLMo, build_relative_position_index

CFG = tiny_test_config().vlmo  # 32px, patch 16 -> 2x2 window, depth 4, text 8


def torch_reference_index(window, max_text_len, init_len=196):
    """Independent torch transcription of the reference's index math
    (vlmo_module.py:818-883) used as golden."""
    torch = pytest.importorskip("torch")
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    all_num = num_rel + 2 * init_len + 2
    coords = torch.stack(
        torch.meshgrid([torch.arange(wh), torch.arange(ww)], indexing="ij")
    ).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    img = torch.zeros((wh * ww + 1,) * 2, dtype=rel.dtype)
    img[1:, 1:] = rel.sum(-1)
    img[0, :] = num_rel - 3
    img[:, 0] = num_rel - 2
    img[0, 0] = num_rel - 1

    tpos = torch.arange(max_text_len - 1)
    tmat = tpos.unsqueeze(-2) - tpos.unsqueeze(-1)
    tmat = tmat - (2 - init_len) + num_rel + 2
    txt = torch.zeros((max_text_len,) * 2, dtype=rel.dtype)
    txt[1:, 1:] = tmat
    txt[0, :] = all_num - 3
    txt[:, 0] = all_num - 2
    txt[0, 0] = all_num - 1

    t2i = torch.ones(max_text_len, wh * ww + 1) * num_rel
    i2t = torch.ones(wh * ww + 1, max_text_len) * (num_rel + 1)
    joint = torch.cat(
        [torch.cat([txt, t2i], 1), torch.cat([i2t, img], 1)], 0
    )
    return img.numpy(), txt.numpy(), joint.numpy(), all_num


def test_rel_pos_index_parity():
    tables = build_relative_position_index((2, 2), 8)
    img, txt, joint, all_num = torch_reference_index((2, 2), 8)
    np.testing.assert_array_equal(tables["image"], img)
    np.testing.assert_array_equal(tables["text"], txt)
    np.testing.assert_array_equal(tables["joint"], joint)
    assert tables["all_num_relative_distance"] == all_num
    # larger window too (14x14 = the 224px case)
    t2 = build_relative_position_index((14, 14), 40)
    i2, x2, j2, a2 = torch_reference_index((14, 14), 40)
    np.testing.assert_array_equal(tables_j := t2["joint"], j2)
    assert t2["all_num_relative_distance"] == a2


@pytest.fixture(scope="module")
def vlmo_setup():
    model = VLMo(CFG)
    b, t = 2, CFG.max_text_len
    px = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((b, t), jnp.int32).at[:, 0].set(2)
    masks = jnp.ones((b, t), jnp.int32).at[:, 6:].set(0)
    params = jax.jit(
        lambda k: model.init(k, ids, masks, px, method=VLMo.init_all)
    )(jax.random.key(0))
    return model, params, px, ids, masks


def test_vlmo_infer_shapes(vlmo_setup):
    model, params, px, ids, masks = vlmo_setup
    out = model.apply(params, ids, masks, px)
    b, t = ids.shape
    s_img = CFG.image_seq_len
    assert out["text_feats"].shape == (b, t, CFG.hidden_size)
    assert out["image_feats"].shape == (b, s_img, CFG.hidden_size)
    assert out["cls_feats"].shape == (b, CFG.hidden_size)
    assert out["feats"].shape == (b, CFG.depth + 1, t + s_img, CFG.hidden_size)


def test_vlmo_attack_feats(vlmo_setup):
    model, params, px, ids, masks = vlmo_setup
    cls_f, layer_cls, feats, token_mask = model.apply(
        params, px, ids, masks, method=VLMo.attack_feats
    )
    b, t = ids.shape
    assert layer_cls.shape == (b, CFG.depth + 1, CFG.hidden_size)
    assert token_mask.shape == (b, t + CFG.image_seq_len)
    # text part of the token mask equals the text attention mask
    np.testing.assert_array_equal(np.asarray(token_mask[:, :t]), np.asarray(masks))
    assert np.asarray(token_mask[:, t:]).all()


def test_vlmo_attack_mlm_and_vqa(vlmo_setup):
    model, params, px, ids, masks = vlmo_setup
    mlm_logits, layer_cls, feats, _ = model.apply(
        params, px, ids, masks, method=VLMo.attack_mlm
    )
    assert mlm_logits.shape == (2, CFG.max_text_len, CFG.vocab_size)
    logits = model.apply(params, px, ids, masks, method=VLMo.vqa_logits)
    assert logits.shape == (2, CFG.vqa_label_size)


def test_vlmo_from_embeds_matches_ids_path(vlmo_setup):
    model, params, px, ids, masks = vlmo_setup
    embeds = model.apply(params, ids, method=VLMo.embed_text)
    out1 = model.apply(params, px, ids, masks, method=VLMo.attack_feats)
    out2 = model.apply(params, px, embeds, masks, method=VLMo.attack_feats_from_embeds)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vlmo_text_and_image_towers(vlmo_setup):
    model, params, px, ids, masks = vlmo_setup
    t_out = model.apply(params, ids, masks, method=VLMo.infer_text)
    assert t_out["mlm_logits"].shape == (2, CFG.max_text_len, CFG.vocab_size)
    i_out = model.apply(params, px, method=VLMo.infer_image)
    assert i_out["image_feats"].shape == (2, CFG.image_seq_len, CFG.hidden_size)


def test_vlmo_mask_affects_output(vlmo_setup):
    model, params, px, ids, masks = vlmo_setup
    out1 = model.apply(params, ids, masks, px)
    out2 = model.apply(params, ids, jnp.ones_like(masks), px)
    assert not np.allclose(
        np.asarray(out1["cls_feats"]), np.asarray(out2["cls_feats"]), atol=1e-6
    )


def test_vlmo_nlvr2_head():
    import dataclasses as dc

    cfg = dc.replace(CFG, type_vocab_size=3)
    model = VLMo(cfg, with_nlvr2_head=True)
    b, t = 2, cfg.max_text_len
    rng = np.random.default_rng(0)
    px1 = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    px2 = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((b, t), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(
        lambda k: model.init(k, ids, mask, px1, method=VLMo.init_all)
    )(jax.random.key(0))
    logits = model.apply(params, px1, px2, ids, mask, method=VLMo.nlvr2_logits)
    assert logits.shape == (b, 2)
    # image order matters (distinct modality-type rows)
    logits_sw = model.apply(params, px2, px1, ids, mask, method=VLMo.nlvr2_logits)
    assert not np.allclose(np.asarray(logits), np.asarray(logits_sw), atol=1e-6)


def test_vlmo_nlvr2_default_config_widens_token_types():
    """with_nlvr2_head must widen the modality table to 3 rows even when the
    config says 2 (the reference widens at load, vlmo_module.py:291-296) —
    an unwidened table makes row-2 lookups silently NaN."""
    model = VLMo(CFG, with_nlvr2_head=True)  # CFG.type_vocab_size == 2
    b, t = 1, CFG.max_text_len
    rng = np.random.default_rng(1)
    px1 = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    px2 = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((b, t), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(
        lambda k: model.init(k, ids, mask, px1, method=VLMo.init_all)
    )(jax.random.key(0))
    tbl = params["params"]["token_type_embeddings"]["embedding"]
    assert tbl.shape[0] == 3
    logits = model.apply(params, px1, px2, ids, mask, method=VLMo.nlvr2_logits)
    assert np.isfinite(np.asarray(logits)).all()


def test_widen_token_type_embeddings_row_copy():
    from vqattack_tpu.checkpoint.convert import widen_token_type_embeddings

    tree = {"token_type_embeddings": {"embedding": np.arange(8.0).reshape(2, 4)}}
    out = widen_token_type_embeddings(tree, 3)
    emb = out["token_type_embeddings"]["embedding"]
    assert emb.shape == (3, 4)
    # the new row replicates the image row (reference vlmo_module.py:296)
    np.testing.assert_array_equal(emb[2], emb[1])
    # already-wide tables pass through untouched
    out2 = widen_token_type_embeddings(out, 3)
    np.testing.assert_array_equal(
        out2["token_type_embeddings"]["embedding"], emb
    )


def test_precomputed_rel_biases_identical(vlmo_setup):
    """Hoisted per-layer bias stack reproduces the in-loop gather exactly."""
    model, params, px, ids, masks = vlmo_setup
    biases = model.apply(params, method=VLMo.precompute_joint_biases)
    assert biases.shape[0] == CFG.depth
    out1 = model.apply(params, px, ids, masks, method=VLMo.attack_feats)
    out2 = model.apply(params, px, ids, masks, biases, method=VLMo.attack_feats)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vlmo_large_and_base_plus_presets():
    """Registry presets mirror the reference's model zoo
    (``multiway_transformer.py:394-412``)."""
    from vqattack_tpu.config import vlmo_base_plus_config, vlmo_large_config

    lg = vlmo_large_config()
    assert (lg.hidden_size, lg.depth, lg.num_heads, lg.vlffn_start_layer) == (
        1024, 24, 16, 21)
    assert lg.need_relative_position_embed and not lg.use_abs_pos_emb
    assert lg.layer_scale_init is not None

    bp = vlmo_base_plus_config()
    assert (bp.hidden_size, bp.depth, bp.num_heads, bp.vlffn_start_layer) == (
        544, 24, 16, 21)
    assert bp.use_abs_pos_emb and not bp.need_relative_position_embed
    assert bp.layer_scale_init is None
    # head dim 544/16=34 divides evenly; geometry consistent
    assert bp.hidden_size % bp.num_heads == 0


def test_vlffn_itc_branch_and_pretrain_loss():
    """infer_text/infer_image vlffn=True reproduce the reference's
    cls_vlffn_feats structure (``vlmo_module.py:973-992``) and
    vlmo_pretrain_loss combines mlm+itc+itm finitely with flowing grads."""
    import jax
    import jax.numpy as jnp

    from vqattack_tpu.config import tiny_test_config
    from vqattack_tpu.models.vlmo import VLMo
    from vqattack_tpu.train.objectives import vlmo_pretrain_loss

    cfg = tiny_test_config().vlmo
    model = VLMo(cfg)
    b, t = 3, cfg.max_text_len
    px = jax.random.uniform(jax.random.key(0), (b, 32, 32, 3), minval=-1)
    ids = jnp.ones((b, t), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    params = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(1))

    # init_all materialized the new heads
    p = params["params"]
    assert "itc_vl_text_proj" in p and "itc_vl_image_proj" in p
    assert p["logit_scale"]["scale"].shape == ()
    import numpy as np
    np.testing.assert_allclose(p["logit_scale"]["scale"], np.log(1 / 0.07),
                               rtol=1e-6)

    ti = model.apply(params, ids, mask, vlffn=True, method=VLMo.infer_text)
    ii = model.apply(params, px, vlffn=True, method=VLMo.infer_image)
    assert ti["cls_vlffn_feats"].shape == (b, cfg.hidden_size)
    assert ii["cls_vlffn_feats"].shape == (b, cfg.hidden_size)
    # the vl-expert branch is a different computation than the base cls path
    assert not np.allclose(ti["cls_vlffn_feats"], ti["cls_feats"])
    # vlffn=False keeps the original output surface
    assert "cls_vlffn_feats" not in model.apply(
        params, ids, mask, method=VLMo.infer_text)

    batch = {
        "pixels": px, "text_ids": ids, "text_mask": mask,
        "mlm_ids": ids.at[:, 2].set(4),
        "mlm_labels": jnp.full((b, t), -100, jnp.int32).at[:, 2].set(5),
    }

    def loss(p_):
        return vlmo_pretrain_loss(model, p_, batch, jax.random.key(2))[0]

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    g = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), grads)
    leaves = jax.tree_util.tree_leaves(g)
    assert sum(leaves) > 0
    # the vl ITC heads and both logit scales receive gradient
    assert sum(jax.tree_util.tree_leaves(
        g["params"]["itc_vl_text_proj"])) > 0
    assert sum(jax.tree_util.tree_leaves(g["params"]["logit_scale"])) > 0
    assert sum(jax.tree_util.tree_leaves(g["params"]["logit_vl_scale"])) > 0

    # weight gating skips terms entirely — including explicit zeros, which
    # must NOT fall back to the 1.0 defaults
    l_mlm, m_mlm = vlmo_pretrain_loss(
        model, params, batch, jax.random.key(2), weights={"mlm": 1, "itc": 0, "itm": 0})
    assert "itm_loss" not in m_mlm and "itc_loss" not in m_mlm
    assert np.isfinite(float(l_mlm))

    # joint-trunk MLM is scaled 0.25 like the reference's compute_mlm
    # (objectives.py:31 `mlm_loss * 0.25`)
    from vqattack_tpu.train.objectives import masked_lm_loss

    out = model.apply(params, batch["mlm_ids"], batch["text_mask"],
                      batch["pixels"], method=VLMo.infer)
    mlm_logits = model.apply(params, out["text_feats"],
                             method=lambda m, x: m.mlm_score(x))
    raw = masked_lm_loss(mlm_logits, batch["mlm_labels"])
    np.testing.assert_allclose(float(l_mlm), 0.25 * float(raw), rtol=1e-6)
