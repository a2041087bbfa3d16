"""Full PRODUCTION-geometry differential parity (VERDICT round 2, Next #1).

Every other differential stops at 224px/6L/384-d; the geometry the real 5k
sweep runs — 480px (901 image tokens), ViT-B/16 12L/768-d, BERT-base fusion
(``configs/VQA.yaml: image_res 480``), ``rank_answer`` at k=128 over 3,129
answers (``k_test: 128``, ``vqav2_label_size: 3129``), the full VLMo MoME
base @480 with the real ``max_text_len=40`` / ``max_imag_len=901`` rel-pos
index (``vlmo_module.py:826-831``) — executes here against the reference's
imported modules: forward parity, >=4 bit-tracked PGD iterations at
``scan_unroll=1``, and a measured reassociation-drift budget at the
production ``scan_unroll=4``.

Heavy tier (~9-10 min warm-cache on the 1-core CI host; measured 5 passed
in 9:18): marked ``full_geometry`` and excluded from the default lane
(pytest.ini addopts) — run explicitly with ``pytest -m full_geometry``.
``VQATTACK_SKIP_FULL_GEOMETRY=1`` additionally opts out even when the
marker is selected.  Evidence recorded in PARITY.md.
"""

from __future__ import annotations

import dataclasses
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_shim as rs  # noqa: E402

from vqattack_tpu.attacks import albef as albef_losses  # noqa: E402
from vqattack_tpu.attacks import vlmo as vlmo_losses  # noqa: E402
from vqattack_tpu.attacks.pgd import pgd_feature  # noqa: E402
from vqattack_tpu.checkpoint.convert import (  # noqa: E402
    convert_albef_pretrain,
    convert_albef_vqa,
    convert_vlmo,
)
from vqattack_tpu.config import (  # noqa: E402
    ALBEFConfig,
    BertConfig,
    ViTConfig,
    VLMoConfig,
)
from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA  # noqa: E402
from vqattack_tpu.models.vlmo import VLMo as OurVLMo  # noqa: E402

pytestmark = [
    pytest.mark.full_geometry,
    pytest.mark.skipif(
        os.environ.get("VQATTACK_SKIP_FULL_GEOMETRY") == "1",
        reason="full-geometry differentials skipped by VQATTACK_SKIP_FULL_GEOMETRY=1",
    ),
]

EPS, STEP = 0.125, 0.01
SPECIAL_FULL = (103, 0, 101)  # (mask, pad, cls), real 30,522-token vocab
V = 30522
NB_ITER = 4


def _nchw(x):
    return torch.from_numpy(x)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _torch_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _hf_bert_base(fusion_layer=6, layers=12):
    from transformers.models.bert.configuration_bert import BertConfig as HFBertConfig

    return HFBertConfig(
        vocab_size=V, hidden_size=768, num_hidden_layers=layers,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, type_vocab_size=2,
        fusion_layer=fusion_layer, encoder_width=768,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


def _full_vit(ref):
    """ViT-B/16 @ 480px — the production surrogate/victim encoder
    (``models/vit.py:97-177`` at ``VQA.yaml: image_res 480``)."""
    return ref.vit.VisionTransformer(
        img_size=480, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        mlp_ratio=4, qkv_bias=True,
    )


def _full_albef_cfg():
    return ALBEFConfig(
        vit=ViTConfig(),   # defaults ARE the production geometry (480/12L/768)
        bert=BertConfig(),
        embed_dim=256, mlm_probability=0.0, decoder_layers=6,
    )


@pytest.fixture(scope="module")
def albef_full():
    """Reference ALBEF_pre at FULL production geometry + converted params
    (``model_pretrain.py:20-84`` with ViT-B/16@480 + BERT-base fusion 6)."""
    ref = rs.albef_models()
    torch.manual_seed(0)
    pre = ref.pretrain.ALBEF_pre.__new__(ref.pretrain.ALBEF_pre)
    nn.Module.__init__(pre)
    pre.mlm_probability = 0.0
    pre.tokenizer = types.SimpleNamespace(
        pad_token_id=0, cls_token_id=101, mask_token_id=103)
    pre.visual_encoder = _full_vit(ref)
    pre.text_encoder = ref.xbert.BertForMaskedLM(config=_hf_bert_base())
    pre.vision_proj = nn.Linear(768, 256)
    pre.text_proj = nn.Linear(768, 256)
    pre.itm_head = nn.Linear(768, 2)
    pre.temp = nn.Parameter(torch.ones([]) * 0.07)
    pre.eval()

    model = AlbefPretrain(_full_albef_cfg())
    sd = {k: v.detach().numpy() for k, v in pre.state_dict().items()}
    params = {"params": convert_albef_pretrain(sd, depth=12, num_layers=12,
                                               fusion_layer=6)}

    rng = np.random.default_rng(7)
    S = 16  # a realistic question length (VQAv2 questions avg ~7 words)
    ids = rng.integers(1000, 20000, (1, S)).astype(np.int64)
    ids[0, 0] = SPECIAL_FULL[2]
    mask = np.ones((1, S), np.int64)
    px = rng.uniform(-1, 1, (1, 3, 480, 480)).astype(np.float32)
    adv0 = np.clip(px + rng.uniform(-EPS, EPS, px.shape).astype(np.float32),
                   -1, 1)
    return types.SimpleNamespace(ref=ref, pre=pre, model=model, params=params,
                                 ids=ids, mask=mask, px=px, adv0=adv0)


def test_albef_gen_feats_full_geometry(albef_full):
    """``Gen_feats`` forward parity (``model_pretrain.py:124-141``) at
    480px/901 tokens/12L: 13 image taps + 13 text taps."""
    p = albef_full
    with torch.no_grad():
        img_list, txt_list = p.pre.Gen_feats(
            _nchw(p.px), torch.from_numpy(p.ids), torch.from_numpy(p.mask))
    assert len(img_list) == 13 and len(txt_list) == 13
    assert img_list[0].shape == (1, 901, 768)

    img_j, txt_j, _ = p.model.apply(
        p.params, _nhwc(p.px), jnp.asarray(p.ids), jnp.asarray(p.mask),
        method=AlbefPretrain.gen_feats)
    ti = torch.stack(img_list, 1).numpy()
    tt = torch.stack(txt_list, 1).numpy()
    np.testing.assert_allclose(np.asarray(img_j), ti, atol=5e-4)
    np.testing.assert_allclose(np.asarray(txt_j), tt, atol=5e-4)


def test_albef_pgd_full_geometry_and_production_unroll(albef_full):
    """>=4 PGD iterations at FULL geometry, driven by the reference's own
    cleverhans (``fast_gradient_method.py:97-160`` ls=1): loss trajectory
    rtol 1e-4 + pixel agreement at ``unroll=1``, then the SAME torch
    trajectory re-compared at the production ``scan_unroll=4`` to pin the
    reassociation drift budget at real scale (VERDICT r2 Weak #3)."""
    p = albef_full
    ch = rs.albef_cleverhans()
    ids_t, mask_t = torch.from_numpy(p.ids), torch.from_numpy(p.mask)
    with torch.no_grad():
        il, tl = p.pre.Gen_feats(_nchw(p.px), ids_t, mask_t)

    def model_fn(x):
        i2, t2 = p.pre.Gen_feats(x, ids_t, mask_t)
        return [torch.cat(t2, 0), torch.cat(i2, 0)]

    adv_t, loss_list = ch.pgd.projected_gradient_descent(
        model_fn, _nchw(p.adv0).clone(), EPS, STEP, NB_ITER, np.inf,
        clip_min=-1.0, clip_max=1.0,
        y=[torch.cat(tl, 0).clone(), torch.cat(il, 0).clone()],
        ori_x=_nchw(p.px), time=1, ls=1, sanity_checks=False)
    lt = np.asarray(loss_list)
    adv_t = _torch_nhwc(adv_t)

    aux = {
        "variables": p.params,
        "text_ids": jnp.asarray(p.ids), "text_mask": jnp.asarray(p.mask),
        "tgt_txt": jnp.asarray(torch.stack(tl, 1).numpy()),
        "tgt_img": jnp.asarray(torch.stack(il, 1).numpy()),
        "txt_token_mask": jnp.asarray(p.mask, jnp.float32),
        "special_ids": SPECIAL_FULL,
    }
    loss_fn = albef_losses.make_feature_loss(p.model)

    results = {}
    for unroll in (1, 4):
        adv_j, losses_j = pgd_feature(
            loss_fn, _nhwc(p.adv0), _nhwc(p.px), jax.random.key(0), aux,
            eps=EPS, eps_iter=STEP, nb_iter=NB_ITER, clip_min=-1.0,
            clip_max=1.0, rand_init=False, use_pallas=False, unroll=unroll)
        lj = np.asarray(losses_j)[:, 0]
        d = np.abs(np.asarray(adv_j) - adv_t)
        results[unroll] = (lj, d)

    # unroll=1: the strict budget (the midsize 40-iter test's thresholds,
    # tightened per-iteration count)
    lj, d = results[1]
    np.testing.assert_allclose(lj, lt, rtol=1e-4)
    agree = (d <= 1e-5).mean()
    assert agree >= 0.99, f"unroll=1 pixel agreement {agree:.4f}"
    assert d.mean() < 5e-4, f"unroll=1 mean drift {d.mean():.2e}"

    # unroll=4 (the production config): pure float-reassociation drift —
    # pinned at measured + margin so regressions surface
    lj4, d4 = results[4]
    np.testing.assert_allclose(lj4, lt, rtol=1e-3)
    agree4 = (d4 <= 1e-5).mean()
    assert agree4 >= 0.97, f"unroll=4 pixel agreement {agree4:.4f}"
    assert d4.mean() < 2e-3, f"unroll=4 mean drift {d4.mean():.2e}"


def test_rank_answer_full_k128(albef_full):
    """``rank_answer`` at the production operating point — k=128 over 3,129
    answers (``model_vqa.py:149-203``, ``VQA.yaml: k_test 128``), 480px
    victim with the 6-layer answer decoder: exact top-k ids, probs 1e-4."""
    ref = albef_full.ref
    torch.manual_seed(1)
    vqa = ref.vqa.ALBEF.__new__(ref.vqa.ALBEF)
    nn.Module.__init__(vqa)
    vqa.distill = False
    vqa.tokenizer = types.SimpleNamespace(pad_token_id=0)
    vqa.visual_encoder = _full_vit(ref)
    import copy

    enc_cfg = _hf_bert_base()
    dec_cfg = copy.deepcopy(enc_cfg)
    dec_cfg.fusion_layer = 0
    dec_cfg.num_hidden_layers = 6
    vqa.text_encoder = ref.xbert.BertModel(enc_cfg, add_pooling_layer=False)
    vqa.text_decoder = ref.xbert.BertLMHeadModel(dec_cfg)
    vqa.eval()

    rng = np.random.default_rng(2)
    A, L, k = 3129, 5, 128
    px = albef_full.px
    q_ids, q_mask = albef_full.ids, albef_full.mask
    ans_ids = rng.integers(1000, 20000, (A, L)).astype(np.int64)
    ans_ids[:, 0] = SPECIAL_FULL[2]  # shared bos
    lens = rng.integers(2, L + 1, A)
    ans_mask = (np.arange(L)[None] < lens[:, None]).astype(np.int64)
    ans_ids[ans_mask == 0] = 0

    q_in = types.SimpleNamespace(input_ids=torch.from_numpy(q_ids),
                                 attention_mask=torch.from_numpy(q_mask))
    a_in = types.SimpleNamespace(input_ids=torch.from_numpy(ans_ids),
                                 attention_mask=torch.from_numpy(ans_mask))
    with torch.no_grad():
        topk_ids_t, topk_probs_t = vqa(_nchw(px), q_in, a_in, train=False, k=k)

    model = AlbefVQA(_full_albef_cfg())
    sd = {k2: v.detach().numpy() for k2, v in vqa.state_dict().items()}
    params = convert_albef_vqa(sd, depth=12, num_layers=12, fusion_layer=6,
                               decoder_layers=6)
    topk_ids_j, topk_probs_j = model.apply(
        {"params": params}, _nhwc(px), jnp.asarray(q_ids),
        jnp.asarray(q_mask), jnp.asarray(ans_ids), jnp.asarray(ans_mask), k)
    np.testing.assert_array_equal(np.asarray(topk_ids_j), topk_ids_t.numpy())
    np.testing.assert_allclose(np.asarray(topk_probs_j),
                               topk_probs_t.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# VLMo MoME base @ 480
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vlmo_full():
    """Reference VLMo at the production attack geometry: MultiWay base-shape
    @480 (901 image tokens), ``max_text_len=40``, the REAL
    ``text_imag_relative_position_index`` at ``max_imag_len=901``
    (``vlmo_module.py:818-882`` with ``window_size=(30,30)``)."""
    vm = rs.vlmo_module()
    mwt = rs.vlmo_multiway()
    from vlmo.modules import heads as ref_heads
    from transformers.models.bert.configuration_bert import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import (
        BertEmbeddings as HFBertEmbeddings,
    )

    torch.manual_seed(0)
    T = 40
    mw_cfg = {"drop_path_rate": 0.0, "loss_names": {"textmlm": 0},
              "max_text_len": T}
    v = vm.VLMo.__new__(vm.VLMo)
    nn.Module.__init__(v)
    v.transformer = mwt.MultiWayTransformer(
        img_size=480, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        mlp_ratio=4, qkv_bias=True, vlffn_start_layer_index=10,
        config=mw_cfg,
    )
    emb_cfg = HFBertConfig(
        vocab_size=V, hidden_size=768, max_position_embeddings=512,
        type_vocab_size=2, hidden_dropout_prob=0.0,
    )
    v.text_embeddings = HFBertEmbeddings(emb_cfg)
    v.token_type_embeddings = nn.Embedding(2, 768)
    v.pooler = ref_heads.Pooler(768)
    v.img_size, v.patch_size, v.num_layers = 480, 16, 12
    v.build_relative_position_embed(
        {"max_text_len_of_initckpt": 196, "max_text_len": T})
    with torch.no_grad():
        v.relative_position_bias_table.data.normal_(std=0.02)
    v.eval()

    assert v.text_imag_relative_position_index.shape == (941, 941)

    cfg = VLMoConfig()  # defaults ARE production: 480/12L/768, vlffn 10, T=40
    model = OurVLMo(cfg, with_vqa_head=False)
    sd = {k: val.detach().numpy() for k, val in v.state_dict().items()}
    params = {"params": convert_vlmo(sd, depth=12)}

    rng = np.random.default_rng(5)
    ids = rng.integers(1000, 20000, (1, T)).astype(np.int64)
    ids[0, 0] = SPECIAL_FULL[2]
    mask = np.ones((1, T), np.int64)
    px = rng.uniform(-1, 1, (1, 3, 480, 480)).astype(np.float32)
    adv0 = np.clip(px + rng.uniform(-EPS, EPS, px.shape).astype(np.float32),
                   -1, 1)
    return types.SimpleNamespace(v=v, model=model, params=params, T=T,
                                 ids=ids, mask=mask, px=px, adv0=adv0)


def _ref_vlmo_attack_closure(v, ids_t, mask_t, max_text_len):
    """The reference's ``pgd_attack`` wiring (``vlmo_module.py:1387-1446``)
    over the real blocks/rel-pos methods (CUDA ``.to`` elided)."""

    def closure(x):
        text_embeds = v.text_embeddings(ids_t) + v.token_type_embeddings(
            torch.zeros_like(mask_t))
        image_embeds, image_masks = v.transformer.visual_embed(x)
        image_masks = image_masks.long()
        image_embeds = image_embeds + v.token_type_embeddings(
            torch.full_like(image_masks, 1))
        co = torch.cat([text_embeds, image_embeds], 1)
        co_masks = torch.cat([mask_t, image_masks], 1)
        rel_list = v.get_rel_pos_bias(v.text_imag_relative_position_index)
        feats = [co]
        h = co
        for i, blk in enumerate(v.transformer.blocks):
            h = blk(h, mask=co_masks, modality_type="vl",
                    relative_position_bias=rel_list[i])
            feats.append(h)
        xn = v.transformer.norm(h)
        cls_feats = v.pooler(xn)
        target = torch.stack(feats, 1)
        tpos = torch.where(mask_t[0] == 1)
        feats_list = torch.cat(
            [target[0, :, tpos[0]], target[0, :, max_text_len:]], 1)
        six = target[0, :, 0, :]
        return [cls_feats, six, feats_list]

    return closure


def test_vlmo_attack_feats_full_geometry(vlmo_full):
    """``attack_feats`` parity at 941 joint tokens with the real rel-pos
    gather (13 taps x 941 tokens x 768)."""
    p = vlmo_full
    ids_t, mask_t = torch.from_numpy(p.ids), torch.from_numpy(p.mask)
    closure = _ref_vlmo_attack_closure(p.v, ids_t, mask_t, p.T)
    with torch.no_grad():
        cls_t, six_t, tokens_t = closure(_nchw(p.px))
    assert tokens_t.shape == (13, 941, 768)

    cls_j, layer_cls_j, tokens_j, token_mask_j = p.model.apply(
        p.params, _nhwc(p.px), jnp.asarray(p.ids), jnp.asarray(p.mask),
        method=OurVLMo.attack_feats)
    np.testing.assert_allclose(np.asarray(cls_j)[0], cls_t.numpy()[0],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(layer_cls_j)[0], six_t.numpy(),
                               atol=1e-3)
    valid = np.asarray(token_mask_j)[0] > 0
    np.testing.assert_allclose(np.asarray(tokens_j)[0][:, valid],
                               tokens_t.numpy(), atol=1e-3)


def test_vlmo_pgd_full_geometry_and_production_unroll(vlmo_full):
    """>=4 PGD iterations of the VLMo cleverhans copy at full geometry
    (unroll=1 strict), plus the production unroll=4 drift budget."""
    p = vlmo_full
    vch = rs.vlmo_cleverhans()
    ids_t, mask_t = torch.from_numpy(p.ids), torch.from_numpy(p.mask)
    closure = _ref_vlmo_attack_closure(p.v, ids_t, mask_t, p.T)
    with torch.no_grad():
        out0 = closure(_nchw(p.px))
    y = [torch.zeros(1), out0[1].clone(), out0[2].clone()]
    adv_t, loss_list = vch.pgd.projected_gradient_descent(
        closure, _nchw(p.adv0).clone(), EPS, STEP, NB_ITER, np.inf,
        clip_min=-1.0, clip_max=1.0, y=y, ori_x=_nchw(p.px),
        time=1, ls=1, sanity_checks=False)
    lt = np.asarray(loss_list)
    adv_t = _torch_nhwc(adv_t)

    _, layer_cls, tokens, token_mask = p.model.apply(
        p.params, _nhwc(p.px), jnp.asarray(p.ids), jnp.asarray(p.mask),
        method=OurVLMo.attack_feats)
    rel_biases = p.model.apply(p.params, method=OurVLMo.precompute_joint_biases)
    aux = {
        "variables": p.params,
        "text_ids": jnp.asarray(p.ids), "text_mask": jnp.asarray(p.mask),
        "tgt_layer_cls": layer_cls, "tgt_tokens": tokens,
        "tgt_token_mask": token_mask.astype(jnp.float32),
        "rel_biases": rel_biases,
    }
    loss_fn = vlmo_losses.make_feature_loss(p.model)
    for unroll, (rtol, min_agree, max_mean) in {
        1: (1e-4, 0.99, 5e-4), 4: (1e-3, 0.97, 2e-3),
    }.items():
        adv_j, losses_j = pgd_feature(
            loss_fn, _nhwc(p.adv0), _nhwc(p.px), jax.random.key(0), aux,
            eps=EPS, eps_iter=STEP, nb_iter=NB_ITER, clip_min=-1.0,
            clip_max=1.0, rand_init=False, use_pallas=False, unroll=unroll)
        lj = np.asarray(losses_j)[:, 0]
        np.testing.assert_allclose(lj, lt, rtol=rtol,
                                   err_msg=f"unroll={unroll}")
        d = np.abs(np.asarray(adv_j) - adv_t)
        agree = (d <= 1e-5).mean()
        assert agree >= min_agree, f"unroll={unroll} agreement {agree:.4f}"
        assert d.mean() < max_mean, f"unroll={unroll} mean drift {d.mean():.2e}"
