"""Fused per-layer cosine path (stack_feats=False) == stacked path.

Round-2 perf lever (VERDICT item 2): the adversarial image feature stack
[B, 13, N, D] need not be materialized — the loss can reduce each layer's
cosine in place.  Parameters are identical between the two module variants,
so the same param tree drives both; loss values AND image gradients must
match bit-for-bit (the graphs are algebraically identical reassociations of
the same f32 reductions up to summation order, so allclose with tight tol).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.attacks import albef as albef_losses
from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain


def _setup():
    cfg = tiny_test_config()
    model = AlbefPretrain(cfg.albef)
    fused = AlbefPretrain(cfg.albef, fused_feats=True)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(5, cfg.albef.bert.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.key(0), px, ids, mask,
                        method=AlbefPretrain.init_all)
    return cfg, model, fused, params, px, ids, mask


def test_fused_feature_loss_matches_stacked():
    cfg, model, fused, params, px, ids, mask = _setup()
    img_f, txt_f, _ = model.apply(params, px, ids, mask,
                                  method=AlbefPretrain.gen_feats)
    aux = {
        "variables": params,
        "text_ids": ids,
        "text_mask": mask,
        "tgt_txt": txt_f,
        "tgt_img": img_f,
        "txt_token_mask": mask.astype(jnp.float32),
        "special_ids": (4, 0, 2),
    }
    key = jax.random.key(7)
    loss_s = albef_losses.make_feature_loss(model)
    loss_f = albef_losses.make_feature_loss(fused)
    (tot_s, ps_s), g_s = jax.value_and_grad(loss_s, has_aux=True)(px, key, aux)
    (tot_f, ps_f), g_f = jax.value_and_grad(loss_f, has_aux=True)(px, key, aux)
    np.testing.assert_allclose(np.asarray(tot_s), np.asarray(tot_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps_s), np.asarray(ps_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_f),
                               rtol=1e-5, atol=1e-7)


def test_fused_vl_loss_matches_stacked():
    cfg, model, fused, params, px, ids, mask = _setup()
    img_f, txt_f, _ = model.apply(params, px, ids, mask,
                                  method=AlbefPretrain.gen_feats)
    embeds = model.apply(params, ids, method=AlbefPretrain.embed_text)
    aux = {
        "variables": params,
        "text_mask": mask,
        "tgt_txt": txt_f,
        "tgt_img": img_f,
        "txt_token_mask": mask.astype(jnp.float32),
    }
    key = jax.random.key(3)
    vl_s = albef_losses.make_vl_loss(model)
    vl_f = albef_losses.make_vl_loss(fused)
    (tot_s, _), (gi_s, ge_s) = jax.value_and_grad(
        vl_s, argnums=(0, 1), has_aux=True)(px, embeds, key, aux)
    (tot_f, _), (gi_f, ge_f) = jax.value_and_grad(
        vl_f, argnums=(0, 1), has_aux=True)(px, embeds, key, aux)
    np.testing.assert_allclose(np.asarray(tot_s), np.asarray(tot_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gi_s), np.asarray(gi_f),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ge_s), np.asarray(ge_f),
                               rtol=1e-5, atol=1e-7)


def test_vlmo_fused_feature_loss_matches_stacked():
    import dataclasses as dc

    from vqattack_tpu.attacks import vlmo as vlmo_losses
    from vqattack_tpu.models.vlmo import VLMo

    cfg = tiny_test_config()
    model = VLMo(cfg.vlmo)
    fused = VLMo(cfg.vlmo, fused_feats=True)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(
        rng.integers(5, cfg.vlmo.vocab_size, (2, cfg.vlmo.max_text_len)),
        jnp.int32,
    )
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.key(0), ids, mask, px, method=VLMo.init_all)
    _, layer_cls, tokens, token_mask = model.apply(
        params, px, ids, mask, method=VLMo.attack_feats)
    aux = {
        "variables": params, "text_ids": ids, "text_mask": mask,
        "tgt_layer_cls": layer_cls, "tgt_tokens": tokens,
        "tgt_token_mask": token_mask.astype(jnp.float32),
    }
    key = jax.random.key(5)
    loss_s = vlmo_losses.make_feature_loss(model)
    loss_f = vlmo_losses.make_feature_loss(fused)
    (tot_s, ps_s), g_s = jax.value_and_grad(loss_s, has_aux=True)(px, key, aux)
    (tot_f, ps_f), g_f = jax.value_and_grad(loss_f, has_aux=True)(px, key, aux)
    np.testing.assert_allclose(np.asarray(tot_s), np.asarray(tot_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps_s), np.asarray(ps_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_f),
                               rtol=1e-5, atol=1e-7)
    # tuple-valued clean targets (fused model used for targets) also work
    _, lc2, tok2, tm2 = fused.apply(params, px, ids, mask,
                                    method=VLMo.attack_feats)
    aux2 = dict(aux, tgt_layer_cls=lc2, tgt_tokens=tok2)
    (tot_t, _), g_t = jax.value_and_grad(loss_f, has_aux=True)(px, key, aux2)
    np.testing.assert_allclose(np.asarray(tot_t), np.asarray(tot_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_s),
                               rtol=1e-5, atol=1e-7)
