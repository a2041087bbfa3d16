"""ALBEF downstream-task models: VE, NLVR (alternating cross streams),
retrieval two-stage scoring."""

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef_tasks import AlbefNLVR, AlbefRetrieval, AlbefVE

CFG = tiny_test_config().albef


def test_ve_head():
    model = AlbefVE(CFG)
    px = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    logits = model.apply(params, px, ids, mask)
    assert logits.shape == (2, 3)


def test_nlvr_two_streams():
    model = AlbefNLVR(CFG, num_layers=4)
    b = 2
    px = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2 * b, 32, 32, 3)), jnp.float32
    )
    ids = jnp.ones((b, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    logits = model.apply(params, px, ids, mask)
    assert logits.shape == (b, 2)
    # swapping the two images changes the prediction (streams are distinct)
    px_swapped = jnp.concatenate([px[b:], px[:b]])
    logits2 = model.apply(params, px_swapped, ids, mask)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-6)


def test_retrieval_scores():
    model = AlbefRetrieval(CFG)
    px = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (3, 32, 32, 3)), jnp.float32
    )
    ids = jnp.ones((3, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    sim, itm = model.apply(params, px, ids, mask)
    assert sim.shape == (3, 3)
    assert itm.shape == (3, 2)
    # ITA features are normalized
    f, _ = model.apply(params, px, method=AlbefRetrieval.image_features)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1), 1.0, atol=1e-5)


def test_blip_vqa_preset():
    """BLIP preset: cross-attention at every layer, 12-layer decoder."""
    import dataclasses

    from vqattack_tpu.config import blip_vqa_config
    from vqattack_tpu.models.albef import AlbefVQA

    cfg = blip_vqa_config()
    assert cfg.bert.fusion_layer == 0 and cfg.decoder_layers == 12
    # tiny-geometry functional check
    tiny = dataclasses.replace(
        CFG,
        bert=dataclasses.replace(CFG.bert, fusion_layer=0),
        decoder_layers=2,
    )
    model = AlbefVQA(tiny)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    a_ids = jnp.ones((4, 4), jnp.int32).at[:, 0].set(2)
    a_mask = jnp.ones((4, 4), jnp.int32)
    params = jax.jit(
        lambda k: model.init(k, px, ids, mask, a_ids, a_mask, 2)
    )(jax.random.key(0))
    topk_ids, _ = model.apply(params, px, ids, mask, a_ids, a_mask, 2)
    assert topk_ids.shape == (1, 2)
    # every layer carries cross-attention params
    for i in range(tiny.bert.num_layers):
        assert "crossattention_self" in params["params"]["text_encoder"][f"layer_{i}"]
