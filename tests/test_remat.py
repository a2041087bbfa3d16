"""remat (jax.checkpoint) flag: identical forwards and gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain
from vqattack_tpu.models.vlmo import VLMo

CFG = tiny_test_config()


def test_albef_remat_matches():
    base = CFG.albef
    r = dataclasses.replace(
        base,
        vit=dataclasses.replace(base.vit, remat=True),
        bert=dataclasses.replace(base.bert, remat=True),
    )
    m0, m1 = AlbefPretrain(base), AlbefPretrain(r)
    px = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(m0.init)(jax.random.key(0), px, ids, mask)

    def loss(m):
        def f(p):
            img_f, txt_f, _ = m.apply(params, p, ids, mask)
            return jnp.sum(img_f ** 2) + jnp.sum(txt_f ** 2)
        return f

    v0, g0 = jax.value_and_grad(loss(m0))(px)
    v1, g1 = jax.value_and_grad(loss(m1))(px)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=2e-4, atol=1e-4)


def test_vlmo_remat_matches():
    base = CFG.vlmo
    r = dataclasses.replace(base, remat=True)
    m0, m1 = VLMo(base), VLMo(r)
    px = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((1, base.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(lambda k: m0.init(k, ids, mask, px, method=VLMo.init_all))(
        jax.random.key(0)
    )

    def loss(m):
        def f(p):
            out = m.apply(params, ids, mask, p)
            return jnp.sum(out["cls_feats"] ** 2)
        return f

    v0, g0 = jax.value_and_grad(loss(m0))(px)
    v1, g1 = jax.value_and_grad(loss(m1))(px)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=2e-4, atol=1e-4)
