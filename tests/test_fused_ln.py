"""Exactness of the fused residual+LayerNorm Pallas kernel
(``ops/fused_ln.py``) against its jnp twin — run through the Pallas
interpreter on the CPU test platform, covering the ragged final row-tile
(941 rows % 256 != 0), both dtypes, and the full VJP incl. the
accumulated dgamma/dbeta."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.ops import fused_ln


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fused_ln, "INTERPRET", True)


def _case(rng, rows, d, dtype):
    x = jnp.asarray(rng.normal(size=(rows, d)), dtype)
    delta = jnp.asarray(rng.normal(size=(rows, d)) * 0.3, dtype)
    gamma = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    return x, delta, gamma, beta


@pytest.mark.parametrize("rows,dtype,tol", [
    (512, jnp.float32, 1e-6),     # divisible grid
    (941, jnp.float32, 1e-6),     # ragged final tile (the real seq len)
    # production trunk dtype: the residual sum is BIT-exact (same-dtype
    # add); h may differ by 1 bf16 ULP between the two programs' f32
    # stat pipelines (rtol 2^-7 covers exactly one ULP)
    (941, jnp.bfloat16, None),
])
def test_forward_matches_reference(rows, dtype, tol):
    rng = np.random.default_rng(0)
    x, delta, gamma, beta = _case(rng, rows, 256, dtype)
    s_ref, h_ref = fused_ln.residual_layernorm_reference(
        x, delta, gamma, beta, eps=1e-6)
    s, h = fused_ln._fused_residual_layernorm(x, delta, gamma, beta, 1e-6)
    if tol is None:
        np.testing.assert_array_equal(np.asarray(s, np.float32),
                                      np.asarray(s_ref, np.float32))
        np.testing.assert_allclose(np.asarray(h, np.float32),
                                   np.asarray(h_ref, np.float32),
                                   rtol=2 ** -7, atol=2 ** -9)
    else:
        np.testing.assert_allclose(np.asarray(s, np.float32),
                                   np.asarray(s_ref, np.float32), atol=tol)
        np.testing.assert_allclose(np.asarray(h, np.float32),
                                   np.asarray(h_ref, np.float32), atol=tol)


@pytest.mark.parametrize("rows", [512, 941])
def test_vjp_matches_reference(rows):
    rng = np.random.default_rng(1)
    x, delta, gamma, beta = _case(rng, rows, 256, jnp.float32)
    gs = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    gh = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def loss_ref(x, delta, gamma, beta):
        s, h = fused_ln.residual_layernorm_reference(x, delta, gamma, beta,
                                                     eps=1e-6)
        return jnp.sum(s * gs) + jnp.sum(h * gh)

    def loss_fused(x, delta, gamma, beta):
        s, h = fused_ln._fused_residual_layernorm(x, delta, gamma, beta, 1e-6)
        return jnp.sum(s * gs) + jnp.sum(h * gh)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, delta, gamma, beta)
    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, delta, gamma, beta)
    for g, w, name in zip(got, want, ("dx", "ddelta", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, err_msg=name)


def test_wrapper_fallbacks():
    """The public wrapper falls back to the jnp twin on CPU (no INTERPRET),
    for delta=None, and for non-128-multiple widths."""
    rng = np.random.default_rng(2)
    x, delta, gamma, beta = _case(rng, 32, 24, jnp.float32)
    s, h = fused_ln.residual_layernorm(x, delta, gamma, beta)
    s_ref, h_ref = fused_ln.residual_layernorm_reference(x, delta, gamma, beta)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))

    s2, h2 = fused_ln.residual_layernorm(x, None, gamma, beta)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(x))
    assert h2.shape == x.shape


def test_reference_twin_matches_flax_layernorm():
    """The jnp twin is numerically the flax LayerNorm the models use."""
    from flax import linen as nn

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(64,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    ln = nn.LayerNorm(epsilon=1e-6)
    want = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
    _, got = fused_ln.residual_layernorm_reference(
        x, jnp.zeros_like(x), gamma, beta, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_vit_fused_ln_matches_unfused():
    """The restructured pending-residual ViT trunk (cfg.fused_ln) computes
    the same outputs and the same 13 feature taps as the plain path — here
    through the interpreter-backed kernel at a 256-wide geometry so the
    Pallas path itself (not just the jnp fallback) is exercised inside the
    model."""
    import dataclasses

    from vqattack_tpu.config import ViTConfig
    from vqattack_tpu.models.vit import VisionTransformer

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=256, depth=3,
                    num_heads=4)
    rng = np.random.default_rng(4)
    px = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)

    base = VisionTransformer(cfg)
    params = base.init(jax.random.key(0), px)
    out_ref, feats_ref = base.apply(params, px)

    fused = VisionTransformer(dataclasses.replace(cfg, fused_ln=True))
    out_f, feats_f = fused.apply(params, px)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(feats_f), np.asarray(feats_ref),
                               atol=2e-5)

    # gradients through the fused trunk match too (the custom VJP)
    def loss(p, m):
        o, f = m.apply(p, px)
        return jnp.sum(o * o) + jnp.sum(f[:, -1] ** 2)

    g_ref = jax.grad(lambda p: loss(p, base))(params)
    g_f = jax.grad(lambda p: loss(p, fused))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(leaf), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))
