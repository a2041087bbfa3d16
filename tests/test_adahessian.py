"""AdaHessian (train/adahessian.py): Hutchinson exactness + convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.train.adahessian import (
    adahessian,
    grad_and_hessian_diag,
    hutchinson_diag,
)
from vqattack_tpu.train.optim import create_optimizer


def test_hutchinson_exact_for_diagonal_hessian():
    # f(p) = 0.5 * sum(a p^2): H = diag(a); z * (H z) = a z^2 = a exactly,
    # so ONE Rademacher sample recovers the diagonal with zero variance.
    a = jnp.asarray([0.5, 2.0, 4.0, 9.0])
    loss = lambda p: 0.5 * jnp.sum(a * p * p)
    p = jnp.asarray([1.0, -2.0, 0.3, 5.0])
    hd = hutchinson_diag(loss, p, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(hd), np.asarray(a), rtol=1e-6)


def test_hutchinson_unbiased_offdiagonal():
    # dense quadratic: E[z * Az] = diag(A); check the mean over samples
    rng = np.random.default_rng(0)
    m = rng.normal(size=(6, 6)).astype(np.float32)
    A = jnp.asarray(m @ m.T)
    loss = lambda p: 0.5 * p @ A @ p
    p = jnp.asarray(rng.normal(size=6).astype(np.float32))
    hd = hutchinson_diag(loss, p, jax.random.key(1), n_samples=400)
    np.testing.assert_allclose(np.asarray(hd), np.asarray(jnp.diag(A)),
                               rtol=0.35, atol=0.5)


def test_adahessian_converges_on_quadratic():
    a = jnp.asarray([1.0, 10.0, 100.0])
    loss = lambda p: 0.5 * jnp.sum(a * p * p)
    params = {"w": jnp.asarray([3.0, -2.0, 1.5])}
    ploss = lambda pt: loss(pt["w"])
    opt = adahessian(0.05)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        g, hd = grad_and_hessian_diag(ploss, params, key)
        updates, state = opt.update(g, state, params, hess_diag=hd)
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    for i in range(300):
        params, state = step(params, state, jax.random.key(i))
    assert float(loss(params["w"])) < 1e-3


def test_factory_exposes_adahessian_and_conv_averaging():
    params = {"conv": {"kernel": jnp.ones((3, 3, 2, 4))},
              "dense": {"bias": jnp.ones((4,))}}
    opt = create_optimizer(params, opt="adahessian", schedule=0.1,
                           weight_decay=0.01)
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    # hess diag varying over spatial dims -> update must be spatially uniform
    hd = {"conv": {"kernel": jnp.arange(3 * 3 * 2 * 4, dtype=jnp.float32)
                   .reshape(3, 3, 2, 4)},
          "dense": {"bias": jnp.ones((4,))}}
    updates, _ = opt.update(g, state, params, hess_diag=hd)
    u = np.asarray(updates["conv"]["kernel"])
    np.testing.assert_allclose(u, np.broadcast_to(u[:1, :1], u.shape), rtol=1e-6)
    assert np.isfinite(np.asarray(updates["dense"]["bias"])).all()


def test_train_step_drives_adahessian_end_to_end():
    """Regression: the trainer must be able to drive the second-order
    optimizer — make_train_step(needs_hessian=True) computes the Hutchinson
    diagonal itself and passes it to update() (previously TypeError:
    missing hess_diag)."""
    from vqattack_tpu.train.trainer import create_train_state, make_train_step

    a = jnp.asarray([1.0, 10.0, 100.0])
    params = {"w": jnp.asarray([3.0, -2.0, 1.5])}

    def loss_fn(p, batch, rng):
        del batch, rng
        loss = 0.5 * jnp.sum(a * p["w"] * p["w"])
        return loss, {"loss": loss}

    tx = create_optimizer(params, opt="adahessian", schedule=0.05)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False, needs_hessian=True)
    for i in range(200):
        state, metrics = step(state, {}, jax.random.key(i))
    assert float(metrics["loss"]) < 1e-2
    assert np.isfinite(float(metrics["grad_norm"]))


def test_grad_and_hessian_diag_grad_matches_jax_grad():
    loss = lambda p: 0.5 * jnp.sum(jnp.asarray([2.0, 3.0]) * p * p)
    p = jnp.asarray([1.5, -0.5])
    g, _ = grad_and_hessian_diag(loss, p, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(g), np.asarray(jax.grad(loss)(p)),
                               rtol=1e-6)
