"""AdaHessian: second-order optimizer with a Hutchinson Hessian-diagonal.

Completes the reference's vendored timm optimizer zoo
(``ALBEF_attack/optim/adahessian.py`` — Adam-style moments over the
*Hessian diagonal* instead of the squared gradient, with spatial averaging
for conv kernels).  TPU-native formulation:

- the Hessian diagonal is estimated with Hutchinson's method,
  ``diag(H) ~ E[z * (H z)]`` with Rademacher ``z``, computed as one
  forward-over-reverse ``jax.jvp(jax.grad(loss))`` — an exact HVP, no
  double-backward graph retention tricks;
- the update is a pure optax ``GradientTransformationExtraArgs`` taking the
  precomputed ``hess_diag`` pytree, so it composes with masks/schedules like
  every other factory optimizer;
- conv-kernel spatial averaging (the reference averages |H_ii| over each
  kernel's spatial block) maps to averaging over HWIO dims (0, 1) for
  4-D kernels.

Usage::

    opt = adahessian(lr)
    state = opt.init(params)
    g, hd = grad_and_hessian_diag(loss_fn, params, key, *batch)
    updates, state = opt.update(g, state, params, hess_diag=hd)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def hutchinson_diag(
    loss_fn: Callable[..., jnp.ndarray],
    params: Any,
    key: jax.Array,
    *args,
    n_samples: int = 1,
) -> Any:
    """Rademacher estimate of ``diag(H)`` of ``loss_fn(params, *args)``.

    One exact HVP per sample: ``H z = jvp(grad(loss), params, z)``.
    """
    _, hd = grad_and_hessian_diag(loss_fn, params, key, *args,
                                  n_samples=n_samples)
    return hd


def grad_and_hessian_diag(
    loss_fn: Callable[..., jnp.ndarray],
    params: Any,
    key: jax.Array,
    *args,
    n_samples: int = 1,
):
    """``(grad, hutchinson diag)`` in one call.

    The gradient is the *primal* output of the first HVP's
    forward-over-reverse ``jvp`` — no separate backward pass.
    """
    grad_fn = jax.grad(loss_fn)
    leaves, treedef = jax.tree_util.tree_flatten(params)

    def one(k):
        ks = jax.random.split(k, len(leaves))
        z = treedef.unflatten(
            [
                jax.random.rademacher(ki, l.shape, dtype=l.dtype)
                for ki, l in zip(ks, leaves)
            ]
        )
        g, hz = jax.jvp(lambda p: grad_fn(p, *args), (params,), (z,))
        return g, jax.tree.map(lambda zi, hzi: zi * hzi, z, hz)

    g, acc = one(key)
    for i in range(1, n_samples):
        _, nxt = one(jax.random.fold_in(key, i))
        acc = jax.tree.map(jnp.add, acc, nxt)
    return g, jax.tree.map(lambda x: x / n_samples, acc)


def _spatial_average(hd: jnp.ndarray) -> jnp.ndarray:
    """The reference's conv-kernel block averaging: mean |H_ii| over the
    spatial dims of a 4-D HWIO kernel (timm adahessian get_trace)."""
    if hd.ndim == 4:
        return jnp.broadcast_to(jnp.mean(hd, axis=(0, 1), keepdims=True), hd.shape)
    return hd


class ScaleByAdahessianState(NamedTuple):
    count: jnp.ndarray
    mu: Any      # EMA of gradients
    nu: Any      # EMA of squared (averaged) Hessian diagonal


def scale_by_adahessian(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    hessian_power: float = 1.0,
    spatial_average: bool = True,
) -> optax.GradientTransformationExtraArgs:
    """Adam-style moments with ``nu`` built from the Hessian diagonal.

    ``update(..., hess_diag=pytree)`` is required (matching grads' shape).
    """

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdahessianState(jnp.zeros([], jnp.int32), z,
                                      jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None, *, hess_diag, **extra):
        del params, extra
        hd = jax.tree.map(_spatial_average, hess_diag) if spatial_average else hess_diag
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, h: b2 * v + (1 - b2) * (h * h), state.nu, hd)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        k = hessian_power

        def step(m, v):
            denom = (jnp.sqrt(v / c2) ** k) + eps
            return (m / c1) / denom

        out = jax.tree.map(step, mu, nu)
        return out, ScaleByAdahessianState(count, mu, nu)

    return optax.GradientTransformationExtraArgs(init, update)


def adahessian(
    learning_rate: optax.ScalarOrSchedule = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    hessian_power: float = 1.0,
    mask: Optional[Any] = None,
    spatial_average: bool = True,
) -> optax.GradientTransformationExtraArgs:
    """The full AdaHessian update (timm ``adahessian.py`` surface).

    Decoupled (AdamW-style) weight decay, optional no-decay mask.
    """
    tx = [scale_by_adahessian(b1, b2, eps, hessian_power, spatial_average)]
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay, mask))
    tx.append(optax.scale_by_learning_rate(learning_rate))
    return optax.with_extra_args_support(optax.chain(*tx))
