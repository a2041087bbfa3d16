"""Norm-ball projection and steepest-ascent step directions.

Behavioral parity with the vendored cleverhans utils
(``cleverhans/cleverhans/torch/utils.py:8-129``), re-derived as pure jnp:

- :func:`clip_eta`   — project a perturbation onto the L-inf / L2 eps-ball
- :func:`optimize_linear` — the FGM step: maximize <g, eta> s.t. ||eta|| <= eps

Both are batch-aware: reductions run over all non-batch axes, so a batched
attack projects each sample's perturbation independently (the reference runs
batch=1 and gets this for free).
"""

from __future__ import annotations

import jax.numpy as jnp

_AVOID_ZERO_DIV = 1e-12

LINF = "linf"
L1 = "l1"
L2 = "l2"


def _reduce_axes(x: jnp.ndarray):
    return tuple(range(1, x.ndim))


def clip_eta(eta: jnp.ndarray, norm: str, eps: float) -> jnp.ndarray:
    """Project ``eta`` into the eps-ball of ``norm`` per sample."""
    if norm == LINF:
        return jnp.clip(eta, -eps, eps)
    if norm == L2:
        axes = _reduce_axes(eta)
        n = jnp.sqrt(
            jnp.maximum(_AVOID_ZERO_DIV, jnp.sum(eta * eta, axis=axes, keepdims=True))
        )
        factor = jnp.minimum(1.0, eps / n)
        return eta * factor
    raise ValueError(f"clip_eta: unsupported norm {norm!r}")


def optimize_linear(grad: jnp.ndarray, eps: float, norm: str = LINF) -> jnp.ndarray:
    """The norm-constrained steepest-ascent step (cleverhans
    ``optimize_linear``): returns the perturbation of norm ``eps`` maximizing
    the inner product with ``grad``."""
    if norm == LINF:
        return eps * jnp.sign(grad)
    if norm == L1:
        axes = _reduce_axes(grad)
        abs_grad = jnp.abs(grad)
        max_abs = jnp.max(abs_grad, axis=axes, keepdims=True)
        tied = (abs_grad >= max_abs).astype(grad.dtype)
        num_ties = jnp.sum(tied, axis=axes, keepdims=True)
        return eps * jnp.sign(grad) * tied / num_ties
    if norm == L2:
        axes = _reduce_axes(grad)
        sq = jnp.maximum(_AVOID_ZERO_DIV, jnp.sum(grad * grad, axis=axes, keepdims=True))
        return eps * grad / jnp.sqrt(sq)
    raise ValueError(f"optimize_linear: unsupported norm {norm!r}")
