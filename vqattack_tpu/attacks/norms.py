"""Norm-ball projection and steepest-ascent step directions.

Behavioral parity with the vendored cleverhans utils
(``cleverhans/cleverhans/torch/utils.py:8-129``), re-derived as pure jnp:

- :func:`clip_eta`   — project a perturbation onto the L-inf / L2 eps-ball
- :func:`optimize_linear` — the FGM step: maximize <g, eta> s.t. ||eta|| <= eps
- :func:`zero_out_clipped_grads` — drop gradient components that point out of
  the [clip_min, clip_max] box at the boundary (``utils.py:131``)
- :func:`get_or_guess_labels` — default untargeted labels = the model's own
  predictions (``utils.py:43``)

All are batch-aware: reductions run over all non-batch axes, so a batched
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


def zero_out_clipped_grads(
    grad: jnp.ndarray, x: jnp.ndarray, clip_min: float, clip_max: float
) -> jnp.ndarray:
    """Zero gradient components pointing outside the clip box at its boundary
    (``cleverhans/torch/utils.py:131-149``): an ascent step can't make
    progress there, so those components shouldn't influence norm budgets."""
    signed = jnp.sign(grad)
    clip_low = (x <= clip_min) & (signed < 0)
    clip_high = (x >= clip_max) & (signed > 0)
    return jnp.where(clip_low | clip_high, jnp.zeros_like(grad), grad)


def get_or_guess_labels(model_fn, x, y=None, targeted: bool = False):
    """Labels for an attack loss (``cleverhans/torch/utils.py:43-68``): use
    the provided ``y`` (required when ``targeted``); otherwise guess the
    untargeted labels as the model's own argmax predictions."""
    if targeted:
        if y is None:
            raise ValueError("targeted attacks require explicit labels")
        return y
    if y is not None:
        return y
    return jnp.argmax(model_fn(x), axis=1)
