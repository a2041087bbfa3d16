"""Additional attack kernels from the vendored cleverhans surface.

The reference ships these upstream, unmodified and unused by the VQAttack
path (SURVEY §2.3 "Upstream torch attacks"): Carlini-Wagner L2, uniform-noise
perturbation, and the semantic (pixel-inversion) attack.  Re-derived here as
jittable jax programs so the framework exposes the same attack-zoo surface.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _ce_loss(logits, y):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]


@partial(
    jax.jit, static_argnames=("logits_fn", "eps", "norm", "targeted")
)
def fgm_classifier(
    logits_fn: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    eps: float = 0.3,
    norm: str = "linf",
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    targeted: bool = False,
) -> jnp.ndarray:
    """Plain classifier FGM (the upstream ``cleverhans/jax/attacks/
    fast_gradient_method.py`` surface): one CE sign/steepest step."""
    from vqattack_tpu.attacks.norms import optimize_linear

    def loss(px):
        l = jnp.sum(_ce_loss(logits_fn(px), y))
        return -l if targeted else l

    g = jax.grad(loss)(x)
    return jnp.clip(x + optimize_linear(g, eps, norm), clip_min, clip_max)


@partial(
    jax.jit,
    static_argnames=("logits_fn", "eps", "eps_iter", "nb_iter", "norm", "targeted"),
)
def pgd_classifier(
    logits_fn: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    rng: jax.Array,
    eps: float = 0.3,
    eps_iter: float = 0.01,
    nb_iter: int = 40,
    norm: str = "linf",
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    targeted: bool = False,
) -> jnp.ndarray:
    """Plain classifier PGD (upstream ``cleverhans/jax`` semantics:
    rand-init + iterated FGM + ball projection) as one fused scan."""
    from vqattack_tpu.attacks.norms import clip_eta, optimize_linear
    from vqattack_tpu.attacks.pgd import rand_init_eta

    adv = jnp.clip(
        x + rand_init_eta(rng, x.shape, eps, norm, x.dtype), clip_min, clip_max
    )

    def loss(px):
        l = jnp.sum(_ce_loss(logits_fn(px), y))
        return -l if targeted else l

    def step(adv, _):
        g = jax.grad(loss)(adv)
        adv = jnp.clip(adv + optimize_linear(g, eps_iter, norm), clip_min, clip_max)
        eta = clip_eta(adv - x, norm, eps)
        return jnp.clip(x + eta, clip_min, clip_max), None

    adv, _ = jax.lax.scan(step, adv, None, length=nb_iter)
    return adv


@partial(
    jax.jit,
    static_argnames=("logits_fn", "eps", "eps_iter", "nb_iter", "decay", "targeted"),
)
def momentum_iterative_method(
    logits_fn: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    eps: float = 0.3,
    eps_iter: float = 0.06,
    nb_iter: int = 10,
    decay: float = 1.0,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    targeted: bool = False,
) -> jnp.ndarray:
    """MIM (upstream tf2 zoo): L1-normalized gradient accumulates with decay
    ``mu``; sign steps follow the momentum buffer."""

    def loss(px):
        l = jnp.sum(_ce_loss(logits_fn(px), y))
        return -l if targeted else l

    def step(carry, _):
        adv, m = carry
        g = jax.grad(loss)(adv)
        g = g / jnp.maximum(
            jnp.mean(jnp.abs(g), axis=tuple(range(1, g.ndim)), keepdims=True), 1e-12
        )
        m = decay * m + g
        adv = jnp.clip(adv + eps_iter * jnp.sign(m), clip_min, clip_max)
        adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), clip_min, clip_max)
        return (adv, m), None

    (adv, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), None, length=nb_iter)
    return adv


@partial(
    jax.jit,
    static_argnames=("logits_fn", "eps", "nb_iter", "spsa_samples", "lr", "delta"),
)
def spsa(
    logits_fn: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    rng: jax.Array,
    eps: float = 0.3,
    nb_iter: int = 40,
    spsa_samples: int = 32,
    lr: float = 0.01,
    delta: float = 0.01,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
) -> jnp.ndarray:
    """Gradient-free SPSA (upstream tf2 zoo): antithetic Rademacher
    perturbations estimate the margin-loss gradient; Adam-free sign ascent
    with ball projection.  Useful against gradient-masked models."""

    def margin_loss(px):
        logits = logits_fn(px)
        real = jnp.take_along_axis(logits, y[:, None], axis=1)[:, 0]
        other = jnp.max(logits - jax.nn.one_hot(y, logits.shape[-1]) * 1e9, axis=-1)
        return real - other  # minimize => misclassify

    def step(adv, key):
        def one_sample(k):
            v = jax.random.rademacher(k, adv.shape, dtype=adv.dtype)
            lp = margin_loss(jnp.clip(adv + delta * v, clip_min, clip_max))
            lm = margin_loss(jnp.clip(adv - delta * v, clip_min, clip_max))
            bshape = (adv.shape[0],) + (1,) * (adv.ndim - 1)
            return ((lp - lm) / (2 * delta)).reshape(bshape) * v

        keys = jax.random.split(key, spsa_samples)
        g = jnp.mean(jax.vmap(one_sample)(keys), axis=0)
        adv = jnp.clip(adv - lr * jnp.sign(g), clip_min, clip_max)  # descend margin
        adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), clip_min, clip_max)
        return adv, None

    keys = jax.random.split(rng, nb_iter)
    adv, _ = jax.lax.scan(step, x, keys)
    return adv


@partial(jax.jit, static_argnames=("center",))
def semantic(x: jnp.ndarray, center: bool = True, max_val: float = 1.0) -> jnp.ndarray:
    """Semantic attack: negate centered pixels (``semantic.py``)."""
    if center:
        return -x
    return max_val - x


@partial(jax.jit, static_argnames=("eps",))
def noise(
    x: jnp.ndarray, rng: jax.Array, eps: float = 0.3,
    clip_min: float = -1.0, clip_max: float = 1.0,
) -> jnp.ndarray:
    """Uniform-noise 'attack' baseline (``noise.py``)."""
    eta = jax.random.uniform(rng, x.shape, x.dtype, -eps, eps)
    return jnp.clip(x + eta, clip_min, clip_max)


@partial(
    jax.jit,
    static_argnames=(
        "loss_grad_fn", "n_classes", "max_iterations", "binary_search_steps",
        "targeted", "lr",
    ),
)
def carlini_wagner_l2(
    loss_grad_fn: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    rng: jax.Array,
    max_iterations: int = 100,
    binary_search_steps: int = 5,
    initial_const: float = 1e-2,
    confidence: float = 0.0,
    lr: float = 5e-3,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    targeted: bool = False,
) -> jnp.ndarray:
    """Carlini-Wagner L2 (``carlini_wagner_l2.py``): optimize in tanh space
    with Adam, binary-search the const c, keep the best (lowest-L2
    successful) adversarial example.

    ``loss_grad_fn(adv_x) -> logits [B, n_classes]`` must be a stable jit-
    static callable.
    """
    del rng
    batch = x.shape[0]
    # map x into tanh space
    x_clip = jnp.clip(x, clip_min, clip_max)
    scaled = (x_clip - clip_min) / (clip_max - clip_min)
    scaled = jnp.clip(scaled, 1e-6, 1 - 1e-6)
    x_tanh = jnp.arctanh(scaled * 2 - 1)

    y_onehot = jax.nn.one_hot(y, n_classes)

    def from_tanh(w):
        return (jnp.tanh(w) + 1) / 2 * (clip_max - clip_min) + clip_min

    def cw_objective(w, const):
        adv = from_tanh(w)
        logits = loss_grad_fn(adv)
        real = jnp.sum(y_onehot * logits, axis=-1)
        other = jnp.max(logits - y_onehot * 1e9, axis=-1)
        if targeted:
            f = jnp.maximum(other - real + confidence, 0.0)
        else:
            f = jnp.maximum(real - other + confidence, 0.0)
        l2 = jnp.sum((adv - x_clip) ** 2, axis=tuple(range(1, x.ndim)))
        return jnp.sum(l2 + const * f), (l2, f, adv)

    grad_fn = jax.grad(cw_objective, has_aux=True)

    def binary_step(carry, _):
        lo, hi, const, best_adv, best_l2 = carry

        def adam_step(state, _):
            w, m, v, t = state
            g, _ = grad_fn(w, const)
            t = t + 1
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1 - 0.9 ** t)
            vh = v / (1 - 0.999 ** t)
            w = w - lr * mh / (jnp.sqrt(vh) + 1e-8)
            return (w, m, v, t), None

        init = (x_tanh, jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros((), jnp.float32))
        (w, _, _, _), _ = jax.lax.scan(adam_step, init, None, length=max_iterations)
        _, (l2, f, adv) = cw_objective(w, const)
        success = f <= 0.0

        improved = success & (l2 < best_l2)
        bshape = (batch,) + (1,) * (x.ndim - 1)
        best_adv = jnp.where(improved.reshape(bshape), adv, best_adv)
        best_l2 = jnp.where(improved, l2, best_l2)
        # binary search: success -> shrink const, else grow
        hi = jnp.where(success, jnp.minimum(hi, const), hi)
        lo = jnp.where(success, lo, jnp.maximum(lo, const))
        const = jnp.where(
            hi < 1e9, (lo + hi) / 2, const * 10
        )
        return (lo, hi, const, best_adv, best_l2), None

    lo = jnp.zeros(batch)
    hi = jnp.full((batch,), 1e10)
    const = jnp.full((batch,), initial_const)
    best_l2 = jnp.full((batch,), jnp.inf)
    carry = (lo, hi, const, x_clip, best_l2)
    (_, _, _, best_adv, _), _ = jax.lax.scan(
        binary_step, carry, None, length=binary_search_steps
    )
    return best_adv
