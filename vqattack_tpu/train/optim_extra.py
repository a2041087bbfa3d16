"""The tail of the reference's vendored timm optimizer zoo, as optax
transforms (``ALBEF_attack/optim/``: ``nadam.py``, ``radam.py``,
``adamp.py``, ``sgdp.py``, ``novograd.py``, ``nvnovograd.py``,
``rmsprop_tf.py``, ``lookahead.py`` — dispatched by
``optim_factory.create_optimizer:66-123``).

None of these are used by any reference config; they exist for surface
parity with the factory.  Each update rule follows the reference's torch
code exactly (update-trajectory differentials in
``tests/test_reference_differential_aux.py``), with one deliberate
divergence documented on :func:`novograd`.

Weight decay here is *coupled* (folded into the update like the torch
implementations), gated per-leaf by a boolean ``mask`` pytree (the
factory's ``add_weight_decay`` no-decay split, ``optim_factory.py:26-37``).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


def _tmap(f, *trees, **kw):
    return jax.tree_util.tree_map(f, *trees, **kw)


def _lr(learning_rate, step):
    """Resolve a float-or-optax-Schedule learning rate at ``step`` (the
    0-based count of completed updates, optax convention)."""
    return learning_rate(step) if callable(learning_rate) else learning_rate


def _wd_tree(params: Any, mask: Any, weight_decay: float) -> Any:
    """Per-leaf decay coefficient: ``weight_decay`` where masked True."""
    if mask is None:
        return _tmap(lambda _: weight_decay, params)
    if callable(mask):
        mask = mask(params)
    return _tmap(lambda m: weight_decay if m else 0.0, mask)


class ScalarPerLeafState(NamedTuple):
    step: jnp.ndarray
    mu: Any
    nu: Any


def nadam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    schedule_decay: float = 4e-3,
    weight_decay: float = 0.0,
    mask: Any = None,
) -> optax.GradientTransformation:
    """Nadam with the warming momentum schedule (``optim/nadam.py:35-90``);
    coupled L2 (``grad += wd * p``, ``:69-70``)."""

    class State(NamedTuple):
        step: jnp.ndarray
        m_schedule: jnp.ndarray
        mu: Any
        nu: Any

    def init(params):
        z = _tmap(jnp.zeros_like, params)
        return State(jnp.zeros((), jnp.int32), jnp.ones((), jnp.float32),
                     z, _tmap(jnp.zeros_like, params))

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        t = state.step + 1
        lr = _lr(learning_rate, state.step)
        tf = t.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (tf * schedule_decay))
        mu_t1 = b1 * (1.0 - 0.5 * 0.96 ** ((tf + 1.0) * schedule_decay))
        msch_new = state.m_schedule * mu_t
        msch_next = msch_new * mu_t1

        def leaf(g, p, m, v, w):
            g = g + w * p
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            denom = jnp.sqrt(v / (1.0 - b2 ** tf)) + eps
            return (
                -lr * (1.0 - mu_t) / (1.0 - msch_new) * g / denom
                - lr * mu_t1 / (1.0 - msch_next) * m / denom,
                m, v,
            )

        out = _tmap(leaf, grads, params, state.mu, state.nu, wd)
        upd = _tmap(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = _tmap(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = _tmap(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return upd, State(t, msch_new, mu, nu)

    return optax.GradientTransformation(init, update)


def radam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask: Any = None,
) -> optax.GradientTransformation:
    """RAdam (``optim/radam.py:12-88``): rectified step when the SMA length
    N >= 5, plain momentum step otherwise; coupled decay multiplies the
    parameter by ``1 - wd * lr`` before the step (``:76-77``)."""

    def init(params):
        return ScalarPerLeafState(jnp.zeros((), jnp.int32),
                                  _tmap(jnp.zeros_like, params),
                                  _tmap(jnp.zeros_like, params))

    n_sma_max = 2.0 / (1.0 - b2) - 1.0

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        t = state.step + 1
        tf = t.astype(jnp.float32)
        # N_sma = n_sma_max - 2 t b2^t / (1 - b2^t) suffers catastrophic f32
        # cancellation (two ~2/(1-b2)-scale terms differing by ~2t); the
        # torch reference computes it in python f64, and a few-ULP pow error
        # here flips the N>=5 branch at borderline steps.  Cancellation-free
        # rewrite: with D = 1-b2^t (via expm1) and d = 1-b2,
        #   N = (2 (D/d - t) + D (2t-1)) / D
        # where D/d - t is itself the small series -C(t,2) d + ... and stays
        # accurate in f32 (validated to ~3e-4 of f64 for b2=0.999, t<=10).
        d = 1.0 - b2
        big_d = -jnp.expm1(tf * math.log(b2))
        n_sma = (2.0 * (big_d / d - tf) + big_d * (2.0 * tf - 1.0)) / big_d
        one_minus_b2t = big_d
        rect = jnp.sqrt(jnp.maximum(
            one_minus_b2t * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0), 0.0))
        bc1 = 1.0 - b1 ** tf
        use_rect = n_sma >= 5.0
        lr = _lr(learning_rate, state.step)
        ss_rect = lr * rect / bc1
        ss_plain = lr / bc1

        def leaf(g, p, m, v, w):
            v = b2 * v + (1.0 - b2) * g * g
            m = b1 * m + (1.0 - b1) * g
            upd = jnp.where(use_rect,
                            -ss_rect * m / (jnp.sqrt(v) + eps),
                            -ss_plain * m)
            return upd - w * lr * p, m, v

        out = _tmap(leaf, grads, params, state.mu, state.nu, wd)
        upd = _tmap(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = _tmap(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = _tmap(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return upd, ScalarPerLeafState(t, mu, nu)

    return optax.GradientTransformation(init, update)


def _projection(p, grad, perturb, delta, wd_ratio, eps):
    """AdamP/SGDP perturbation projection (``optim/adamp.py:28-53``): when
    the gradient is near-orthogonal to the parameter under the channel view
    (then the layer view), remove the radial component of the update and
    shrink the decay by ``wd_ratio``.  Returns (perturb, wd_scale)."""
    expand = (-1,) + (1,) * (p.ndim - 1)

    def cos(view):
        x, y = view(grad), view(p)
        xn = jnp.linalg.norm(x, axis=1) + eps
        yn = jnp.linalg.norm(y, axis=1) + eps
        return jnp.abs((x * y).sum(1)) / xn / yn

    def view_ch(x):
        return x.reshape(x.shape[0], -1)

    def view_layer(x):
        return x.reshape(1, -1)

    cond_ch = cos(view_ch).max() < delta / jnp.sqrt(
        float(view_ch(p).shape[1]))
    p_n_ch = p / (jnp.linalg.norm(view_ch(p), axis=1).reshape(expand) + eps)
    pert_ch = perturb - p_n_ch * view_ch(p_n_ch * perturb).sum(1).reshape(expand)

    cond_l = cos(view_layer).max() < delta / jnp.sqrt(
        float(view_layer(p).shape[1]))
    p_n_l = p / (jnp.linalg.norm(view_layer(p), axis=1).reshape(
        (1,) * p.ndim) + eps)
    pert_l = perturb - p_n_l * (p_n_l * perturb).sum()

    # the reference checks channel first and returns immediately on match
    out = jnp.where(cond_ch, pert_ch, jnp.where(cond_l, pert_l, perturb))
    wd_scale = jnp.where(cond_ch | cond_l, wd_ratio, 1.0)
    return out, wd_scale


def adamp(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.01,
    nesterov: bool = True,
    mask: Any = None,
) -> optax.GradientTransformation:
    """AdamP (``optim/adamp.py:56-107``).  The factory instantiates it with
    ``wd_ratio=0.01, nesterov=True`` (``optim_factory.py:79-80``)."""

    def init(params):
        return ScalarPerLeafState(jnp.zeros((), jnp.int32),
                                  _tmap(jnp.zeros_like, params),
                                  _tmap(jnp.zeros_like, params))

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        t = state.step + 1
        lr = _lr(learning_rate, state.step)
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - b1 ** tf
        bc2 = 1.0 - b2 ** tf

        def leaf(g, p, m, v, w):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            step_size = lr / bc1
            perturb = ((b1 * m + (1.0 - b1) * g) / denom if nesterov
                       else m / denom)
            if p.ndim > 1:
                perturb, wd_scale = _projection(p, g, perturb, delta,
                                                wd_ratio, eps)
            else:
                wd_scale = jnp.ones((), p.dtype)
            decay = -lr * w * wd_scale * p if w else 0.0
            return decay - step_size * perturb, m, v

        out = _tmap(leaf, grads, params, state.mu, state.nu, wd)
        upd = _tmap(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = _tmap(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = _tmap(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return upd, ScalarPerLeafState(t, mu, nu)

    return optax.GradientTransformation(init, update)


class MomentumState(NamedTuple):
    buf: Any
    step: jnp.ndarray


def sgdp(
    learning_rate: float,
    momentum: float = 0.9,
    dampening: float = 0.0,
    nesterov: bool = True,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    mask: Any = None,
) -> optax.GradientTransformation:
    """SGDP (``optim/sgdp.py:57-97``), factory-wired with
    ``momentum=args.momentum, nesterov=True`` (``optim_factory.py:81-82``);
    decay is scaled by ``1 / (1 - momentum)`` (``:92-93``)."""

    def init(params):
        return MomentumState(_tmap(jnp.zeros_like, params),
                             jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        lr = _lr(learning_rate, state.step)

        def leaf(g, p, buf, w):
            buf = momentum * buf + (1.0 - dampening) * g
            d_p = g + momentum * buf if nesterov else buf
            if p.ndim > 1:
                d_p, wd_scale = _projection(p, g, d_p, delta, wd_ratio, eps)
            else:
                wd_scale = jnp.ones((), p.dtype)
            decay = (-lr * w * wd_scale / (1.0 - momentum) * p
                     if w else 0.0)
            return decay - lr * d_p, buf

        out = _tmap(leaf, grads, params, state.buf, wd)
        upd = _tmap(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        buf = _tmap(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return upd, MomentumState(buf, state.step + 1)

    return optax.GradientTransformation(init, update)


def novograd(
    learning_rate: float,
    b1: float = 0.95,
    b2: float = 0.98,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_averaging: bool = False,
    mask: Any = None,
) -> optax.GradientTransformation:
    """Convergence-Lab NovoGrad (``optim/novograd.py:12-77``): per-layer
    second moment of the *ema-normalized* gradient, first step seeds
    v/m/grad_ema from the first gradient (``:30-46``).

    Deliberate divergence: the reference reads decay from ``self._wd``,
    which the factory's ``add_weight_decay`` split always leaves at 0
    (``optim_factory.py:42-48`` zeroes the ctor ``weight_decay`` after
    building per-group decay the class never reads) — so reference NovoGrad
    effectively runs decay-free.  Here ``weight_decay`` works as labeled;
    pass 0 for reference-equivalent behavior."""

    class State(NamedTuple):
        step: jnp.ndarray
        v: Any        # per-leaf scalar second moment
        m: Any        # per-leaf tensor momentum
        grad_ema: Any  # per-leaf scalar ||g||^2 ema

    def init(params):
        return State(jnp.zeros((), jnp.int32),
                     _tmap(lambda p: jnp.zeros((), jnp.float32), params),
                     _tmap(jnp.zeros_like, params),
                     _tmap(lambda p: jnp.zeros((), jnp.float32), params))

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        t = state.step + 1
        tf = t.astype(jnp.float32)
        first = state.step == 0
        bc1 = 1.0 - b1 ** tf
        bc2 = 1.0 - b2 ** tf
        step_size = _lr(learning_rate, state.step) * jnp.sqrt(bc2) / bc1

        def leaf(g, p, v, m, ema, w):
            g2_raw = jnp.sum(g * g)
            # first call: the reference's init pass (novograd.py:33-46)
            v = jnp.where(first, g2_raw, v)
            m = jnp.where(first, g / (jnp.sqrt(g2_raw) + eps) + w * p, m)
            ema = jnp.where(first, g2_raw, b2 * ema + (1.0 - b2) * g2_raw)
            gn = g / (jnp.sqrt(ema) + eps)
            if grad_averaging:
                gn = gn * (1.0 - b1)
            g2 = jnp.sum(gn * gn)
            v = b2 * v + (1.0 - b2) * g2
            m = b1 * m + (gn / (jnp.sqrt(v) + eps) + w * p)
            return -step_size * m, v, m, ema

        out = _tmap(leaf, grads, params, state.v, state.m, state.grad_ema, wd)
        pick = lambda i: _tmap(lambda o: o[i], out,  # noqa: E731
                               is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), State(t, pick(1), pick(2), pick(3))

    return optax.GradientTransformation(init, update)


def nvnovograd(
    learning_rate: float,
    b1: float = 0.95,
    b2: float = 0.98,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_averaging: bool = False,
    mask: Any = None,
) -> optax.GradientTransformation:
    """Nvidia NovoGrad (``optim/nvnovograd.py:13-118``): scalar per-layer
    second moment seeded with the first ``||g||^2`` (``:96-99``), coupled
    decay added to the normalized gradient (``:110-111``)."""

    class State(NamedTuple):
        step: jnp.ndarray
        m: Any
        sq: Any

    def init(params):
        return State(jnp.zeros((), jnp.int32),
                     _tmap(jnp.zeros_like, params),
                     _tmap(lambda p: jnp.zeros((), jnp.float32), params))

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        lr = _lr(learning_rate, state.step)

        def leaf(g, p, m, sq, w):
            norm = jnp.sum(g * g)
            sq = jnp.where(sq == 0.0, norm, b2 * sq + (1.0 - b2) * norm)
            gn = g / (jnp.sqrt(sq) + eps)
            gn = gn + w * p
            if grad_averaging:
                gn = gn * (1.0 - b1)
            m = b1 * m + gn
            return -lr * m, m, sq

        out = _tmap(leaf, grads, params, state.m, state.sq, wd)
        pick = lambda i: _tmap(lambda o: o[i], out,  # noqa: E731
                               is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), State(state.step + 1, pick(1), pick(2))

    return optax.GradientTransformation(init, update)


def rmsprop_tf(
    learning_rate: float,
    alpha: float = 0.9,
    eps: float = 1e-10,
    momentum: float = 0.0,
    weight_decay: float = 0.0,
    centered: bool = False,
    decoupled_decay: bool = False,
    lr_in_momentum: bool = True,
    mask: Any = None,
) -> optax.GradientTransformation:
    """timm RMSpropTF (``optim/rmsprop_tf.py:14-141``): eps inside the
    sqrt, square-avg initialized to ONES, lr folded into the momentum
    buffer (TF semantics)."""

    class State(NamedTuple):
        sq: Any
        buf: Any
        grad_avg: Any
        step: jnp.ndarray

    def init(params):
        return State(_tmap(jnp.ones_like, params),
                     _tmap(jnp.zeros_like, params),
                     _tmap(jnp.zeros_like, params),
                     jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        wd = _wd_tree(params, mask, weight_decay)
        lr = _lr(learning_rate, state.step)

        def leaf(g, p, sq, buf, gavg, w):
            if decoupled_decay:
                decay = -w * p
            else:
                g = g + w * p
                decay = 0.0
            sq = sq + (1.0 - alpha) * (g * g - sq)
            if centered:
                gavg = gavg + (1.0 - alpha) * (g - gavg)
                avg = jnp.sqrt(sq - gavg * gavg + eps)
            else:
                avg = jnp.sqrt(sq + eps)
            if momentum > 0.0:
                if lr_in_momentum:
                    buf = momentum * buf + lr * g / avg
                    upd = -buf
                else:
                    buf = momentum * buf + g / avg
                    upd = -lr * buf
            else:
                upd = -lr * g / avg
            return upd + decay, sq, buf, gavg

        out = _tmap(leaf, grads, params, state.sq, state.buf,
                    state.grad_avg, wd)
        pick = lambda i: _tmap(lambda o: o[i], out,  # noqa: E731
                               is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), State(pick(1), pick(2), pick(3), state.step + 1)

    return optax.GradientTransformation(init, update)


def lookahead(
    inner: optax.GradientTransformation,
    alpha: float = 0.5,
    k: int = 6,
) -> optax.GradientTransformation:
    """Lookahead wrapper (``optim/lookahead.py:12-53``): every ``k`` fast
    steps, pull the slow weights toward the fast ones and reset.  The
    reference creates the slow buffer lazily AT the first sync, so the
    first sync is a no-op (slow := fast); reproduced via the ``synced``
    flag."""

    class State(NamedTuple):
        inner: Any
        slow: Any
        step: jnp.ndarray
        synced: jnp.ndarray

    def init(params):
        return State(inner.init(params), _tmap(jnp.asarray, params),
                     jnp.zeros((), jnp.int32), jnp.zeros((), bool))

    def update(grads, state, params):
        u, inner_state = inner.update(grads, state.inner, params)
        step = state.step + 1
        do_sync = (step % k) == 0

        def leaf(uu, p, slow):
            fast = p + uu
            slow_new = jnp.where(state.synced,
                                 slow + alpha * (fast - slow), fast)
            out = jnp.where(do_sync, slow_new - p, uu)
            slow_out = jnp.where(do_sync, slow_new, slow)
            return out, slow_out

        out = _tmap(leaf, u, params, state.slow)
        pick = lambda i: _tmap(lambda o: o[i], out,  # noqa: E731
                               is_leaf=lambda x: isinstance(x, tuple))
        return pick(0), State(inner_state, pick(1), step,
                              state.synced | do_sync)

    return optax.GradientTransformation(init, update)
