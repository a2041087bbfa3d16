"""PGD attack kernels as fused ``lax.scan`` programs.

The reference's PGD (``cleverhans/.../projected_gradient_descent.py:106-189``)
is an imperative host loop with a device sync every iteration
(``loss_list.append(float(loss.cpu()))``, SURVEY §3.3).  Here the whole
iteration budget is one jitted ``lax.scan``: no host round-trips, the loss
trajectory comes back as a stacked ``[T, B]`` array, and per-iteration MLM
masking randomness is threaded through the scan as split PRNG keys.

Step semantics reproduced exactly:

- ``ls==1`` (:func:`pgd_feature`): one feature-loss FGM step per iteration,
  each followed by eps-ball projection + clamp (``pgd:131-152``);
- ``ls==0`` (:func:`pgd_alternating`): one feature FGM step (clamp only),
  then one MAR/MLM FGM step, then projection + clamp (``pgd:153-189``);
- rand-init uniform(+/-eps) only on the first block (``time==0``,
  ``pgd:106-116``);
- the VL joint step (:func:`pgd_vl_step`): differentiate w.r.t. image *and*
  text embeddings; update the image, harvest the text-embedding gradient at
  the substitutable sub-token positions
  (``fast_gradient_method_vl.py:96-130``).

Loss-fn contract::

    loss_fn(adv_x, key, aux) -> (scalar_loss, per_sample_loss[B])

``loss_fn`` must be a stable (module-level or cached) callable — it is a
static jit argument, compiled once; everything that varies per batch (model
params, text ids, clean-feature targets, labels) travels in the traced
``aux`` pytree, so a new attack batch does NOT retrace.

The perturbation update (sign-step + clip + project + clamp) runs as plain
jnp by default — XLA fuses the whole chain into the surrounding gradient
ops.  ``use_pallas=True`` swaps in the hand-written Pallas kernel
(``ops/pgd_update.py``), which is measured SLOWER at every production
config (its flat operand layout forces per-iteration copies of the image
gradient: b=1 f32 96.4 vs 127.8, b=16 bf16 118.7 vs 129.5 aggregate
sample-iters/s — PERF.md profile section); it stays as an opt-in A/B lever.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from vqattack_tpu.attacks.norms import LINF, clip_eta, optimize_linear

LossFn = Callable[[jnp.ndarray, jax.Array, Any], Tuple[jnp.ndarray, jnp.ndarray]]


def rand_init_eta(
    rng: jax.Array, shape, eps: float, norm: str = LINF, dtype=jnp.float32
) -> jnp.ndarray:
    """Uniform(+/-eps) start perturbation, projected to the ball."""
    eta = jax.random.uniform(rng, shape, dtype, minval=-eps, maxval=eps)
    return clip_eta(eta, norm, eps)


def _project(adv, ori, eps, norm, clip_min, clip_max):
    eta = clip_eta(adv - ori, norm, eps)
    return jnp.clip(ori + eta, clip_min, clip_max)


def _update(adv, grad, ori, eps, eps_iter, norm, clip_min, clip_max, use_pallas):
    """sign-step + clamp + ball-project + clamp — optionally fused in Pallas."""
    if use_pallas and norm == LINF:
        from vqattack_tpu.ops.pgd_update import pgd_linf_update

        return pgd_linf_update(adv, grad, ori, eps, eps_iter, clip_min, clip_max)
    adv = jnp.clip(adv + optimize_linear(grad, eps_iter, norm), clip_min, clip_max)
    return _project(adv, ori, eps, norm, clip_min, clip_max)


@partial(
    jax.jit,
    static_argnames=("loss_fn", "nb_iter", "norm", "rand_init", "use_pallas",
                     "eps", "eps_iter", "clip_min", "clip_max", "unroll"),
)
def pgd_feature(
    loss_fn: LossFn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    aux: Any = None,
    eps: float = 0.125,
    eps_iter: float = 0.01,
    nb_iter: int = 40,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    rand_init: bool = False,
    use_pallas: bool = False,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-loss-only PGD (``ls==1``).  Returns ``(adv_x, losses[T, B])``.

    ``unroll`` widens the scan body to that many iterations per while-loop
    trip — same math (trajectories agree to float-reassociation tolerance);
    lets XLA schedule across the iteration boundary at the cost of a
    proportionally larger program.  Measured +3.8% on-chip at the
    production config; plateau at 4 (PERF.md lever table).
    """
    init_key, scan_key = jax.random.split(rng)
    if rand_init:
        adv = jnp.clip(
            x + rand_init_eta(init_key, x.shape, eps, norm, x.dtype),
            clip_min,
            clip_max,
        )
    else:
        adv = x
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(adv, key):
        (_, per_sample), g = grad_fn(adv, key, aux)
        adv = _update(adv, g, ori_x, eps, eps_iter, norm, clip_min, clip_max, use_pallas)
        return adv, per_sample

    keys = jax.random.split(scan_key, nb_iter)
    adv, losses = jax.lax.scan(step, adv, keys, unroll=unroll)
    return adv, losses


@partial(
    jax.jit,
    static_argnames=(
        "feature_loss_fn", "mlm_loss_fn", "nb_iter", "norm", "rand_init", "use_pallas",
        "eps", "eps_iter", "clip_min", "clip_max", "unroll",
    ),
)
def pgd_alternating(
    feature_loss_fn: LossFn,
    mlm_loss_fn: LossFn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    aux: Any = None,
    eps: float = 0.125,
    eps_iter: float = 0.01,
    nb_iter: int = 20,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    rand_init: bool = False,
    use_pallas: bool = False,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Alternating feature+MAR PGD (``ls==0``, ``pgd:153-189``).

    Per iteration: feature FGM step (clamp only — the reference does not
    project between the pair), then MLM FGM step, then projection + clamp.
    Both loss fns see the same ``aux``.  Returns
    ``(adv_x, feat_losses[T, B], mlm_losses[T, B])``.
    """
    init_key, scan_key = jax.random.split(rng)
    if rand_init:
        adv = jnp.clip(
            x + rand_init_eta(init_key, x.shape, eps, norm, x.dtype),
            clip_min,
            clip_max,
        )
    else:
        adv = x
    feat_grad = jax.value_and_grad(feature_loss_fn, has_aux=True)
    mlm_grad = jax.value_and_grad(mlm_loss_fn, has_aux=True)

    def step(adv, key):
        k1, k2 = jax.random.split(key)
        (_, feat_ps), g1 = feat_grad(adv, k1, aux)
        adv = jnp.clip(adv + optimize_linear(g1, eps_iter, norm), clip_min, clip_max)
        (_, mlm_ps), g2 = mlm_grad(adv, k2, aux)
        adv = _update(adv, g2, ori_x, eps, eps_iter, norm, clip_min, clip_max, use_pallas)
        return adv, (feat_ps, mlm_ps)

    keys = jax.random.split(scan_key, nb_iter)
    adv, (feat_losses, mlm_losses) = jax.lax.scan(step, adv, keys, unroll=unroll)
    return adv, feat_losses, mlm_losses


def _dyn_feature_core(
    loss_fn, x, ori_x, rng, nb_iter, rand_init, aux,
    eps, eps_iter, max_iter, clip_min, clip_max, norm, use_pallas,
):
    """Traced-trip-count feature-PGD body — shared verbatim by
    :func:`pgd_feature_dynamic` and the fused :func:`pgd_feature_block`
    (bit-identical trajectories by construction)."""
    init_key, scan_key = jax.random.split(rng)
    eta = rand_init_eta(init_key, x.shape, eps, norm, x.dtype)
    adv = jnp.where(rand_init, jnp.clip(x + eta, clip_min, clip_max), x)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    keys = jax.random.split(scan_key, max_iter)
    ps = jax.eval_shape(lambda a: loss_fn(a, keys[0], aux)[1], x)
    losses0 = jnp.zeros((max_iter,) + ps.shape, ps.dtype)

    def body(i, carry):
        adv, losses = carry
        (_, per_sample), g = grad_fn(adv, keys[i], aux)
        adv = _update(adv, g, ori_x, eps, eps_iter, norm, clip_min, clip_max, use_pallas)
        losses = jax.lax.dynamic_update_index_in_dim(losses, per_sample, i, 0)
        return adv, losses

    n = jnp.minimum(jnp.asarray(nb_iter, jnp.int32), max_iter)
    return jax.lax.fori_loop(0, n, body, (adv, losses0))


def _dyn_alternating_core(
    feature_loss_fn, mlm_loss_fn, x, ori_x, rng, nb_iter, rand_init, aux,
    eps, eps_iter, max_iter, clip_min, clip_max, norm, use_pallas,
):
    """Traced-trip-count alternating-PGD body — shared verbatim by
    :func:`pgd_alternating_dynamic` and :func:`pgd_alternating_block`."""
    init_key, scan_key = jax.random.split(rng)
    eta = rand_init_eta(init_key, x.shape, eps, norm, x.dtype)
    adv = jnp.where(rand_init, jnp.clip(x + eta, clip_min, clip_max), x)
    feat_grad = jax.value_and_grad(feature_loss_fn, has_aux=True)
    mlm_grad = jax.value_and_grad(mlm_loss_fn, has_aux=True)
    keys = jax.random.split(scan_key, max_iter)
    f_ps = jax.eval_shape(lambda a: feature_loss_fn(a, keys[0], aux)[1], x)
    m_ps = jax.eval_shape(lambda a: mlm_loss_fn(a, keys[0], aux)[1], x)
    feat0 = jnp.zeros((max_iter,) + f_ps.shape, f_ps.dtype)
    mlm0 = jnp.zeros((max_iter,) + m_ps.shape, m_ps.dtype)

    def body(i, carry):
        adv, feat_l, mlm_l = carry
        k1, k2 = jax.random.split(keys[i])
        (_, feat_ps), g1 = feat_grad(adv, k1, aux)
        adv = jnp.clip(adv + optimize_linear(g1, eps_iter, norm), clip_min, clip_max)
        (_, mlm_ps), g2 = mlm_grad(adv, k2, aux)
        adv = _update(adv, g2, ori_x, eps, eps_iter, norm, clip_min, clip_max, use_pallas)
        feat_l = jax.lax.dynamic_update_index_in_dim(feat_l, feat_ps, i, 0)
        mlm_l = jax.lax.dynamic_update_index_in_dim(mlm_l, mlm_ps, i, 0)
        return adv, feat_l, mlm_l

    n = jnp.minimum(jnp.asarray(nb_iter, jnp.int32), max_iter)
    return jax.lax.fori_loop(0, n, body, (adv, feat0, mlm0))


@partial(
    jax.jit,
    static_argnames=("loss_fn", "max_iter", "norm", "use_pallas",
                     "eps", "eps_iter", "clip_min", "clip_max"),
)
def pgd_feature_dynamic(
    loss_fn: LossFn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    nb_iter: jnp.ndarray,
    rand_init: jnp.ndarray,
    aux: Any = None,
    eps: float = 0.125,
    eps_iter: float = 0.01,
    max_iter: int = 40,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`pgd_feature` with a *traced* trip count and rand-init flag.

    The realistic sweep's block schedules (``k+1`` blocks per sample,
    ``adv_attack.py:232-239``) produce ~9 distinct block lengths x the
    first-block rand-init variant, each a separate XLA program under the
    static kernel — the measured 256-sample sweep spent most of its pgd
    phase compiling that lattice (PERF.md round 3).  Here ``nb_iter`` is an
    int32 scalar and ``rand_init`` a bool scalar, both traced: ONE compiled
    program per (loss_fn, batch shape) serves every block.

    Semantics are identical to the static kernel at ``unroll=1`` — the
    per-iteration keys are ``split(scan_key, max_iter)[:nb_iter]``, which
    bit-matches ``split(scan_key, nb_iter)`` under threefry's counter
    layout (asserted by tests/test_pgd_dynamic.py).  The loss buffer is a
    fixed ``[max_iter, B]`` array; rows ``>= nb_iter`` are zero — callers
    slice ``losses[:n]`` host-side.

    Hard contract: ``nb_iter`` is clamped to ``max_iter`` on-device (the
    trip bound is ``min(nb_iter, max_iter)``) — a larger request silently
    runs only ``max_iter`` steps and its tail loss rows read as zeros.
    Callers must enforce ``nb_iter <= max_iter`` host-side (the engines
    assert ``block_iters <= num_iters`` before dispatch).  ``fori_loop`` with a traced bound
    lowers to ``while_loop``, so no scan unroll applies (the unroll lever
    measured as a wash on the current runtime — PERF.md round 3).
    """
    return _dyn_feature_core(
        loss_fn, x, ori_x, rng, nb_iter, rand_init, aux,
        eps, eps_iter, max_iter, clip_min, clip_max, norm, use_pallas,
    )


@partial(
    jax.jit,
    static_argnames=("feature_loss_fn", "mlm_loss_fn", "max_iter", "norm",
                     "use_pallas", "eps", "eps_iter", "clip_min", "clip_max"),
)
def pgd_alternating_dynamic(
    feature_loss_fn: LossFn,
    mlm_loss_fn: LossFn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    nb_iter: jnp.ndarray,
    rand_init: jnp.ndarray,
    aux: Any = None,
    eps: float = 0.125,
    eps_iter: float = 0.01,
    max_iter: int = 20,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`pgd_alternating` with traced trip count / rand-init flag.

    Same program-lattice collapse as :func:`pgd_feature_dynamic`; per-trip
    semantics (feature step clamp-only, MLM step project+clamp,
    ``pgd:153-189``) unchanged and bit-matched against the static kernel.
    The same ``nb_iter <= max_iter`` hard contract applies (the trip bound
    is clamped on-device; callers assert host-side).
    """
    return _dyn_alternating_core(
        feature_loss_fn, mlm_loss_fn, x, ori_x, rng, nb_iter, rand_init, aux,
        eps, eps_iter, max_iter, clip_min, clip_max, norm, use_pallas,
    )


def _maybe_vl_core(
    vl_loss_fn, embed_fn, adv, ori_x, positions, vl_rng, aux, do_vl,
    eps, eps_iter, norm, clip_min, clip_max, use_pallas,
):
    """Conditional VL joint step inside a fused block program.

    When ``do_vl`` (traced bool) is set: embed the current adv text ids
    (the standalone path's separate ``embed_text`` dispatch), take the
    joint image+text-embedding gradient, update the image, and harvest the
    text-embedding gradient rows at ``positions`` — numerically identical
    to ``embed_text`` followed by :func:`pgd_vl_step` under the same key.
    When unset (a bucket's LAST block), the branch is skipped at runtime
    and a zero text-grad of the same shape comes back."""
    emb_sd = jax.eval_shape(embed_fn, aux["variables"], aux["text_ids"])
    b, p = positions.shape

    def yes(a):
        embeds = embed_fn(aux["variables"], aux["text_ids"])
        grad_fn = jax.value_and_grad(vl_loss_fn, argnums=(0, 1), has_aux=True)
        (_, _), (g_img, g_emb) = grad_fn(a, embeds, vl_rng, aux)
        a2 = _update(a, g_img, ori_x, eps, eps_iter, norm, clip_min, clip_max,
                     use_pallas)
        tg = jnp.take_along_axis(g_emb, positions[:, :, None], axis=1)
        # f32 output regardless of trunk dtype: both cond branches must
        # agree, and the host-side dir-sim consumer is f32 anyway
        return a2, tg.astype(jnp.float32)

    def no(a):
        return a, jnp.zeros((b, p, emb_sd.shape[-1]), jnp.float32)

    return jax.lax.cond(do_vl, yes, no, adv)


@partial(
    jax.jit,
    static_argnames=("loss_fn", "vl_loss_fn", "embed_fn", "targets_fn",
                     "target_keys", "max_iter", "norm", "use_pallas",
                     "eps", "eps_iter", "clip_min", "clip_max"),
)
def pgd_feature_block(
    loss_fn: LossFn,
    vl_loss_fn,
    embed_fn,
    targets_fn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    vl_rng: jax.Array,
    tgt_rng: jax.Array,
    nb_iter: jnp.ndarray,
    rand_init: jnp.ndarray,
    do_vl: jnp.ndarray,
    positions: jnp.ndarray,
    aux: Any,
    target_keys: Tuple[str, ...],
    eps: float = 0.125,
    eps_iter: float = 0.01,
    max_iter: int = 40,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """ONE fused per-block program: [clean targets] + dynamic feature PGD +
    [VL joint step] (VERDICT r4 Next #3).

    The unfused execution shape pays three to four dispatches per block
    (clean-targets once per bucket + per block: PGD program, embed_text,
    VL step) — ~1.3 s/pair of dispatch/lattice overhead in the r4 sweep
    against ~0.03 s/pair of chip compute.  Here the whole block is one
    program and the lattice shrinks to two variants per algorithm
    (``targets_fn`` set = first block, computing the clean feature targets
    on-device; ``None`` = later blocks, targets arrive in ``aux``).

    - ``targets_fn(ori_x, key, aux) -> {target_key: array}`` must read the
      ORIGINAL question ids from ``aux["ori_ids"]``/``aux["ori_mask"]``
      (== the block ids on the first block, where ``adv_text`` is still
      the question);
    - ``target_keys``: the aux entries forming the target pytree (e.g.
      ``("tgt_img", "tgt_txt")``); the (possibly fresh) targets come back
      as the 4th result so later blocks can feed them in;
    - trajectories bit-match the composed path (clean_targets;
    pgd_feature_dynamic; embed_text + pgd_vl_step) under the same keys —
    pinned by tests/test_pgd_fused.py.
    """
    if targets_fn is not None:
        tgts = targets_fn(ori_x, tgt_rng, aux)
        aux = {**aux, **{k: tgts[k] for k in target_keys}}
    adv, losses = _dyn_feature_core(
        loss_fn, x, ori_x, rng, nb_iter, rand_init, aux,
        eps, eps_iter, max_iter, clip_min, clip_max, norm, use_pallas,
    )
    adv, text_grad = _maybe_vl_core(
        vl_loss_fn, embed_fn, adv, ori_x, positions, vl_rng, aux, do_vl,
        eps, eps_iter, norm, clip_min, clip_max, use_pallas,
    )
    return adv, losses, text_grad, tuple(aux[k] for k in target_keys)


@partial(
    jax.jit,
    static_argnames=("feature_loss_fn", "mlm_loss_fn", "vl_loss_fn",
                     "embed_fn", "targets_fn", "target_keys", "max_iter",
                     "norm", "use_pallas", "eps", "eps_iter", "clip_min",
                     "clip_max"),
)
def pgd_alternating_block(
    feature_loss_fn: LossFn,
    mlm_loss_fn: LossFn,
    vl_loss_fn,
    embed_fn,
    targets_fn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    vl_rng: jax.Array,
    tgt_rng: jax.Array,
    nb_iter: jnp.ndarray,
    rand_init: jnp.ndarray,
    do_vl: jnp.ndarray,
    positions: jnp.ndarray,
    aux: Any,
    target_keys: Tuple[str, ...],
    eps: float = 0.125,
    eps_iter: float = 0.01,
    max_iter: int = 20,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           Tuple[jnp.ndarray, ...]]:
    """:func:`pgd_feature_block` for the alternating (MAR) algorithm —
    same fusion, same contracts; returns
    ``(adv, feat_losses, mlm_losses, text_grad, targets)``."""
    if targets_fn is not None:
        tgts = targets_fn(ori_x, tgt_rng, aux)
        aux = {**aux, **{k: tgts[k] for k in target_keys}}
    adv, feat_losses, mlm_losses = _dyn_alternating_core(
        feature_loss_fn, mlm_loss_fn, x, ori_x, rng, nb_iter, rand_init, aux,
        eps, eps_iter, max_iter, clip_min, clip_max, norm, use_pallas,
    )
    adv, text_grad = _maybe_vl_core(
        vl_loss_fn, embed_fn, adv, ori_x, positions, vl_rng, aux, do_vl,
        eps, eps_iter, norm, clip_min, clip_max, use_pallas,
    )
    return adv, feat_losses, mlm_losses, text_grad, tuple(
        aux[k] for k in target_keys
    )


def pgd_multi_restart(
    loss_fn: LossFn,
    x: jnp.ndarray,
    ori_x: jnp.ndarray,
    rng: jax.Array,
    aux: Any = None,
    n_restarts: int = 4,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random-restart PGD (the upstream suite's multi-restart behavior,
    ``test_attacks.py:520`` family): run ``n_restarts`` independent
    rand-init trajectories in one vmapped program and keep, per sample, the
    restart with the highest final loss.

    Ranking semantics (pinned by ``test_pgd.py::test_multi_restart_ranking``):
    the final adversarial iterate of each restart is RE-EVALUATED under a
    fresh PRNG key derived from ``rng`` (the scan-recorded loss at step t is
    evaluated before that step's update, so it is one iterate stale).  For
    the deterministic feature-loss family this is exact.  For stochastic
    losses — the MAR/MLM family re-samples its 15% mask from the key — the
    re-evaluation draws a NEW mask, so selection carries one sample of mask
    noise; it is still fully reproducible given ``rng``.  Callers that need
    noise-free MAR ranking should rank on ``best_losses[-1]`` (the last
    scan-recorded loss) instead and accept the one-step staleness.
    """
    keys = jax.random.split(rng, n_restarts + 1)
    advs, losses = jax.vmap(
        lambda k: pgd_feature(loss_fn, x, ori_x, k, aux, rand_init=True, **kw)
    )(keys[:-1])  # advs [R, B, ...], losses [R, T, B]
    # rank by the loss of the adv actually returned: the scan's recorded
    # loss at step t is evaluated BEFORE that step's update, so
    # losses[:, -1] is loss(adv_{T-1}), one update behind advs
    final_keys = jax.random.split(keys[-1], n_restarts)
    final = jax.vmap(lambda a, k: loss_fn(a, k, aux)[1])(advs, final_keys)  # [R, B]
    best = jnp.argmax(final, axis=0)  # [B]
    b = x.shape[0]
    adv = advs[best, jnp.arange(b)]
    best_losses = jnp.transpose(losses[best, :, jnp.arange(b)])  # [T, B]
    return adv, best_losses


@partial(jax.jit, static_argnames=("vl_loss_fn", "norm", "use_pallas",
                                   "eps", "eps_iter", "clip_min", "clip_max"))
def pgd_vl_step(
    vl_loss_fn,
    image: jnp.ndarray,
    text_embeds: jnp.ndarray,
    ori_x: jnp.ndarray,
    positions: jnp.ndarray,
    rng: jax.Array,
    aux: Any = None,
    eps: float = 0.125,
    eps_iter: float = 0.01,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    norm: str = LINF,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One joint image+text-embedding step (``pgd_vl``/``fgm_vl``).

    ``vl_loss_fn(image, text_embeds, key, aux) -> (scalar, per_sample)``;
    ``positions [B, P]`` — sub-token indices of the substitutable words
    (``attack_mask``/``text_emb_pick``, ``fgm_vl:117-120``), padded with 0s.

    Returns ``(adv_image, text_grad[B, P, D])`` — the text embeddings are NOT
    perturbed, only their gradient is harvested (SURVEY §2.3).
    """
    grad_fn = jax.value_and_grad(vl_loss_fn, argnums=(0, 1), has_aux=True)
    (_, _), (g_img, g_emb) = grad_fn(image, text_embeds, rng, aux)
    adv = _update(image, g_img, ori_x, eps, eps_iter, norm, clip_min, clip_max, use_pallas)
    text_grad = jnp.take_along_axis(g_emb, positions[:, :, None], axis=1)
    return adv, text_grad
