"""Attack-kernel tests in the upstream-cleverhans style (SURVEY §4): toy
models with closed-form-checkable behavior, ball/clip invariants, trajectory
monotonicity, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.attacks.losses import (
    cosine_sim,
    feature_loss,
    mlm_loss,
    per_sample_mlm_loss,
)
from vqattack_tpu.attacks.norms import clip_eta, optimize_linear
from vqattack_tpu.attacks.pgd import pgd_alternating, pgd_feature, pgd_vl_step

EPS, STEP = 0.3, 0.05


# --- toy losses (module-level: stable static jit args) ---------------------


def quad_loss(adv, key, aux):
    """Ascent target: distance from aux['target'] (grows until ball edge)."""
    del key
    ps = jnp.sum((adv - aux["target"]) ** 2, axis=tuple(range(1, adv.ndim)))
    return jnp.sum(ps), ps


def linear_loss(adv, key, aux):
    del key
    ps = jnp.sum(adv * aux["w"], axis=tuple(range(1, adv.ndim)))
    return jnp.sum(ps), ps


def test_norms_clip_eta():
    eta = jnp.array([[0.5, -0.7], [0.1, 0.2]])
    out = clip_eta(eta, "linf", 0.3)
    assert float(jnp.max(jnp.abs(out))) <= 0.3 + 1e-7
    out2 = clip_eta(eta, "l2", 0.3)
    norms = jnp.linalg.norm(out2, axis=1)
    assert float(jnp.max(norms)) <= 0.3 + 1e-6
    # inside-ball perturbations untouched
    small = jnp.array([[0.01, -0.02]])
    np.testing.assert_allclose(np.asarray(clip_eta(small, "l2", 0.3)), np.asarray(small))


def test_optimize_linear_maximizes_inner_product():
    g = jnp.array([[0.5, -2.0, 0.0]])
    linf = optimize_linear(g, 0.1, "linf")
    np.testing.assert_allclose(np.asarray(linf), [[0.1, -0.1, 0.0]])
    l2 = optimize_linear(g, 0.1, "l2")
    assert abs(float(jnp.linalg.norm(l2)) - 0.1) < 1e-6
    l1 = optimize_linear(g, 0.1, "l1")
    np.testing.assert_allclose(np.asarray(l1), [[0.0, -0.1, 0.0]], atol=1e-7)


def test_pgd_ball_and_clip_invariants():
    x = jnp.zeros((2, 4, 4, 3)) + 0.9
    aux = {"target": x + 5.0}
    adv, losses = pgd_feature(
        quad_loss, x, x, jax.random.key(0), aux,
        eps=EPS, eps_iter=STEP, nb_iter=10, clip_min=-1.0, clip_max=1.0,
        rand_init=True,
    )
    a = np.asarray(adv)
    assert (np.abs(a - np.asarray(x)) <= EPS + 1e-6).all()
    assert (a <= 1.0 + 1e-7).all() and (a >= -1.0 - 1e-7).all()
    assert losses.shape == (10, 2)


def test_pgd_ascends_loss():
    x = jnp.zeros((1, 8))
    aux = {"w": jnp.ones((1, 8))}
    adv, losses = pgd_feature(
        linear_loss, x, x, jax.random.key(0), aux,
        eps=0.5, eps_iter=0.1, nb_iter=6, clip_min=-1.0, clip_max=1.0,
    )
    # linear ascent: x walks to the +eps corner
    np.testing.assert_allclose(np.asarray(adv), 0.5 * np.ones((1, 8)), atol=1e-6)
    traj = np.asarray(losses)[:, 0]
    assert (np.diff(traj) >= -1e-6).all() and traj[-1] > traj[0]


def test_pgd_deterministic_under_key():
    x = jnp.zeros((2, 6))
    aux = {"w": jnp.ones((2, 6))}
    a1, l1 = pgd_feature(linear_loss, x, x, jax.random.key(7), aux,
                         eps=0.3, eps_iter=0.1, nb_iter=3, rand_init=True)
    a2, l2 = pgd_feature(linear_loss, x, x, jax.random.key(7), aux,
                         eps=0.3, eps_iter=0.1, nb_iter=3, rand_init=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3, _ = pgd_feature(linear_loss, x, x, jax.random.key(8), aux,
                        eps=0.3, eps_iter=0.1, nb_iter=3, rand_init=True)
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_pgd_no_rand_init_starts_at_x():
    """With rand_init=False and 1 iter, adv = project(x + step*sign(g))."""
    x = jnp.zeros((1, 4))
    aux = {"w": jnp.array([[1.0, -1.0, 1.0, -1.0]])}
    adv, _ = pgd_feature(linear_loss, x, x, jax.random.key(0), aux,
                         eps=0.5, eps_iter=0.1, nb_iter=1)
    np.testing.assert_allclose(np.asarray(adv), [[0.1, -0.1, 0.1, -0.1]], atol=1e-7)


def test_pgd_alternating_invariants():
    x = jnp.zeros((2, 4, 4, 3))
    aux = {"target": x + 3.0, "w": jnp.ones_like(x)}
    adv, fl, ml = pgd_alternating(
        quad_loss, linear_loss, x, x, jax.random.key(0), aux,
        eps=EPS, eps_iter=STEP, nb_iter=5, rand_init=True,
    )
    a = np.asarray(adv)
    assert (np.abs(a) <= EPS + 1e-6).all()
    assert fl.shape == (5, 2) and ml.shape == (5, 2)


def test_pgd_vl_step_harvests_positional_gradient():
    def vl_loss(px, emb, key, aux):
        del key
        ps = jnp.sum(px, axis=(1, 2, 3)) + jnp.sum(
            emb * aux["emb_w"], axis=(1, 2)
        )
        return jnp.sum(ps), ps

    px = jnp.zeros((1, 4, 4, 3))
    emb = jnp.zeros((1, 6, 8))
    emb_w = jnp.zeros((1, 6, 8)).at[0, 2].set(1.0).at[0, 4].set(-2.0)
    positions = jnp.array([[2, 4]])
    adv, tgrad = pgd_vl_step(
        vl_loss, px, emb, px, positions, jax.random.key(0),
        {"emb_w": emb_w}, eps=0.5, eps_iter=0.1,
    )
    assert tgrad.shape == (1, 2, 8)
    np.testing.assert_allclose(np.asarray(tgrad[0, 0]), np.ones(8), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tgrad[0, 1]), -2 * np.ones(8), atol=1e-6)
    np.testing.assert_allclose(np.asarray(adv), 0.1 * np.ones_like(px), atol=1e-7)


def test_pallas_update_matches_jnp():
    rng = np.random.default_rng(0)
    shape = (2, 9, 9, 3)  # deliberately not lane-aligned
    adv = jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)
    grad = jnp.asarray(rng.normal(size=shape), jnp.float32)
    ori = jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)
    from vqattack_tpu.ops.pgd_update import pgd_linf_update

    out_pl = pgd_linf_update(adv, grad, ori, 0.125, 0.01, -1.0, 1.0)
    stepped = jnp.clip(adv + 0.01 * jnp.sign(grad), -1.0, 1.0)
    eta = jnp.clip(stepped - ori, -0.125, 0.125)
    ref = jnp.clip(ori + eta, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(ref), atol=1e-7)


def test_feature_loss_masking():
    b, l, s, d = 2, 3, 5, 4
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(b, l, s, d)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(b, l, s, d)), jnp.float32)
    full = feature_loss(a, a, t, t)
    # identical features -> cos=1 everywhere -> loss = -2*B*L*S
    self_loss = feature_loss(a, a, a, a)
    np.testing.assert_allclose(float(self_loss), -2 * b * l * s, rtol=1e-5)
    # masking the last two text tokens changes only the text term
    mask = jnp.asarray(np.concatenate([np.ones((b, 3)), np.zeros((b, 2))], 1), jnp.float32)
    masked = feature_loss(a, a, t, t, txt_token_mask=mask)
    assert float(masked) != float(full)


def test_mlm_loss_multi_answer_and_ignore():
    b, s, v = 2, 4, 7
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(b, s, v)), jnp.float32)
    labels2d = jnp.array([[1, -100, 3, -100], [-100, 2, -100, -100]])
    l2d = mlm_loss(logits, labels2d)
    assert np.isfinite(float(l2d)) and float(l2d) > 0
    # a stacked duplicate doubles the loss; an all-ignore variant adds zero
    labels3d = jnp.stack([labels2d, labels2d], axis=1)
    np.testing.assert_allclose(float(mlm_loss(logits, labels3d)), 2 * float(l2d), rtol=1e-6)
    pad_variant = jnp.full_like(labels2d, -100)
    labels3d_pad = jnp.stack([labels2d, pad_variant], axis=1)
    np.testing.assert_allclose(
        float(mlm_loss(logits, labels3d_pad)), float(l2d), rtol=1e-6
    )
    ps = per_sample_mlm_loss(logits, labels3d_pad)
    assert ps.shape == (b,)


def test_cosine_sim_matches_torch_semantics():
    """norm floored at eps=1e-6 per vector (torch CosineSimilarity)."""
    a = jnp.zeros((1, 3))
    b = jnp.ones((1, 3))
    out = cosine_sim(a, b)
    assert np.isfinite(np.asarray(out)).all()


def test_pgd_multi_restart_picks_best():
    from vqattack_tpu.attacks.pgd import pgd_multi_restart

    x = jnp.zeros((3, 6))
    aux = {"w": jnp.ones((3, 6))}
    adv, losses = pgd_multi_restart(
        linear_loss, x, x, jax.random.key(0), aux, n_restarts=3,
        eps=0.5, eps_iter=0.1, nb_iter=4,
    )
    assert adv.shape == (3, 6) and losses.shape == (4, 3)
    assert (np.abs(np.asarray(adv)) <= 0.5 + 1e-6).all()
    # internal consistency: the selected trajectory dominates every restart
    # it was chosen from (same split keys as the vmapped run)
    keys = jax.random.split(jax.random.key(0), 3)
    finals = []
    for k in np.asarray(jax.random.key_data(keys)):
        _, sl = pgd_feature(
            linear_loss, x, x, jax.random.wrap_key_data(jnp.asarray(k)), aux,
            eps=0.5, eps_iter=0.1, nb_iter=4, rand_init=True,
        )
        finals.append(np.asarray(sl)[-1])
    best_single = np.max(np.stack(finals), axis=0)
    np.testing.assert_allclose(np.asarray(losses)[-1], best_single, atol=1e-5)


def stochastic_loss(adv, key, aux):
    """MAR-family stand-in: the loss depends on the PRNG key (the MLM
    losses re-sample their 15% mask from it)."""
    noise = jax.random.normal(key, (adv.shape[0],)) * 0.1
    ps = jnp.sum(adv * aux["w"], axis=tuple(range(1, adv.ndim))) + noise
    return jnp.sum(ps), ps


def test_multi_restart_ranking():
    """Pins the documented ranking semantics (pgd.py::pgd_multi_restart):
    final iterates are RE-EVALUATED under fresh keys split from the last
    of ``n_restarts + 1`` keys derived from ``rng`` — exact for
    deterministic losses, one fresh mask-noise draw for stochastic (MAR)
    losses, reproducible given ``rng`` either way."""
    from vqattack_tpu.attacks.pgd import pgd_multi_restart

    x = jnp.zeros((2, 5))
    aux = {"w": jnp.ones((2, 5))}
    rng = jax.random.key(7)
    kw = dict(eps=0.5, eps_iter=0.1, nb_iter=3)

    # reproducibility: same rng -> identical selection, stochastic loss too
    adv1, _ = pgd_multi_restart(stochastic_loss, x, x, rng, aux, n_restarts=3, **kw)
    adv2, _ = pgd_multi_restart(stochastic_loss, x, x, rng, aux, n_restarts=3, **kw)
    np.testing.assert_array_equal(np.asarray(adv1), np.asarray(adv2))

    # the selection rule itself: rank by loss_fn(final_adv, fresh_key)
    # where the fresh keys are split from keys[-1]
    keys = jax.random.split(rng, 4)
    advs, _ = jax.vmap(
        lambda k: pgd_feature(stochastic_loss, x, x, k, aux, rand_init=True, **kw)
    )(keys[:-1])
    final_keys = jax.random.split(keys[-1], 3)
    final = jax.vmap(lambda a, k: stochastic_loss(a, k, aux)[1])(advs, final_keys)
    best = np.argmax(np.asarray(final), axis=0)
    expected = np.asarray(advs)[best, np.arange(2)]
    np.testing.assert_allclose(np.asarray(adv1), expected, atol=1e-6)


def test_invalid_norm_raises():
    x = jnp.zeros((1, 4))
    try:
        clip_eta(x, "l7", 0.1)
        assert False, "expected ValueError"
    except ValueError:
        pass
    try:
        optimize_linear(x, 0.1, "l7")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_eps_zero_is_identity():
    """eps=0: rand-init collapses to zero and every projection pins adv to x
    (upstream identity-at-eps-0 behavior, test_attacks.py:291)."""
    x = jnp.full((2, 4), 0.25)
    aux = {"w": jnp.ones((2, 4))}
    adv, _ = pgd_feature(linear_loss, x, x, jax.random.key(0), aux,
                         eps=0.0, eps_iter=0.0, nb_iter=3, rand_init=True)
    np.testing.assert_allclose(np.asarray(adv), np.asarray(x), atol=1e-7)


def test_do_not_reach_ball_boundary():
    """Small step budgets stay strictly inside the eps-ball (upstream
    test_do_not_reach_lp_boundary:422)."""
    x = jnp.zeros((1, 8))
    aux = {"w": jnp.ones((1, 8))}
    adv, _ = pgd_feature(linear_loss, x, x, jax.random.key(0), aux,
                         eps=0.5, eps_iter=0.05, nb_iter=3)  # 0.15 < 0.5
    assert float(jnp.max(jnp.abs(adv - x))) < 0.5 - 1e-6


def test_pgd_l2_norm_path():
    """L2-ball PGD: projected norm bounded, step normalized."""
    x = jnp.zeros((2, 16))
    aux = {"w": jnp.ones((2, 16))}
    adv, losses = pgd_feature(linear_loss, x, x, jax.random.key(0), aux,
                              eps=1.0, eps_iter=0.3, nb_iter=8, norm="l2",
                              rand_init=True)
    norms = np.linalg.norm(np.asarray(adv - x), axis=1)
    assert (norms <= 1.0 + 1e-5).all()
    traj = np.asarray(losses)
    assert traj[-1].min() > traj[0].max() - 1e-6  # ascended


def test_zero_out_clipped_grads():
    from vqattack_tpu.attacks.norms import zero_out_clipped_grads

    x = jnp.asarray([[-1.0, 1.0, 0.0, -1.0, 1.0]])
    g = jnp.asarray([[-2.0, 3.0, 5.0, 4.0, -6.0]])
    out = np.asarray(zero_out_clipped_grads(g, x, -1.0, 1.0))
    # at lower bound with negative grad -> zeroed; at upper with positive -> zeroed
    np.testing.assert_allclose(out, [[0.0, 0.0, 5.0, 4.0, -6.0]])


def test_get_or_guess_labels():
    from vqattack_tpu.attacks.norms import get_or_guess_labels

    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.5]])
    model_fn = lambda x: logits
    x = jnp.zeros((2, 4))
    np.testing.assert_array_equal(
        np.asarray(get_or_guess_labels(model_fn, x)), [1, 0])
    y = jnp.asarray([2, 2])
    np.testing.assert_array_equal(
        np.asarray(get_or_guess_labels(model_fn, x, y=y)), [2, 2])
    np.testing.assert_array_equal(
        np.asarray(get_or_guess_labels(model_fn, x, y=y, targeted=True)), [2, 2])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        get_or_guess_labels(model_fn, x, targeted=True)


def test_scan_unroll_is_numerically_equivalent():
    """unroll widens the scan body only — same math, so trajectories agree
    to float reassociation tolerance (XLA fuses the wider body differently,
    which reorders reductions; observed rel diff ~1e-7).  It is the
    production default via AttackConfig.scan_unroll=4.

    The tight pixel tolerance is safe against sign(grad) discontinuity by
    construction: quad_loss's gradient 2*(adv - target) has magnitude >= ~5
    everywhere on the trajectory (target = +3, |adv| <= eps), so float
    reassociation noise (~1e-7 relative) can never flip a sign.  The
    real-model drift budget at unroll=4 — where near-zero gradient
    components CAN flip — is pinned separately in
    test_reference_differential.py::test_pgd_feature_trajectory_production_unroll."""
    x = jnp.zeros((2, 4, 4, 3))
    aux = {"target": x + 3.0, "w": jnp.ones_like(x)}
    base = pgd_feature(quad_loss, x, x, jax.random.key(3), aux,
                       eps=EPS, eps_iter=STEP, nb_iter=7, rand_init=True)
    for u in (2, 4):
        got = pgd_feature(quad_loss, x, x, jax.random.key(3), aux,
                          eps=EPS, eps_iter=STEP, nb_iter=7, rand_init=True,
                          unroll=u)
        np.testing.assert_allclose(np.asarray(base[0]), np.asarray(got[0]),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(base[1]), np.asarray(got[1]),
                                   rtol=1e-5)
    alt = pgd_alternating(quad_loss, linear_loss, x, x, jax.random.key(3), aux,
                          eps=EPS, eps_iter=STEP, nb_iter=6, rand_init=True)
    alt4 = pgd_alternating(quad_loss, linear_loss, x, x, jax.random.key(3), aux,
                           eps=EPS, eps_iter=STEP, nb_iter=6, rand_init=True,
                           unroll=4)
    for a, b in zip(alt, alt4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
