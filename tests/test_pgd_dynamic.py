"""Dynamic-trip-count PGD: bit-parity with the static kernels.

The dynamic kernels (``pgd_feature_dynamic`` / ``pgd_alternating_dynamic``)
collapse the sweep's XLA program lattice by tracing ``nb_iter`` and
``rand_init`` (PERF.md round 3).  Their contract: the adversarial
trajectory is bit-identical to the static kernel at ``scan_unroll=1`` for
every (nb_iter, rand_init); the recorded loss rows agree to
reduction-reassociation tolerance (the loss scalar is a cross-program
reduction; the gradient path is what must match bitwise).  Reference
semantics under test: ``projected_gradient_descent.py:106-189``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks.pgd import (
    pgd_alternating,
    pgd_alternating_dynamic,
    pgd_feature,
    pgd_feature_dynamic,
)


def test_threefry_split_prefix_property():
    """The dynamic kernels index ``split(key, max_iter)[:nb_iter]`` where the
    static kernels use ``split(key, nb_iter)``; equality of the two key
    sequences is what makes them bit-identical.  Threefry's counter layout
    guarantees the prefix property — pin it so a PRNG-impl change fails
    loudly here instead of as silent trajectory drift."""
    key = jax.random.PRNGKey(7)
    full = np.asarray(jax.random.split(key, 40))
    for n in (1, 2, 5, 13, 40):
        assert np.array_equal(full[:n], np.asarray(jax.random.split(key, n)))


def _feat_loss(adv, key, aux):
    ps = jnp.sum((adv - aux["t"]) ** 2, axis=(1, 2, 3))
    return jnp.sum(ps), ps


def _mlm_loss(adv, key, aux):
    # key-consuming second loss (mirrors the MAR step's keyed masking)
    noise = jax.random.normal(key, adv.shape[:1]) * 0.0
    ps = jnp.sum(jnp.abs(adv - aux["u"]), axis=(1, 2, 3)) * 0.05 + noise
    return jnp.sum(ps), ps


@pytest.fixture(scope="module")
def toy():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
    aux = {
        "t": jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8)),
        "u": jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 8)),
    }
    return x, aux


@pytest.mark.parametrize("nb_iter", [1, 4, 7])
@pytest.mark.parametrize("rand_init", [False, True])
def test_feature_dynamic_matches_static(toy, nb_iter, rand_init):
    x, aux = toy
    rng = jax.random.PRNGKey(3)
    a_s, l_s = pgd_feature(
        _feat_loss, x, x, rng, aux, nb_iter=nb_iter, rand_init=rand_init,
        unroll=1,
    )
    a_d, l_d = pgd_feature_dynamic(
        _feat_loss, x, x, rng, jnp.int32(nb_iter), jnp.asarray(rand_init),
        aux, max_iter=40,
    )
    assert np.array_equal(np.asarray(a_s), np.asarray(a_d))
    np.testing.assert_allclose(
        np.asarray(l_s), np.asarray(l_d)[:nb_iter], rtol=1e-6
    )
    assert not np.asarray(l_d)[nb_iter:].any()  # tail rows stay zero


@pytest.mark.parametrize("nb_iter", [1, 3, 10])
@pytest.mark.parametrize("rand_init", [False, True])
def test_alternating_dynamic_matches_static(toy, nb_iter, rand_init):
    x, aux = toy
    rng = jax.random.PRNGKey(4)
    a_s, f_s, m_s = pgd_alternating(
        _feat_loss, _mlm_loss, x, x, rng, aux, nb_iter=nb_iter,
        rand_init=rand_init, unroll=1,
    )
    a_d, f_d, m_d = pgd_alternating_dynamic(
        _feat_loss, _mlm_loss, x, x, rng, jnp.int32(nb_iter),
        jnp.asarray(rand_init), aux, max_iter=20,
    )
    assert np.array_equal(np.asarray(a_s), np.asarray(a_d))
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_d)[:nb_iter], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_d)[:nb_iter], rtol=1e-6)


def test_dynamic_one_program_many_lengths(toy):
    """The point of the path: every (nb_iter, rand_init) combination reuses
    ONE compiled executable."""
    if not hasattr(pgd_feature_dynamic, "_cache_size"):
        # private jit-cache introspection API; not stable across JAX
        # versions — the equivalence tests still cover the path's math
        pytest.skip("jitted._cache_size() unavailable in this JAX version")
    x, aux = toy
    rng = jax.random.PRNGKey(5)
    pgd_feature_dynamic(  # first call compiles (or reuses an earlier test's)
        _feat_loss, x, x, rng, jnp.int32(3), jnp.asarray(True), aux,
        max_iter=40,
    )
    n0 = pgd_feature_dynamic._cache_size()
    for n, ri in [(1, True), (2, False), (5, False), (40, False), (7, True)]:
        pgd_feature_dynamic(
            _feat_loss, x, x, rng, jnp.int32(n), jnp.asarray(ri), aux,
            max_iter=40,
        )
    assert pgd_feature_dynamic._cache_size() == n0  # no re-specialization


def test_dynamic_eps_ball_and_clip(toy):
    """Ball projection + clamp invariants survive the while-loop rewrite."""
    x, aux = toy
    x = jnp.clip(x, -1.0, 1.0)
    adv, _ = pgd_feature_dynamic(
        _feat_loss, x, x, jax.random.PRNGKey(6), jnp.int32(40),
        jnp.asarray(True), aux, max_iter=40, eps=0.125, eps_iter=0.01,
    )
    a = np.asarray(adv)
    assert (np.abs(a - np.asarray(x)) <= 0.125 + 1e-6).all()
    assert (a >= -1.0 - 1e-6).all() and (a <= 1.0 + 1e-6).all()


# ---------------------------------------------------------------------------
# real-model wiring: the batched engine under dynamic_pgd must reproduce the
# static engine's results (scan_unroll=1) end to end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def engines():
    from vqattack_tpu.attacks.batched import BatchedAlbefAttack
    from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
    from vqattack_tpu.config import tiny_test_config
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.models.bert import FusionBert
    from vqattack_tpu.text.similarity import NullGate
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    tok = WordPieceTokenizer.toy(words)
    base = tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=tok.vocab_size)
    albef_cfg = dataclasses.replace(base.albef, bert=bert)
    cfg_s = dataclasses.replace(
        base,
        albef=albef_cfg,
        attack=dataclasses.replace(base.attack, scan_unroll=1),
    )
    cfg_d = dataclasses.replace(
        cfg_s, attack=dataclasses.replace(cfg_s.attack, dynamic_pgd=True)
    )

    surrogate = AlbefPretrain(albef_cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, cfg_s.attack.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: surrogate.init(k, px, ids, mask, method=AlbefPretrain.init_all)
    )(jax.random.key(0))
    mlm_cfg = dataclasses.replace(bert, fusion_layer=bert.num_layers)
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids, mask))(jax.random.key(1))

    def make(cfg):
        pipe = AlbefAttackPipeline(
            cfg, surrogate, sparams, tok, NullGate(),
            mlm_model=mlm, mlm_params=mparams, use_pallas=False,
        )
        return BatchedAlbefAttack(pipe)

    return make(cfg_s), make(cfg_d)


def test_batched_dynamic_matches_static(engines):
    static_eng, dyn_eng = engines
    rng = np.random.default_rng(0)
    samples = []
    for i in range(2):
        samples.append({
            "qid": str(4000 + i),
            "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
            "question": "what color is the dog",
            "paraphrase": "the dog is red.",
            "target_answer": "red",
            "all_correct_answers": ["red", "blue"],
        })
    r_s = static_eng.run([dict(s) for s in samples], batch_size=2)
    r_d = dyn_eng.run([dict(s) for s in samples], batch_size=2)
    assert len(r_s) == len(r_d) == 2
    for a, b in zip(r_s, r_d):
        assert a.qid == b.qid
        assert a.adv_text == b.adv_text
        np.testing.assert_allclose(a.adv_image, b.adv_image, atol=1e-6)
        assert a.feat_losses.shape == b.feat_losses.shape
        np.testing.assert_allclose(
            a.feat_losses, b.feat_losses, rtol=2e-4, atol=1e-5
        )
