"""Attack-zoo extras: CW-L2 against a toy classifier (upstream-cleverhans
test style), noise and semantic baselines."""

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.attacks.extra import carlini_wagner_l2, noise, semantic

W = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)), jnp.float32)


def toy_logits(x):
    return x.reshape(x.shape[0], -1) @ W


def test_semantic_and_noise():
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 2, 2, 2)), jnp.float32)
    np.testing.assert_allclose(np.asarray(semantic(x)), -np.asarray(x))
    out = noise(x, jax.random.key(0), eps=0.1)
    assert np.abs(np.asarray(out - x)).max() <= 0.1 + 1e-6
    assert np.asarray(out).max() <= 1.0


def test_carlini_wagner_flips_labels():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 2, 2, 2)), jnp.float32)
    y = jnp.argmax(toy_logits(x), axis=-1)
    adv = carlini_wagner_l2(
        toy_logits, x, y, n_classes=3, rng=jax.random.key(0),
        max_iterations=80, binary_search_steps=4, initial_const=1.0, lr=5e-2,
    )
    adv_pred = jnp.argmax(toy_logits(adv), axis=-1)
    flips = int(np.sum(np.asarray(adv_pred) != np.asarray(y)))
    assert flips >= 3, f"CW flipped only {flips}/4"
    # stays in range
    assert np.asarray(adv).max() <= 1 + 1e-5 and np.asarray(adv).min() >= -1 - 1e-5


def test_classifier_fgm_pgd():
    from vqattack_tpu.attacks.extra import fgm_classifier, pgd_classifier

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 2, 2, 2)), jnp.float32)
    y = jnp.argmax(toy_logits(x), axis=-1)

    adv_f = fgm_classifier(toy_logits, x, y, eps=0.2)
    assert (np.abs(np.asarray(adv_f - x)) <= 0.2 + 1e-6).all()

    adv_p = pgd_classifier(toy_logits, x, y, jax.random.key(0),
                           eps=0.3, eps_iter=0.05, nb_iter=20)
    assert (np.abs(np.asarray(adv_p - x)) <= 0.3 + 1e-6).all()
    flips = int((jnp.argmax(toy_logits(adv_p), -1) != y).sum())
    assert flips >= 6, flips  # untargeted PGD flips most of the toy batch

    # targeted variant moves toward the target class
    tgt = (y + 1) % 3
    adv_t = pgd_classifier(toy_logits, x, tgt, jax.random.key(1),
                           eps=0.5, eps_iter=0.05, nb_iter=30, targeted=True)
    hits = int((jnp.argmax(toy_logits(adv_t), -1) == tgt).sum())
    assert hits >= 6, hits


def test_mim_and_spsa():
    from vqattack_tpu.attacks.extra import momentum_iterative_method, spsa

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (6, 2, 2, 2)), jnp.float32)
    y = jnp.argmax(toy_logits(x), axis=-1)

    adv_m = momentum_iterative_method(toy_logits, x, y, eps=0.3, eps_iter=0.05,
                                      nb_iter=15)
    assert (np.abs(np.asarray(adv_m - x)) <= 0.3 + 1e-6).all()
    flips_m = int((jnp.argmax(toy_logits(adv_m), -1) != y).sum())
    assert flips_m >= 4, flips_m

    adv_s = spsa(toy_logits, x, y, jax.random.key(0), eps=0.4, nb_iter=40,
                 spsa_samples=64, lr=0.02)
    assert (np.abs(np.asarray(adv_s - x)) <= 0.4 + 1e-6).all()
    flips_s = int((jnp.argmax(toy_logits(adv_s), -1) != y).sum())
    assert flips_s >= 4, flips_s  # gradient-free still breaks the toy model
