"""Input-transformation defenses + DI transform."""

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.defenses import (
    bit_depth_reduction,
    random_resize_pad,
    spatial_smoothing,
)


def test_random_resize_pad():
    x = jnp.ones((2, 16, 16, 3))
    out = random_resize_pad(x, jax.random.key(0), min_scale=0.75)
    assert out.shape == x.shape
    # content shrank: some zero border exists, mass preserved-ish
    o = np.asarray(out)
    assert (o == 0).any()
    assert o.sum() > 0.5 * np.asarray(x).sum()
    # keyed determinism
    out2 = random_resize_pad(x, jax.random.key(0), min_scale=0.75)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_spatial_smoothing_kills_salt_noise():
    rng = np.random.default_rng(0)
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 4, 4, 0] = 1.0  # single salt pixel
    out = np.asarray(spatial_smoothing(jnp.asarray(x), window=3))
    assert out[0, 4, 4, 0] == 0.0  # median removes the outlier


def test_bit_depth_reduction():
    x = jnp.asarray(np.linspace(-1, 1, 64, dtype=np.float32)).reshape(1, 8, 8, 1)
    out = np.asarray(bit_depth_reduction(x, bits=2))
    assert len(np.unique(out)) <= 4
    assert np.abs(out - np.asarray(x)).max() <= (2 / 3) / 2 + 1e-6
