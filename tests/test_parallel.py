"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch, shard_params


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallelism=2)
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2
    mesh1 = make_mesh(8)
    assert mesh1.shape[DATA_AXIS] == 8


def test_shard_batch_and_params_placement():
    mesh = make_mesh(8, model_parallelism=2)
    x = jnp.zeros((8, 4, 4, 3))
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec[0] == DATA_AXIS
    params = {"dense": {"kernel": jnp.zeros((16, 32)), "bias": jnp.zeros(32)}}
    ps = shard_params(params, mesh)
    assert ps["dense"]["kernel"].sharding.spec == (None, MODEL_AXIS)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry-run: full alternating attack step sharded
    dp+tp over 8 virtual devices."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_pgd_matches_single_device():
    """GSPMD partitioning must not change the numerics: the same batched
    program on the mesh and on one device agree."""
    from vqattack_tpu.attacks.pgd import pgd_feature

    def loss_fn(adv, key, aux):
        ps = jnp.sum((adv - aux["t"]) ** 2, axis=(1, 2, 3))
        return jnp.sum(ps), ps

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 8, 8, 3)), jnp.float32)
    aux = {"t": x + 2.0}
    kw = dict(eps=0.3, eps_iter=0.05, nb_iter=4, rand_init=False)
    adv1, l1 = pgd_feature(loss_fn, x, x, jax.random.key(0), aux, **kw)

    mesh = make_mesh(8)
    xs = shard_batch(x, mesh)
    auxs = {"t": shard_batch(aux["t"], mesh)}
    adv2, l2 = pgd_feature(loss_fn, xs, xs, jax.random.key(0), auxs, **kw)
    np.testing.assert_allclose(np.asarray(adv1), np.asarray(adv2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
