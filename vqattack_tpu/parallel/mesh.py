"""Device-mesh construction and sharding rules.

The reference's distributed story is torch DDP + NCCL/gloo collectives
(SURVEY §2.4); the TPU-native equivalent is a ``jax.sharding.Mesh`` with
GSPMD: annotate shardings, let XLA insert the collectives over ICI.

Axes:

- ``data``:  the batch of independent attack samples (the reference is
  hard-locked to batch=1 per GPU; here the 5k sweep shards sample-batches);
- ``model``: tensor-parallel axis for larger surrogates — Dense kernels whose
  output dim divides the axis size shard column-wise, the matching biases
  likewise; everything else replicates.  At ViT-B/BERT-base scale this stays
  size 1 (SURVEY §2.4: TP not needed), but the machinery is exercised in the
  multi-chip dry-run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallelism: int = 1,
    devices=None,
) -> Mesh:
    """1-D data mesh (optionally folded into data x model)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh: kernels whose trailing dim divides
    the model axis shard column-wise (GSPMD inserts the all-gathers /
    reduce-scatters); everything else replicates."""
    model_n = mesh.shape[MODEL_AXIS]

    def place(x):
        if (
            model_n > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[-1] % model_n == 0
        ):
            spec = P(None, MODEL_AXIS)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard leading (sample) axis over the data axis; replicate scalars.

    A batch axis that does not divide the data-mesh size replicates instead
    (needed for a sweep's ragged TAIL bucket), but warns once per (batch,
    mesh) shape: if every bucket replicates — --batch-size not a multiple of
    --mesh-devices — the "sharded" sweep silently computes the full batch on
    every device with zero speedup.
    """
    n = mesh.shape[DATA_AXIS]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if x.shape[0] % n != 0:
                _warn_indivisible_once(x.shape[0], n)
                return jax.device_put(x, NamedSharding(mesh, P()))
            return jax.device_put(
                x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, batch)


_warned_indivisible: set = set()


def _warn_indivisible_once(b: int, n: int) -> None:
    if (b, n) in _warned_indivisible:
        return
    _warned_indivisible.add((b, n))
    import warnings

    warnings.warn(
        f"batch axis {b} not divisible by data-mesh size {n}: replicating "
        f"(fine for a sweep's tail bucket; if this happens for EVERY "
        f"bucket, pick --batch-size as a multiple of --mesh-devices)",
        stacklevel=3,
    )
