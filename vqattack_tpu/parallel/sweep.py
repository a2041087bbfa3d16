"""Data-parallel attack sweep over the device mesh.

The 5k-question sweep (``adv_attack.py:415``: one sample at a time on one
GPU) becomes mesh-wide batches of independent attacks: samples shard over
the ``data`` axis, params replicate (or shard over ``model``), and one jitted
program runs the whole PGD scan for every sample in the batch simultaneously.
Per-host artifact writes + host-0 merge replace the reference's gloo
object-gather eval merge (``objectives.py:832-859``; SURVEY §5.8).

There is exactly ONE batched engine: the lockstep bucketed attack in
``attacks/batched.py`` (``BatchedAlbefAttack`` / ``BatchedVlmoAttack``).
Samples with a paraphrase/text-attack schedule run lockstep-bucketed by
``(old_alg, k)`` on the mesh exactly like feature-only samples — nothing
falls back to one-at-a-time attacks.  :func:`make_sweep_runner` is a thin
convenience wrapper over that engine; the CLI (``run.py --batch-size
--mesh-devices``) constructs the engine directly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from vqattack_tpu.attacks.pgd import pgd_feature
from vqattack_tpu.parallel.mesh import shard_batch, shard_params


def batched_attack_step(
    loss_fn,
    pixels: jnp.ndarray,
    ori_pixels: jnp.ndarray,
    rng: jax.Array,
    aux: Any,
    mesh,
    *,
    eps: float,
    eps_iter: float,
    nb_iter: int,
    clip_min: float = -1.0,
    clip_max: float = 1.0,
    rand_init: bool = False,
    use_pallas: bool = False,
    unroll: int = 1,
):
    """One mesh-sharded PGD program over a batch of samples.

    ``pixels [B, H, W, 3]`` with ``B % data_axis == 0``; ``aux`` leaves with a
    leading ``B`` shard likewise, params replicate.  The same
    :func:`~vqattack_tpu.attacks.pgd.pgd_feature` kernel runs — GSPMD
    partitions it; no separate multi-device code path exists.
    """
    pixels = shard_batch(pixels, mesh)
    ori_pixels = shard_batch(ori_pixels, mesh)
    sharded_aux = {}
    for k, v in aux.items():
        if k == "variables":
            sharded_aux[k] = shard_params(v, mesh)
        elif k == "special_ids":
            sharded_aux[k] = v
        elif k == "rel_biases":
            # layer-stacked bias is batch-free: replicate (leading dim is
            # depth, not B — shard_batch would reject it)
            from jax.sharding import NamedSharding, PartitionSpec

            sharded_aux[k] = jax.device_put(v, NamedSharding(mesh, PartitionSpec()))
        else:
            sharded_aux[k] = shard_batch(v, mesh)
    return pgd_feature(
        loss_fn, pixels, ori_pixels, rng, sharded_aux,
        eps=eps, eps_iter=eps_iter, nb_iter=nb_iter,
        clip_min=clip_min, clip_max=clip_max,
        rand_init=rand_init, use_pallas=use_pallas, unroll=unroll,
    )


def make_sweep_runner(
    pipeline,
    mesh,
    batch_size: Optional[int] = None,
) -> Callable[[list], Dict[str, Any]]:
    """Mesh-wide sweep over sample dicts via the lockstep bucketed engine.

    Every sample — with or without a paraphrase/text attack — runs inside a
    ``(old_alg, k)`` bucket of ``attacks/batched.py``: one jitted PGD scan
    advances the whole bucket, the VL step harvests all text gradients at
    once, and batches shard over the mesh's data axis.  This replaces the
    reference's strictly serial per-sample loop (``adv_attack.py:385-735``)
    at scale (BASELINE configs #2/#5).

    Sample dict keys: ``qid, pixels, question`` (+ optional ``paraphrase,
    target_answer, all_correct_answers``).  Returns ``{qid: {adv_image,
    adv_text, losses, mlm_losses, substitutions}}``.
    """
    from vqattack_tpu.attacks.batched import BatchedAlbefAttack, BatchedVlmoAttack
    from vqattack_tpu.parallel.mesh import DATA_AXIS

    ndata = mesh.shape[DATA_AXIS]
    bs = batch_size or ndata
    # duck-typed pipeline dispatch: the VLMo pipeline exposes `model`,
    # the ALBEF pipeline exposes `surrogate`
    if hasattr(pipeline, "surrogate"):
        engine = BatchedAlbefAttack(pipeline, mesh=mesh)
    else:
        engine = BatchedVlmoAttack(pipeline, mesh=mesh)

    def run(samples: list) -> Dict[str, Any]:
        results = engine.run(samples, batch_size=bs)
        out: Dict[str, Any] = {}
        for r in results:
            out[str(r.qid)] = {
                "adv_image": r.adv_image,
                "adv_text": r.adv_text,
                "losses": r.feat_losses,
                "mlm_losses": r.mlm_losses,
                "substitutions": r.substitutions,
            }
        return out

    return run
