"""Data-parallel attack sweep over the device mesh.

The 5k-question sweep (``adv_attack.py:415``: one sample at a time on one
GPU) becomes mesh-wide batches of independent attacks: samples shard over
the ``data`` axis, params replicate (or shard over ``model``), and one jitted
program runs the whole PGD scan for every sample in the batch simultaneously.
Per-host artifact writes + host-0 merge replace the reference's gloo
object-gather eval merge (``objectives.py:832-859``; SURVEY §5.8).
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
        else:
            sharded_aux[k] = shard_batch(v, mesh)
    return pgd_feature(
        loss_fn, pixels, ori_pixels, rng, sharded_aux,
        eps=eps, eps_iter=eps_iter, nb_iter=nb_iter,
        clip_min=clip_min, clip_max=clip_max,
        rand_init=rand_init, use_pallas=use_pallas,
    )


def make_sweep_runner(
    pipeline,
    mesh,
    batch_size: Optional[int] = None,
) -> Callable[[list], Dict[str, Any]]:
    """Bucket single-sample attack requests into mesh-wide feature-only PGD
    batches (the dominant config #2/#5 of BASELINE.json).  Samples whose text
    attack needs per-sample block schedules fall back to
    ``pipeline.attack_sample`` (host-driven blocks), still device-batched
    inside each block."""
    from vqattack_tpu.parallel.mesh import DATA_AXIS

    ndata = mesh.shape[DATA_AXIS]
    bs = batch_size or ndata

    def run(samples: list) -> Dict[str, Any]:
        results = {}
        atk = pipeline.cfg.attack
        feature_only = [s for s in samples if not s.get("paraphrase")]
        rest = [s for s in samples if s.get("paraphrase")]

        for i in range(0, len(feature_only), bs):
            chunk = feature_only[i : i + bs]
            pad = bs - len(chunk)
            px = jnp.concatenate(
                [jnp.asarray(s["pixels"]) for s in chunk]
                + [jnp.zeros_like(jnp.asarray(chunk[0]["pixels"]))] * pad
            )
            ids_list, mask_list = [], []
            for s in chunk + [chunk[0]] * pad:
                i2, m2 = pipeline.tokenizer.encode(s["question"], atk.max_text_len)
                ids_list.append(i2)
                mask_list.append(m2)
            ids = jnp.asarray(ids_list)
            mask = jnp.asarray(mask_list)
            rng = jax.random.key(pipeline.cfg.seed + i)
            r_tgt, r_pgd = jax.random.split(rng)
            tgt_img, tgt_txt = pipeline.clean_targets(px, ids, mask, r_tgt)
            aux = {
                "variables": pipeline.surrogate_params,
                "text_ids": ids,
                "text_mask": mask,
                "tgt_txt": tgt_txt,
                "tgt_img": tgt_img,
                "txt_token_mask": mask.astype(jnp.float32),
                "special_ids": pipeline._special,
            }
            adv, losses = batched_attack_step(
                pipeline._feature_loss, px, px, r_pgd, aux, mesh,
                eps=atk.eps, eps_iter=atk.step_size, nb_iter=atk.num_iters,
                clip_min=atk.clip_min, clip_max=atk.clip_max,
                rand_init=atk.rand_init, use_pallas=pipeline.use_pallas,
            )
            import numpy as np

            adv_np = np.asarray(adv)
            for j, s in enumerate(chunk):
                results[str(s["qid"])] = {
                    "adv_image": adv_np[j : j + 1],
                    "adv_text": s["question"],
                    "losses": np.asarray(losses)[:, j],
                }

        for s in rest:
            r = pipeline.attack_sample(
                s["pixels"], s["question"], s["qid"], s.get("paraphrase"),
                s.get("target_answer"), s.get("all_correct_answers", ()),
            )
            results[str(s["qid"])] = {
                "adv_image": r.adv_image,
                "adv_text": r.adv_text,
                "losses": r.feat_losses,
            }
        return results

    return run
