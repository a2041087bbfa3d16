"""A/B the attention backends on the real chip: full-size ALBEF surrogate,
xla einsum vs Pallas flash (segment-ids padding), forward features and a
short PGD trajectory.

Prints max deviations; used as the numeric evidence gate before flipping the
default attention backend (PERF.md).  Run on TPU:

    python scripts/ab_attn.py [nb_iter]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.utils.cache import enable_compile_cache


def main() -> None:
    enable_compile_cache()
    nb_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from vqattack_tpu.attacks import albef as albef_losses
    from vqattack_tpu.attacks.pgd import pgd_feature
    from vqattack_tpu.config import albef_attack_config
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.ops.attention import attention_impl

    cfg = albef_attack_config()
    model = AlbefPretrain(cfg.albef)
    s = cfg.attack.max_text_len
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (1, 480, 480, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (1, s)), jnp.int32).at[:, 0].set(101)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)

    feats = {}
    for impl in ("xla", "flash"):
        with attention_impl(impl):
            img_f, txt_f, _ = jax.jit(
                lambda v, p, i, m: model.apply(
                    v, p, i, m, method=AlbefPretrain.gen_feats
                )
            )(params, px, ids, mask)
            feats[impl] = (np.asarray(img_f), np.asarray(txt_f))
    img_dev = np.max(np.abs(feats["xla"][0] - feats["flash"][0]))
    txt_dev = np.max(np.abs(feats["xla"][1] - feats["flash"][1]))
    scale = float(np.max(np.abs(feats["xla"][0])))
    print(f"forward max|Δ| img={img_dev:.3e} txt={txt_dev:.3e} "
          f"(feature scale ~{scale:.1f})", flush=True)

    aux = {
        "variables": params,
        "text_ids": ids,
        "text_mask": mask,
        "tgt_txt": jnp.asarray(feats["xla"][1]),
        "tgt_img": jnp.asarray(feats["xla"][0]),
        "txt_token_mask": mask.astype(jnp.float32),
        "special_ids": (103, 0, 101),
    }
    atk = cfg.attack
    loss = albef_losses.make_feature_loss(model)

    traj = {}
    for impl in ("xla", "flash"):
        # pgd_feature is a module-level jit whose statics/avals are identical
        # across the two legs; the attention impl is only read at TRACE time,
        # so without clearing the jit cache the second leg would silently
        # reuse the first leg's executable and the A/B would be vacuous.
        pgd_feature.clear_cache()
        with attention_impl(impl):
            adv, losses = pgd_feature(
                loss, px, px, jax.random.key(7), aux,
                eps=atk.eps, eps_iter=atk.step_size, nb_iter=nb_iter,
                clip_min=atk.clip_min, clip_max=atk.clip_max,
                rand_init=True, use_pallas=True, unroll=atk.scan_unroll,
            )
            traj[impl] = (np.asarray(adv), np.asarray(losses))
    pix_dev = np.max(np.abs(traj["xla"][0] - traj["flash"][0]))
    same = np.mean(traj["xla"][0] == traj["flash"][0])
    lx, lf = traj["xla"][1].ravel(), traj["flash"][1].ravel()
    print(f"{nb_iter}-iter PGD: max pixel |Δ|={pix_dev:.4f} "
          f"(eps_iter={atk.step_size}), identical-pixel frac={same:.4f}",
          flush=True)
    for t in range(nb_iter):
        print(f"  iter {t:2d}: loss xla={lx[t]:+.6f} flash={lf[t]:+.6f} "
              f"Δ={abs(lx[t]-lf[t]):.2e}", flush=True)


if __name__ == "__main__":
    main()
