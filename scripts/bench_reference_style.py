"""Measure a reference-STYLE attack loop on this chip (VERDICT r3 Next #2).

Every ``vs_baseline`` ratio in BENCH_*.json divides by an *assumed* nominal
2.0 sample-iters/s because the reference publishes no wall-clock numbers
(BASELINE.md).  This harness replaces the assumption with a measurement of
the reference's *execution shape* on the same chip and the same surrogate:

- **batch locked to 1** — the reference attacks one sample at a time
  (``adv_attack.py`` iterates the loader with batch_size 1);
- **host Python loop, one dispatch per FGM step** — no ``lax.scan``: each
  iteration is its own jitted call, exactly the eager per-step dispatch of
  ``cleverhans/.../projected_gradient_descent.py:129-189``;
- **device->host loss sync every iteration** — the reference appends
  ``float(loss.cpu())`` to a Python list each step
  (``projected_gradient_descent.py:145,168,183``); reproduced here as an
  ``np.asarray`` transfer of the per-sample loss inside the loop;
- **float32** — the reference's torch runs full precision (no AMP
  anywhere in either attack repo).

What stays native: the jitted step itself is still XLA-compiled (there is
no eager op-by-op mode worth measuring through the tunnel — each op would
pay a relay round-trip the reference's local CUDA dispatch does not pay,
which would *understate* the reference unfairly).  So the measured gap
static-scan vs this harness isolates the *structural* levers the rebuild
actually claims: batching, scan fusion, host-sync elimination, bf16.

Writes ``docs/REFSTYLE_BASELINE.json``; ``bench.py`` picks it up and adds
``vs_reference_style_measured`` (measured / measured) next to the retiring
measured-vs-assumed ``vs_baseline``.

Usage::

    python scripts/bench_reference_style.py [--model albef|vlmo]
        [--iters 40] [--reps 3] [--dtype float32] [--write]

Serial-chip protocol (PERF.md timing addendum): run alone on the chip;
sync via device->host scalar transfer before/after warmup.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "REFSTYLE_BASELINE.json",
)


def build_single_step(model_kind: str, dtype, remat: bool = False):
    """One jitted FGM step (adv, ori, key) -> (adv', per_sample_loss) plus
    the rand-init program and the clean input.

    Mirrors the per-iteration body of the reference's ls==1 path
    (``projected_gradient_descent.py:131-152``): one fwd+bwd for the
    feature loss, sign-step, eps-ball projection, clamp — but jitted as a
    SINGLE step, dispatched per iteration from the host loop.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    if model_kind == "albef":
        from vqattack_tpu.attacks import albef as losses_mod
        from vqattack_tpu.config import albef_attack_config
        from vqattack_tpu.models.albef import AlbefPretrain

        cfg = albef_attack_config()
        albef = dataclasses.replace(
            cfg.albef,
            vit=dataclasses.replace(cfg.albef.vit, remat=remat),
            bert=dataclasses.replace(cfg.albef.bert, remat=remat),
        )
        cfg = dataclasses.replace(cfg, albef=albef)
        model = AlbefPretrain(cfg.albef, dtype=dtype)
        s = cfg.attack.max_text_len
        rng = np.random.default_rng(0)
        px = jnp.asarray(rng.uniform(-1, 1, (1, 480, 480, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(1000, 20000, (1, s)), jnp.int32)
        ids = ids.at[:, 0].set(101)
        mask = jnp.ones_like(ids)
        params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
        gen = jax.jit(
            lambda v, p, i, m: model.apply(
                v, p, i, m, method=AlbefPretrain.gen_feats)
        )
        img_f, txt_f, _ = gen(params, px, ids, mask)
        aux = {
            "variables": params, "text_ids": ids, "text_mask": mask,
            "tgt_txt": txt_f, "tgt_img": img_f,
            "txt_token_mask": mask.astype(jnp.float32),
            "special_ids": (103, 0, 101),
        }
        loss_fn = losses_mod.make_feature_loss(model)
    else:
        from vqattack_tpu.attacks import vlmo as losses_mod
        from vqattack_tpu.config import vlmo_attack_config
        from vqattack_tpu.models.vlmo import VLMo

        cfg = vlmo_attack_config()
        cfg = dataclasses.replace(
            cfg, vlmo=dataclasses.replace(cfg.vlmo, remat=remat))
        model = VLMo(cfg.vlmo, dtype=dtype)
        t = cfg.vlmo.max_text_len
        rng = np.random.default_rng(0)
        px = jnp.asarray(rng.uniform(-1, 1, (1, 480, 480, 3)), jnp.float32)
        ids = jnp.asarray(
            rng.integers(1000, 20000, (1, t)), jnp.int32).at[:, 0].set(101)
        mask = jnp.ones_like(ids)
        params = jax.jit(
            lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
        )(jax.random.key(0))
        attack_feats = jax.jit(
            lambda v, p, i, m: model.apply(
                v, p, i, m, method=VLMo.attack_feats)
        )
        _, layer_cls, tokens, token_mask = attack_feats(params, px, ids, mask)
        rel_biases = jax.jit(
            lambda v: model.apply(v, method=VLMo.precompute_joint_biases)
        )(params)
        aux = {
            "variables": params, "text_ids": ids, "text_mask": mask,
            "tgt_layer_cls": layer_cls, "tgt_tokens": tokens,
            "tgt_token_mask": token_mask.astype(jnp.float32),
            "rel_biases": rel_biases,
        }
        loss_fn = losses_mod.make_feature_loss(model)

    atk = cfg.attack
    from vqattack_tpu.attacks.norms import LINF
    from vqattack_tpu.attacks.pgd import pgd_feature, rand_init_eta

    def step(adv, ori, key):
        # ONE FGM step + eps-ball projection + clamp, dispatched as the
        # nb_iter=1 scan program.  The mathematically identical unscanned
        # single-step HLO exceeds the compile relay's ~20-25 min request
        # limit in EVERY dtype (six broken-pipe attempts recorded round 4),
        # while the scan-of-1 form compiles in minutes like every other
        # kernel here — per-step device work is identical, so the measured
        # loop shape (fresh dispatch per step + host loss sync) is
        # unchanged.  losses[0] is the loss at the pre-update adv, exactly
        # the value the reference appends per iteration.
        adv, losses = pgd_feature(
            loss_fn, adv, ori, key, aux,
            eps=atk.eps, eps_iter=atk.step_size, nb_iter=1,
            clip_min=atk.clip_min, clip_max=atk.clip_max,
            rand_init=False, unroll=1,
        )
        return adv, losses[0]

    @jax.jit
    def init(ori, key):
        eta = rand_init_eta(key, ori.shape, atk.eps, LINF, ori.dtype)
        return jnp.clip(ori + eta, atk.clip_min, atk.clip_max)

    return step, init, px


def run_loop(step, init, px, iters: int):
    """The reference's loop shape: init, then per-iteration dispatch + a
    device->host transfer of the loss scalar (the ``float(loss.cpu())``
    append, ``projected_gradient_descent.py:145``)."""
    import jax
    import numpy as np

    adv = init(px, jax.random.key(1))
    loss_list = []
    for i in range(iters):
        adv, per_sample = step(adv, px, jax.random.key(100 + i))
        # the reference materializes the loss on the host EVERY iteration
        loss_list.append(float(np.asarray(per_sample)[0]))
    # final adv to host, as the reference's .detach().cpu() at loop end
    np.asarray(adv)
    return loss_list


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", choices=("albef", "vlmo"), default="albef")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="float32")
    ap.add_argument("--no-write", action="store_true",
                    help="measure only; do not update docs/REFSTYLE_BASELINE.json")
    ap.add_argument("--remat", action="store_true",
                    help="checkpoint the trunk blocks.  The reference does "
                         "not remat, but at f32 batch=1 remat is the FASTER "
                         "configuration on this chip (r2 matrix: 98.9 vs "
                         "92.8 agg) AND its far smaller backward program "
                         "survives the relay's compile timeout — using it "
                         "makes the baseline faster, i.e. the reported "
                         "speedup conservative")
    args = ap.parse_args()

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqattack_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    step, init, px = build_single_step(
        args.model,
        jnp.float32 if args.dtype == "float32" else jnp.bfloat16,
        remat=args.remat,
    )

    # warm: one full loop (compiles init + step), then hard-sync; transient
    # relay aborts during the one-time compile are retried (utils/retry.py)
    from vqattack_tpu.utils.retry import with_retries

    with_retries(lambda: run_loop(step, init, px, args.iters))
    walls = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run_loop(step, init, px, args.iters)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    iters_per_s = args.iters / wall

    row = {
        "model": args.model,
        "dtype": args.dtype,
        "remat": bool(args.remat),
        "batch": 1,
        "nb_iter": args.iters,
        "reps": args.reps,
        "wall_s_per_attack": round(wall, 4),
        "wall_s_all_reps": [round(w, 4) for w in walls],
        "sample_iters_per_s": round(iters_per_s, 3),
        "device": jax.devices()[0].device_kind,
        "protocol": (
            "reference execution shape on this chip: batch=1, host loop, "
            "one jitted dispatch per FGM step, per-iteration device->host "
            "loss transfer (projected_gradient_descent.py:129-189), "
            "float32, no remat; the step itself is XLA-compiled (eager "
            "op-by-op through the relay would unfairly understate the "
            "reference)"
        ),
    }
    print(json.dumps(row, indent=1))

    if not args.no_write:
        data = {}
        if os.path.exists(ARTIFACT):
            with open(ARTIFACT) as f:
                data = json.load(f)
        data[f"{args.model}_{args.dtype}"] = row
        with open(ARTIFACT, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {ARTIFACT}", file=sys.stderr)


if __name__ == "__main__":
    main()
