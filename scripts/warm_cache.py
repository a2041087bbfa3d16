"""Pre-compile the sweep's attack programs into the persistent jax cache.

A production 5k sweep executes one compiled program per distinct
(kernel, batch shape, block length, rand-init, label rank) combination:
the block schedule (``compute_iter_schedule``) splits the 40-iteration
budget into ``k+1`` blocks whose lengths depend on ``k`` = number of
substitutable words, so the first samples of a cold run pay a compile per
new shape.  Through a remote-compile relay each compile can take minutes;
this script walks the whole shape lattice up front, lowering with
``jax.ShapeDtypeStruct`` (no parameter materialization) and compiling into
``jax_compilation_cache_dir`` so the sweep itself never stalls.

Usage::

    python scripts/warm_cache.py [--model albef|vlmo] [--batch-sizes 1,8]
        [--max-k 8] [--iters 40] [--image-size 480] [--cache-dir DIR]
        [--dtype bfloat16] [--no-remat] [--softmax-dtype bfloat16] [--dynamic]

Pass the same ``--dtype`` / ``--no-remat`` / ``--softmax-dtype`` the sweep
will use (e.g. the fastest measured config ``--dtype bfloat16 --no-remat
--softmax-dtype bfloat16``) — they change the compiled HLO, so warming the
default config does not cover them.  ``--dynamic`` matches a
``--dynamic-pgd`` sweep: the whole block lattice collapses to one
traced-trip-count program per (algorithm, label rank), so there is far
less to warm.
``--batch-sizes`` closes downward over powers of two automatically
(``--batch-sizes 8`` warms 1,2,4,8): leftover bucket chunks run at every
power of two below the sweep's ``--batch-size`` (attacks/batched.py).

Prints one line per compiled program; re-runs are no-ops (cache hits).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _vl_widths(max_k: int, max_text_len: int = 25):
    """Power-of-two position widths: the block loop pads each bucket's
    attack-position count up to the next power of two (attacks/batched.py),
    so these widths cover every program the sweep can compile.  The count is
    one position per attackable WORD (text_attack.py:50), so it is hard-
    bounded by the token budget ``max_text_len`` — cover every power of two
    up to that bound (typically ~2*max_k in practice, but an unusually
    word-dense question can exceed it, and an unwarmed VL program costs a
    multi-minute relay compile mid-sweep)."""
    del max_k  # the text-length bound dominates 2*max_k at every config
    top = 1 << (max(max_text_len, 1) - 1).bit_length()
    widths = [1]
    while widths[-1] < top:
        widths.append(widths[-1] * 2)
    return tuple(widths)


def _distinct_blocks(max_k: int, total_iters: int):
    """{(block_len, is_first_block)} over k = 0..max_k."""
    from vqattack_tpu.attacks.text_attack import compute_iter_schedule

    out = set()
    out.add((total_iters, True))  # k == 0: one full-budget block
    for k in range(1, max_k + 1):
        sched = compute_iter_schedule(k, total_iters)
        for i, n in enumerate(sched):
            out.add((n, i == 0))
    return sorted(out)


def _apply_overrides(cfg, dtype, no_remat, softmax_dtype=None,
                     tap_dtype=None):
    """Mirror run.py::resolve_config's --dtype/--no-remat/--softmax-dtype
    transforms so the warmed programs are HLO-identical to what the sweep
    compiles."""
    import dataclasses

    if no_remat:
        cfg = dataclasses.replace(
            cfg,
            albef=dataclasses.replace(
                cfg.albef,
                vit=dataclasses.replace(cfg.albef.vit, remat=False),
                bert=dataclasses.replace(cfg.albef.bert, remat=False),
            ),
            vlmo=dataclasses.replace(cfg.vlmo, remat=False),
        )
    if dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=dtype)
    if softmax_dtype:
        cfg = dataclasses.replace(
            cfg,
            albef=dataclasses.replace(
                cfg.albef,
                vit=dataclasses.replace(
                    cfg.albef.vit, softmax_dtype=softmax_dtype),
                bert=dataclasses.replace(
                    cfg.albef.bert, softmax_dtype=softmax_dtype),
            ),
            vlmo=dataclasses.replace(cfg.vlmo, softmax_dtype=softmax_dtype),
        )
    if tap_dtype:
        cfg = dataclasses.replace(
            cfg, attack=dataclasses.replace(cfg.attack, tap_dtype=tap_dtype)
        )
    return cfg


def _trunk_dtype(cfg):
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _albef_fused_fns(cfg, model):
    """Replicas of the ALBEF pipeline's ``embed_fn`` / ``targets_fn``
    (attacks/orchestrator.py): HLO-identical by construction so the warmed
    fused-block programs hit the sweep's disk-cache keys — pinned by
    tests/test_warm_cache.py::test_fused_warm_hlo_matches_pipeline."""
    import jax
    import jax.numpy as jnp

    from vqattack_tpu.models.albef import AlbefPretrain, mlm_random_mask

    embed_fn = jax.jit(
        lambda v, ids: model.apply(v, ids, method=AlbefPretrain.embed_text)
    )
    tap_bf16 = cfg.attack.tap_dtype == "bfloat16"

    def targets_fn(ori_px, key2, aux2):
        masked_ids, _ = mlm_random_mask(
            key2, aux2["ori_ids"],
            vocab_size=cfg.albef.bert.vocab_size,
            # HF bert-base special positions, = the sweep tokenizer's
            # (mask, pad, cls) — warm_albef's aux special_ids use the same
            mask_token_id=103, pad_token_id=0, cls_token_id=101,
            mlm_probability=cfg.albef.mlm_probability,
        )
        img_f, txt_f, _ = model.apply(
            aux2["variables"], ori_px, masked_ids, aux2["ori_mask"],
            method=AlbefPretrain.gen_feats,
        )
        if tap_bf16:
            img_f = img_f.astype(jnp.bfloat16)
            txt_f = txt_f.astype(jnp.bfloat16)
        return {"tgt_img": img_f, "tgt_txt": txt_f}

    return embed_fn, targets_fn


def _vlmo_fused_fns(cfg, model):
    """VLMo counterpart of :func:`_albef_fused_fns`
    (attacks/vlmo_orchestrator.py)."""
    import jax
    import jax.numpy as jnp

    from vqattack_tpu.models.vlmo import VLMo

    embed_fn = jax.jit(
        lambda v, ids: model.apply(v, ids, method=VLMo.embed_text)
    )
    tap_bf16 = cfg.attack.tap_dtype == "bfloat16"

    def targets_fn(ori_px, key2, aux2):
        del key2
        _, layer_cls, tokens, token_mask = model.apply(
            aux2["variables"], ori_px, aux2["ori_ids"], aux2["ori_mask"],
            method=VLMo.attack_feats,
        )
        if tap_bf16:
            layer_cls = layer_cls.astype(jnp.bfloat16)
            tokens = tokens.astype(jnp.bfloat16)
        return {
            "tgt_layer_cls": layer_cls,
            "tgt_tokens": tokens,
            "tgt_token_mask": token_mask.astype(jnp.float32),
        }

    return embed_fn, targets_fn


def warm_albef(batch_sizes, max_k, total_iters, image_size, use_pallas,
               cfg=None, *, dtype=None, no_remat=False, dynamic=False,
               softmax_dtype=None, tap_dtype=None, fused=False):
    import jax
    import jax.numpy as jnp

    from vqattack_tpu.attacks import albef as albef_losses
    from vqattack_tpu.attacks.pgd import (
        pgd_alternating,
        pgd_alternating_block,
        pgd_alternating_dynamic,
        pgd_feature,
        pgd_feature_block,
        pgd_feature_dynamic,
        pgd_vl_step,
    )
    from vqattack_tpu.config import albef_attack_config
    from vqattack_tpu.models.albef import AlbefPretrain

    cfg = _apply_overrides(cfg or albef_attack_config(), dtype, no_remat,
                           softmax_dtype, tap_dtype)
    model = AlbefPretrain(cfg.albef, dtype=_trunk_dtype(cfg))
    atk = cfg.attack
    s = atk.max_text_len
    d = cfg.albef.bert.hidden_size
    n_img = (image_size // cfg.albef.vit.patch_size) ** 2 + 1
    txt_layers = cfg.albef.bert.num_layers + 1
    img_layers = cfg.albef.vit.depth + 1
    f32, i32 = jnp.float32, jnp.int32
    tapdt = jnp.bfloat16 if cfg.attack.tap_dtype == "bfloat16" else f32
    sds = jax.ShapeDtypeStruct
    key = jax.random.key(0)

    from vqattack_tpu.attacks.batched import make_mixed_second_loss

    feat = albef_losses.make_feature_loss(model)
    mlm = albef_losses.make_mlm_loss(model)
    vl = albef_losses.make_vl_loss(model)
    mixed = make_mixed_second_loss(model)

    embed_fn, targets_fn = _albef_fused_fns(cfg, model)
    count = 0
    for b in batch_sizes:
        px = sds((b, image_size, image_size, 3), f32)
        params = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((b, image_size, image_size, 3)),
                                 jnp.ones((b, s), i32), jnp.ones((b, s), i32),
                                 method=AlbefPretrain.init_all),
            key,
        )
        aux = {
            "variables": params,
            "text_ids": sds((b, s), i32),
            "text_mask": sds((b, s), i32),
            "tgt_txt": sds((b, txt_layers, s, d), tapdt),
            "tgt_img": sds((b, img_layers, n_img, d), tapdt),
            "txt_token_mask": sds((b, s), f32),
            "special_ids": (103, 0, 101),
        }
        mlm_aux = dict(
            aux,
            mlm_ids=sds((b, s), i32),
            mlm_mask=sds((b, s), i32),
            mlm_labels=sds((b, s), i32),
        )
        mlm_aux3 = dict(mlm_aux, mlm_labels=sds((b, atk.max_answers, s), i32))
        common = dict(eps=atk.eps, eps_iter=atk.step_size,
                      clip_min=atk.clip_min, clip_max=atk.clip_max,
                      use_pallas=use_pallas)

        if dynamic and fused:
            # --fused-block sweeps (the production default under
            # --dynamic-pgd): one program per (algorithm, first/rest,
            # label rank, VL width)
            nb, ri, dv = sds((), i32), sds((), jnp.bool_), sds((), jnp.bool_)
            tkeys = ("tgt_img", "tgt_txt")
            base = {k: v for k, v in aux.items() if not k.startswith("tgt_")}
            ori_e = dict(ori_ids=sds((b, s), i32), ori_mask=sds((b, s), i32))
            widths = sorted({w for w in _vl_widths(max_k, s)
                             if w >= atk.max_sub_words}
                            | {1 << (atk.max_sub_words - 1).bit_length()})
            for p in widths:
                pos = sds((b, p), i32)

                def _go(fn, *a, tag="", **kw):
                    nonlocal count
                    t0 = time.perf_counter()
                    fn.lower(*a, target_keys=tkeys, **common, **kw).compile()
                    count += 1
                    print(f"albef {tag} b={b} p={p}: "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)

                _go(pgd_feature_block, feat, vl, embed_fn, targets_fn,
                    px, px, key, key, key, nb, ri, dv, pos,
                    dict(base, **ori_e), max_iter=total_iters,
                    tag="feature-block first")
                _go(pgd_feature_block, feat, vl, embed_fn, None,
                    px, px, key, key, key, nb, ri, dv, pos, aux,
                    max_iter=total_iters, tag="feature-block rest")
                for label_aux, rank in ((mlm_aux, 2), (mlm_aux3, 3)):
                    la_first = {k: v for k, v in label_aux.items()
                                if not k.startswith("tgt_")}
                    # first block: MAR alignment holds by construction, so
                    # only the plain-mlm second loss occurs there
                    _go(pgd_alternating_block, feat, mlm, vl, embed_fn,
                        targets_fn, px, px, key, key, key, nb, ri, dv, pos,
                        dict(la_first, **ori_e), max_iter=total_iters // 2,
                        tag=f"alternating-block first labels={rank}D")
                    mix_aux = dict(label_aux, mlm_weight=sds((b,), f32))
                    for second, second_aux, tag in (
                        (mlm, label_aux, ""), (mixed, mix_aux, " mixed"),
                    ):
                        _go(pgd_alternating_block, feat, second, vl,
                            embed_fn, None, px, px, key, key, key, nb, ri,
                            dv, pos, second_aux, max_iter=total_iters // 2,
                            tag=f"alternating-block rest{tag} labels={rank}D")
            continue

        if dynamic:
            # --dynamic-pgd sweeps: the whole block lattice is ONE program
            # per (algorithm, label rank); the VL width is fixed
            nb, ri = sds((), i32), sds((), jnp.bool_)
            t0 = time.perf_counter()
            pgd_feature_dynamic.lower(
                feat, px, px, key, nb, ri, aux, max_iter=total_iters, **common,
            ).compile()
            count += 1
            print(f"albef feature-dynamic b={b}: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            for label_aux, rank in ((mlm_aux, 2), (mlm_aux3, 3)):
                mix_aux = dict(label_aux, mlm_weight=sds((b,), f32))
                for second, second_aux, tag in (
                    (mlm, label_aux, ""), (mixed, mix_aux, " mixed"),
                ):
                    t0 = time.perf_counter()
                    pgd_alternating_dynamic.lower(
                        feat, second, px, px, key, nb, ri, second_aux,
                        max_iter=total_iters // 2, **common,
                    ).compile()
                    count += 1
                    print(f"albef alternating-dynamic{tag} b={b} "
                          f"labels={rank}D: {time.perf_counter() - t0:.1f}s",
                          flush=True)
            for p in sorted({w for w in _vl_widths(max_k, s)
                             if w >= atk.max_sub_words}
                            | {1 << (atk.max_sub_words - 1).bit_length()}):
                t0 = time.perf_counter()
                pgd_vl_step.lower(
                    vl, px, sds((b, s, d), f32), px, sds((b, p), i32), key,
                    aux, **common,
                ).compile()
                count += 1
                print(f"albef vl b={b} p={p}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            continue

        for n, first in _distinct_blocks(max_k, total_iters):
            t0 = time.perf_counter()
            pgd_feature.lower(
                feat, px, px, key, aux, nb_iter=n,
                rand_init=first and atk.rand_init, unroll=atk.scan_unroll,
                **common,
            ).compile()
            count += 1
            print(f"albef feature b={b} nb={n} first={first}: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            for label_aux, rank in ((mlm_aux, 2), (mlm_aux3, 3)):
                # plain MAR second step + the per-sample mixed-weight variant
                # (attacks/batched.py switches to it when a bucket's MAR
                # alignment drifts mid-attack)
                mix_aux = dict(label_aux, mlm_weight=sds((b,), f32))
                for second, second_aux, tag in (
                    (mlm, label_aux, ""), (mixed, mix_aux, " mixed"),
                ):
                    t0 = time.perf_counter()
                    pgd_alternating.lower(
                        feat, second, px, px, key, second_aux, nb_iter=n // 2,
                        rand_init=first and atk.rand_init,
                        unroll=atk.scan_unroll, **common,
                    ).compile()
                    count += 1
                    print(f"albef alternating{tag} b={b} nb={n // 2} "
                          f"first={first} labels={rank}D: "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)

        # one VL joint-step program per (batch, positions) width: the block
        # loop pads positions to the next power of two — warm them all
        for p in _vl_widths(max_k, s):
            t0 = time.perf_counter()
            pgd_vl_step.lower(
                vl, px, sds((b, s, d), f32), px, sds((b, p), i32), key, aux,
                **common,
            ).compile()
            count += 1
            print(f"albef vl b={b} p={p}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
    return count


def warm_vlmo(batch_sizes, max_k, total_iters, image_size, use_pallas,
              cfg=None, *, dtype=None, no_remat=False, dynamic=False,
              softmax_dtype=None, tap_dtype=None, fused=False):
    import jax
    import jax.numpy as jnp

    from vqattack_tpu.attacks import vlmo as vlmo_losses
    from vqattack_tpu.attacks.pgd import (
        pgd_alternating,
        pgd_alternating_block,
        pgd_alternating_dynamic,
        pgd_feature,
        pgd_feature_block,
        pgd_feature_dynamic,
        pgd_vl_step,
    )
    from vqattack_tpu.config import vlmo_attack_config
    from vqattack_tpu.models.vlmo import VLMo

    cfg = _apply_overrides(cfg or vlmo_attack_config(), dtype, no_remat,
                           softmax_dtype, tap_dtype)
    model = VLMo(cfg.vlmo, dtype=_trunk_dtype(cfg))
    atk = cfg.attack
    t = cfg.vlmo.max_text_len
    d = cfg.vlmo.hidden_size
    n_img = (image_size // cfg.vlmo.patch_size) ** 2 + 1
    seq = t + n_img
    layers = cfg.vlmo.depth + 1
    f32, i32 = jnp.float32, jnp.int32
    tapdt = jnp.bfloat16 if cfg.attack.tap_dtype == "bfloat16" else f32
    sds = jax.ShapeDtypeStruct
    key = jax.random.key(0)

    from vqattack_tpu.attacks.batched import make_vlmo_mixed_second_loss

    feat = vlmo_losses.make_feature_loss(model)
    mlm = vlmo_losses.make_mlm_loss(model)
    vl = vlmo_losses.make_vl_loss(model)
    mixed = make_vlmo_mixed_second_loss(model)

    embed_fn, targets_fn = _vlmo_fused_fns(cfg, model)
    count = 0
    for b in batch_sizes:
        px = sds((b, image_size, image_size, 3), f32)
        params = jax.eval_shape(
            lambda k: model.init(k, jnp.ones((b, t), i32), jnp.ones((b, t), i32),
                                 jnp.zeros((b, image_size, image_size, 3)),
                                 method=VLMo.init_all),
            key,
        )
        rel = sds((cfg.vlmo.depth, cfg.vlmo.num_heads, seq, seq), f32)
        aux = {
            "variables": params,
            "text_ids": sds((b, t), i32),
            "text_mask": sds((b, t), i32),
            "rel_biases": rel,
            "tgt_layer_cls": sds((b, layers, d), tapdt),
            "tgt_tokens": sds((b, layers, seq, d), tapdt),
            "tgt_token_mask": sds((b, seq), f32),
        }
        mlm_aux = dict(
            aux,
            mlm_ids=sds((b, t), i32),
            mlm_mask=sds((b, t), i32),
            mlm_labels=sds((b, t), i32),
        )
        mlm_aux3 = dict(mlm_aux, mlm_labels=sds((b, atk.max_answers, t), i32))
        common = dict(eps=atk.eps, eps_iter=atk.step_size,
                      clip_min=atk.clip_min, clip_max=atk.clip_max,
                      use_pallas=use_pallas)

        if dynamic and fused:
            nb, ri, dv = sds((), i32), sds((), jnp.bool_), sds((), jnp.bool_)
            tkeys = ("tgt_layer_cls", "tgt_tokens", "tgt_token_mask")
            base = {k: v for k, v in aux.items() if not k.startswith("tgt_")}
            ori_e = dict(ori_ids=sds((b, t), i32), ori_mask=sds((b, t), i32))
            widths = sorted({w for w in _vl_widths(max_k, t)
                             if w >= atk.max_sub_words}
                            | {1 << (atk.max_sub_words - 1).bit_length()})
            for p in widths:
                pos = sds((b, p), i32)

                def _go(fn, *a, tag="", **kw):
                    nonlocal count
                    t0 = time.perf_counter()
                    fn.lower(*a, target_keys=tkeys, **common, **kw).compile()
                    count += 1
                    print(f"vlmo {tag} b={b} p={p}: "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)

                _go(pgd_feature_block, feat, vl, embed_fn, targets_fn,
                    px, px, key, key, key, nb, ri, dv, pos,
                    dict(base, **ori_e), max_iter=total_iters,
                    tag="feature-block first")
                _go(pgd_feature_block, feat, vl, embed_fn, None,
                    px, px, key, key, key, nb, ri, dv, pos, aux,
                    max_iter=total_iters, tag="feature-block rest")
                for label_aux, rank in ((mlm_aux, 2), (mlm_aux3, 3)):
                    la_first = {k: v for k, v in label_aux.items()
                                if not k.startswith("tgt_")}
                    _go(pgd_alternating_block, feat, mlm, vl, embed_fn,
                        targets_fn, px, px, key, key, key, nb, ri, dv, pos,
                        dict(la_first, **ori_e), max_iter=total_iters // 2,
                        tag=f"alternating-block first labels={rank}D")
                    mix_aux = dict(label_aux, mlm_weight=sds((b,), f32))
                    for second, second_aux, tag in (
                        (mlm, label_aux, ""), (mixed, mix_aux, " mixed"),
                    ):
                        _go(pgd_alternating_block, feat, second, vl,
                            embed_fn, None, px, px, key, key, key, nb, ri,
                            dv, pos, second_aux, max_iter=total_iters // 2,
                            tag=f"alternating-block rest{tag} labels={rank}D")
            continue

        if dynamic:
            nb, ri = sds((), i32), sds((), jnp.bool_)
            t0 = time.perf_counter()
            pgd_feature_dynamic.lower(
                feat, px, px, key, nb, ri, aux, max_iter=total_iters, **common,
            ).compile()
            count += 1
            print(f"vlmo feature-dynamic b={b}: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            for label_aux, rank in ((mlm_aux, 2), (mlm_aux3, 3)):
                mix_aux = dict(label_aux, mlm_weight=sds((b,), f32))
                for second, second_aux, tag in (
                    (mlm, label_aux, ""), (mixed, mix_aux, " mixed"),
                ):
                    t0 = time.perf_counter()
                    pgd_alternating_dynamic.lower(
                        feat, second, px, px, key, nb, ri, second_aux,
                        max_iter=total_iters // 2, **common,
                    ).compile()
                    count += 1
                    print(f"vlmo alternating-dynamic{tag} b={b} "
                          f"labels={rank}D: {time.perf_counter() - t0:.1f}s",
                          flush=True)
            for p in sorted({w for w in _vl_widths(max_k, t)
                             if w >= atk.max_sub_words}
                            | {1 << (atk.max_sub_words - 1).bit_length()}):
                t0 = time.perf_counter()
                pgd_vl_step.lower(
                    vl, px, sds((b, t, d), f32), px, sds((b, p), i32), key,
                    aux, **common,
                ).compile()
                count += 1
                print(f"vlmo vl b={b} p={p}: "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            continue

        for n, first in _distinct_blocks(max_k, total_iters):
            t0 = time.perf_counter()
            pgd_feature.lower(
                feat, px, px, key, aux, nb_iter=n,
                rand_init=first and atk.rand_init, unroll=atk.scan_unroll,
                **common,
            ).compile()
            count += 1
            print(f"vlmo feature b={b} nb={n} first={first}: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            for label_aux, rank in ((mlm_aux, 2), (mlm_aux3, 3)):
                mix_aux = dict(label_aux, mlm_weight=sds((b,), f32))
                for second, second_aux, tag in (
                    (mlm, label_aux, ""), (mixed, mix_aux, " mixed"),
                ):
                    t0 = time.perf_counter()
                    pgd_alternating.lower(
                        feat, second, px, px, key, second_aux, nb_iter=n // 2,
                        rand_init=first and atk.rand_init,
                        unroll=atk.scan_unroll, **common,
                    ).compile()
                    count += 1
                    print(f"vlmo alternating{tag} b={b} nb={n // 2} "
                          f"first={first} labels={rank}D: "
                          f"{time.perf_counter() - t0:.1f}s", flush=True)
        for p in _vl_widths(max_k, t):
            t0 = time.perf_counter()
            pgd_vl_step.lower(
                vl, px, sds((b, t, d), f32), px, sds((b, p), i32), key, aux,
                **common,
            ).compile()
            count += 1
            print(f"vlmo vl b={b} p={p}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
    return count


def expand_batch_sizes(requested) -> tuple:
    """Close the requested batch sizes under powers of two below each:
    leftover bucket chunks run at every power of two under the sweep's
    --batch-size (attacks/batched.py), so those tail programs need warming
    too."""
    requested = list(requested)
    sizes = set(requested)
    for b in requested:
        p = 1
        while p < b:
            sizes.add(p)
            p *= 2
    return tuple(sorted(sizes))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", choices=("albef", "vlmo"), default="albef")
    ap.add_argument("--batch-sizes", default="1,8")
    ap.add_argument("--max-k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--image-size", type=int, default=480)
    ap.add_argument(
        "--cache-dir", default=None,
        help="compile-cache dir (default: the platform-appropriate repo "
             "cache — .jax_cache on TPU, the CPU-fingerprinted dir on CPU)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="(compatibility no-op: the kernel is off by default)")
    ap.add_argument("--pallas-update", action="store_true",
                    help="match the sweep's --pallas-update opt-in")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default=None,
                    help="match the sweep's --dtype so the warmed programs "
                         "are the ones the sweep compiles")
    ap.add_argument("--no-remat", action="store_true",
                    help="match the sweep's --no-remat")
    ap.add_argument("--softmax-dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="match the sweep's --softmax-dtype (changes the "
                         "compiled HLO)")
    ap.add_argument("--tap-dtype", choices=["float32", "bfloat16"],
                    default=None,
                    help="match the sweep's --tap-dtype (storage dtype of "
                         "the clean feature-target stacks; changes the "
                         "compiled HLO)")
    ap.add_argument("--dynamic", action="store_true",
                    help="match the sweep's --dynamic-pgd: warm the "
                         "traced-trip-count kernels (one program per "
                         "algorithm x label rank instead of the block "
                         "lattice)")
    ap.add_argument("--fused", action="store_true",
                    help="match the production default (--dynamic-pgd with "
                         "fused_block): warm the fused per-block programs "
                         "(clean targets + PGD + VL step in one dispatch) "
                         "instead of the separate dynamic + vl programs; "
                         "implies --dynamic")
    args = ap.parse_args()

    import jax

    from vqattack_tpu.utils.cache import default_cache_dir, enable_compile_cache

    cache_dir = args.cache_dir or default_cache_dir()
    enable_compile_cache(cache_dir)
    use_pallas = (args.pallas_update and not args.no_pallas
                  and jax.default_backend() not in ("cpu",))
    batch_sizes = expand_batch_sizes(
        int(x) for x in args.batch_sizes.split(",")
    )
    fn = warm_vlmo if args.model == "vlmo" else warm_albef
    n = fn(batch_sizes, args.max_k, args.iters, args.image_size, use_pallas,
           dtype=args.dtype, no_remat=args.no_remat,
           dynamic=args.dynamic or args.fused,
           softmax_dtype=args.softmax_dtype, tap_dtype=args.tap_dtype,
           fused=args.fused)
    print(f"warmed {n} programs into {cache_dir}")


if __name__ == "__main__":
    main()
