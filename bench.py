"""Benchmark: full-size ALBEF PGD attack throughput on one chip.

Measures steady-state PGD iterations/second on the headline configuration
(BASELINE.json config #1/#2): ViT-B/16 @ 480px + 12-layer fusion BERT
surrogate, latent-feature loss, L-inf eps=0.125 step=0.01 — each iteration is
a full forward+backward through the surrogate plus the fused perturbation
update, inside one ``lax.scan`` (zero host syncs).

The PyTorch reference does not publish wall-clock numbers (SURVEY §6); its
per-iteration cost on the reference's assumed 1x A100 is ~2 it/s for this
model/geometry (batch=1, per-iter host syncs).  ``vs_baseline`` is measured
throughput / that nominal 2.0 it/s.

Env knobs: BENCH_BATCH (default 1), BENCH_ITERS (default 40 — one full
reference attack budget per scan),
BENCH_DTYPE (float32|bfloat16, default float32),
BENCH_ATTN (xla|flash, default xla),
BENCH_PRECISION (default|high|highest — TPU matmul passes for f32 inputs;
'highest' = true f32 accumulation for strict gradient parity),
BENCH_REMAT (1 = jax.checkpoint each transformer block),
BENCH_MODEL (albef|vlmo, default albef).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NOMINAL_REFERENCE_ITERS_PER_S = 2.0


def main() -> None:
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from vqattack_tpu.attacks.pgd import pgd_feature
    from vqattack_tpu.config import albef_attack_config, vlmo_attack_config

    if os.environ.get("BENCH_MODEL", "albef") == "vlmo":
        _vlmo_bench()
        return

    from vqattack_tpu.attacks import albef as albef_losses
    from vqattack_tpu.models.albef import AlbefPretrain

    if os.environ.get("BENCH_PRECISION"):
        jax.config.update(
            "jax_default_matmul_precision", os.environ["BENCH_PRECISION"]
        )
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE") == "bfloat16" else jnp.float32

    cfg = albef_attack_config()
    if os.environ.get("BENCH_REMAT") == "1":
        import dataclasses

        albef = cfg.albef
        albef = dataclasses.replace(
            albef,
            vit=dataclasses.replace(albef.vit, remat=True),
            bert=dataclasses.replace(albef.bert, remat=True),
        )
        cfg = dataclasses.replace(cfg, albef=albef)
    model = AlbefPretrain(cfg.albef, dtype=dtype)
    s = cfg.attack.max_text_len
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (batch, 480, 480, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (batch, s)), jnp.int32)
    ids = ids.at[:, 0].set(101)
    mask = jnp.ones_like(ids)

    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    gen = jax.jit(
        lambda v, p, i, m: model.apply(v, p, i, m, method=AlbefPretrain.gen_feats)
    )
    img_f, txt_f, _ = gen(params, px, ids, mask)
    aux = {
        "variables": params,
        "text_ids": ids,
        "text_mask": mask,
        "tgt_txt": txt_f,
        "tgt_img": img_f,
        "txt_token_mask": mask.astype(jnp.float32),
        "special_ids": (103, 0, 101),
    }
    atk = cfg.attack

    from vqattack_tpu.ops.attention import attention_impl

    attn_kind = os.environ.get("BENCH_ATTN", "xla")

    def run(key):
        with attention_impl(attn_kind):
            return pgd_feature(
            albef_losses.make_feature_loss(model), px, px, key, aux,
            eps=atk.eps, eps_iter=atk.step_size, nb_iter=iters,
            clip_min=atk.clip_min, clip_max=atk.clip_max,
            rand_init=True, use_pallas=jax.default_backend() not in ("cpu",),
        )

    def hard_sync(x):
        # on the tunneled-TPU runtime block_until_ready can return before
        # execution finishes; a device->host scalar transfer is the only
        # reliable sync (see vqattack_tpu/utils/profiling.py)
        np.asarray(jax.device_get(x.reshape(-1)[:1]))

    # warmup/compile (retry transient relay aborts; compiles are cached)
    from vqattack_tpu.utils.retry import with_retries

    adv, losses = with_retries(lambda: run(jax.random.key(1)))
    hard_sync(adv)

    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        adv, losses = run(jax.random.key(2 + r))
        hard_sync(adv)
    dt = (time.perf_counter() - t0) / reps

    total_iters = iters * batch  # independent per-sample attack iterations
    iters_per_s = total_iters / dt
    print(
        json.dumps(
            {
                "metric": "albef_pgd_attack_iters_per_sec_per_chip",
                "value": round(iters_per_s, 3),
                "unit": f"iters/s (batch={batch}, fwd+bwd ViT-B@480 + 12L fusion BERT, {jnp.dtype(dtype).name})",
                "vs_baseline": round(iters_per_s / NOMINAL_REFERENCE_ITERS_PER_S, 2),
            }
        )
    )


def _vlmo_bench() -> None:
    """VLMo MoME surrogate PGD throughput (BENCH_MODEL=vlmo)."""
    import time

    from vqattack_tpu.attacks import vlmo as vlmo_losses
    from vqattack_tpu.attacks.pgd import pgd_feature
    from vqattack_tpu.config import vlmo_attack_config
    from vqattack_tpu.models.vlmo import VLMo

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE") == "bfloat16" else jnp.float32

    cfg = vlmo_attack_config()
    model = VLMo(cfg.vlmo, dtype=dtype)
    t = cfg.vlmo.max_text_len
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (batch, 480, 480, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (batch, t)), jnp.int32).at[:, 0].set(101)
    mask = jnp.ones_like(ids)
    params = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(0))
    attack_feats = jax.jit(
        lambda v, p, i, m: model.apply(v, p, i, m, method=VLMo.attack_feats)
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
    atk = cfg.attack

    def hard_sync(x):
        np.asarray(jax.device_get(x.reshape(-1)[:1]))

    def run(key):
        return pgd_feature(
            vlmo_losses.make_feature_loss(model), px, px, key, aux,
            eps=atk.eps, eps_iter=atk.step_size, nb_iter=iters,
            clip_min=atk.clip_min, clip_max=atk.clip_max,
            rand_init=True, use_pallas=jax.default_backend() not in ("cpu",),
        )

    from vqattack_tpu.utils.retry import with_retries

    adv, _ = with_retries(lambda: run(jax.random.key(1)))
    hard_sync(adv)
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        adv, _ = run(jax.random.key(2 + r))
        hard_sync(adv)
    dt = (time.perf_counter() - t0) / reps
    iters_per_s = iters * batch / dt
    print(
        json.dumps(
            {
                "metric": "vlmo_pgd_attack_iters_per_sec_per_chip",
                "value": round(iters_per_s, 3),
                "unit": f"iters/s (batch={batch}, fwd+bwd MoME@480, {jnp.dtype(dtype).name})",
                "vs_baseline": round(iters_per_s / NOMINAL_REFERENCE_ITERS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
