"""Gates for the ``tap_dtype`` byte-reduction lever (config.py).

Storing the clean feature-target stacks in bf16 halves the biggest
constant HBM stream the feature loss reads every iteration (PERF.md round
4).  These tests pin the semantics:

- default ``float32`` changes NOTHING (clean_targets dtype passthrough);
- ``bfloat16`` casts exactly the target stacks (masks stay f32) in both
  orchestrators;
- the PGD trajectory under bf16 targets stays within a drift budget of
  the f32-target trajectory — same style of gate as the bf16-trunk and
  scan-unroll budgets (tests/test_remat.py, tests/test_trajectory_parity.py).

Reference comparator: the reference keeps everything f32
(``adv_attack.py:111-118`` ``Gen_ori_feats``); tap_dtype=float32 is the
parity configuration, bfloat16 the measured-TPU production candidate.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks import albef as albef_losses
from vqattack_tpu.attacks.pgd import pgd_feature
from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    model = AlbefPretrain(cfg.albef)
    s = cfg.attack.max_text_len
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(5, 60, (2, s)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    gen = jax.jit(
        lambda v, p, i, m: model.apply(v, p, i, m,
                                       method=AlbefPretrain.gen_feats)
    )
    img_f, txt_f, _ = gen(params, px, ids, mask)
    aux = {
        "variables": params, "text_ids": ids, "text_mask": mask,
        "tgt_txt": txt_f, "tgt_img": img_f,
        "txt_token_mask": mask.astype(jnp.float32),
        # IN-VOCAB special ids: the tiny config's vocab is 64 tokens, and an
        # out-of-range mask id turns the embedding jnp.take into NaN fill
        "special_ids": (3, 0, 2),
    }
    loss = albef_losses.make_feature_loss(model)
    return cfg, loss, px, aux


def _run(loss, px, aux, cfg, nb=6):
    return pgd_feature(
        loss, px, px, jax.random.key(7), aux,
        eps=cfg.attack.eps, eps_iter=cfg.attack.step_size, nb_iter=nb,
        clip_min=cfg.attack.clip_min, clip_max=cfg.attack.clip_max,
        rand_init=True, unroll=1,
    )


def test_bf16_targets_trajectory_within_budget(setup):
    cfg, loss, px, aux = setup
    adv32, losses32 = _run(loss, px, aux, cfg)
    aux16 = dict(aux,
                 tgt_txt=aux["tgt_txt"].astype(jnp.bfloat16),
                 tgt_img=aux["tgt_img"].astype(jnp.bfloat16))
    adv16, losses16 = _run(loss, px, aux16, cfg)
    a32, a16 = np.asarray(adv32), np.asarray(adv16)
    # the sign-step quantizes each iteration's update to +/-step_size, so
    # target rounding flips only near-zero gradient components: the images
    # agree except where a sign flipped, bounded in count and magnitude
    diff = np.abs(a32 - a16)
    assert diff.max() <= 2 * cfg.attack.step_size * 6 + 1e-6
    frac_changed = (diff > 1e-6).mean()
    assert frac_changed < 0.35, f"{frac_changed:.2%} of pixels diverged"
    # loss trajectories track each other closely in relative terms
    l32, l16 = np.asarray(losses32), np.asarray(losses16)
    rel = np.abs(l32 - l16) / np.maximum(np.abs(l32), 1e-3)
    assert rel.max() < 0.05, f"relative loss drift {rel.max():.4f}"


def test_eps_ball_and_clip_hold_with_bf16_targets(setup):
    cfg, loss, px, aux = setup
    aux16 = dict(aux,
                 tgt_txt=aux["tgt_txt"].astype(jnp.bfloat16),
                 tgt_img=aux["tgt_img"].astype(jnp.bfloat16))
    adv, _ = _run(loss, px, aux16, cfg, nb=8)
    a = np.asarray(adv)
    assert (np.abs(a - np.asarray(px)) <= cfg.attack.eps + 1e-6).all()
    assert (a >= cfg.attack.clip_min - 1e-6).all()
    assert (a <= cfg.attack.clip_max + 1e-6).all()


def test_orchestrator_clean_targets_cast():
    """Both orchestrators cast exactly the target stacks (not the masks)
    when tap_dtype=bfloat16, and pass through untouched at the default."""
    from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
    from vqattack_tpu.models.bert import FusionBert
    from vqattack_tpu.text.similarity import NullGate
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    words = ["what", "color", "is", "the", "dog"]
    tok = WordPieceTokenizer.toy(words)
    base = tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=tok.vocab_size)
    albef_cfg = dataclasses.replace(base.albef, bert=bert)
    surrogate = AlbefPretrain(albef_cfg)
    s = base.attack.max_text_len
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, s), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: surrogate.init(k, px, ids, mask,
                                 method=AlbefPretrain.init_all)
    )(jax.random.key(0))
    mlm_cfg = dataclasses.replace(bert, fusion_layer=bert.num_layers)
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids, mask))(jax.random.key(1))

    for tap_dtype, want in (("float32", jnp.float32),
                            ("bfloat16", jnp.bfloat16)):
        cfg = dataclasses.replace(
            base,
            albef=albef_cfg,
            attack=dataclasses.replace(base.attack, tap_dtype=tap_dtype),
        )
        pipe = AlbefAttackPipeline(
            cfg, surrogate, sparams, tok, NullGate(),
            mlm_model=mlm, mlm_params=mparams, use_pallas=False,
        )
        img_f, txt_f = pipe.clean_targets(px, ids, mask, jax.random.key(2))
        assert img_f.dtype == want and txt_f.dtype == want
