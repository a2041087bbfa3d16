"""Fused per-block programs: bit-parity with the composed dispatch chain.

``pgd_feature_block`` / ``pgd_alternating_block`` (VERDICT r4 Next #3) fold
[clean targets] + dynamic PGD + [VL joint step] into ONE program.  Their
contract: under the same keys, trajectories / harvested text gradients /
computed targets are bit-identical to the unfused composition
(``targets_fn``; ``pgd_*_dynamic``; ``embed_fn`` + ``pgd_vl_step``).
Kernel-level parity is pinned here on toy models; orchestrator-level
parity (fused vs unfused ``attack_sample`` and the batched engine) in
``test_fused_orchestrator_parity``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks.pgd import (
    pgd_alternating_block,
    pgd_alternating_dynamic,
    pgd_feature_block,
    pgd_feature_dynamic,
    pgd_vl_step,
)

B, C, H, W = 2, 3, 8, 8
S, D = 6, 4


def _embed_fn(variables, ids):
    # toy embedding table lookup [B, S] -> [B, S, D]
    return variables["table"][ids]


def _targets_fn(ori_x, key, aux):
    del key
    t = ori_x * 2.0 + 1.0
    return {"t": t, "u": t * 0.5}


def _feat_loss(adv, key, aux):
    ps = jnp.sum((adv - aux["t"]) ** 2, axis=(1, 2, 3))
    return jnp.sum(ps), ps


def _mlm_loss(adv, key, aux):
    ps = jnp.sum(jnp.abs(adv - aux["u"]), axis=(1, 2, 3)) * 0.05
    return jnp.sum(ps), ps


def _vl_loss(adv, embeds, key, aux):
    # joint loss touching both the image and the text embeddings
    ps = (
        jnp.sum((adv - aux["t"]) ** 2, axis=(1, 2, 3))
        + jnp.sum(embeds * aux["w"], axis=(1, 2))
    )
    return jnp.sum(ps), ps


@pytest.fixture(scope="module")
def toy():
    kx, kt, kw, ki = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, (B, C, H, W))
    variables = {"table": jax.random.normal(kt, (11, D))}
    aux = {
        "variables": variables,
        "text_ids": jax.random.randint(ki, (B, S), 0, 11),
        "w": jax.random.normal(kw, (B, S, D)),
    }
    positions = jnp.asarray([[1, 3, 0, 0], [2, 0, 0, 0]], jnp.int32)
    return x, aux, positions


def _compose_feature(x, aux, positions, rng, vl_rng, tgt_rng, nb, rand_init,
                     do_vl):
    """The unfused dispatch chain under the same keys."""
    aux = {**aux, **_targets_fn(x, tgt_rng, aux)}
    adv, losses = pgd_feature_dynamic(
        _feat_loss, x, x, rng, jnp.int32(nb), jnp.asarray(rand_init), aux,
        max_iter=10,
    )
    if do_vl:
        embeds = _embed_fn(aux["variables"], aux["text_ids"])
        adv, tg = pgd_vl_step(_vl_loss, adv, embeds, x, positions, vl_rng, aux)
        tg = np.asarray(tg, np.float32)
    else:
        tg = np.zeros((B, positions.shape[1], D), np.float32)
    return np.asarray(adv), np.asarray(losses), tg, aux


@pytest.mark.parametrize("nb", [1, 5])
@pytest.mark.parametrize("do_vl", [True, False])
def test_feature_block_matches_composition(toy, nb, do_vl):
    x, aux, positions = toy
    rng, vl_rng, tgt_rng = jax.random.split(jax.random.PRNGKey(3), 3)
    a_c, l_c, tg_c, aux_t = _compose_feature(
        x, aux, positions, rng, vl_rng, tgt_rng, nb, True, do_vl
    )
    a_f, l_f, tg_f, tgts = pgd_feature_block(
        _feat_loss, _vl_loss, _embed_fn, _targets_fn,
        x, x, rng, vl_rng, tgt_rng,
        jnp.int32(nb), jnp.asarray(True), jnp.asarray(do_vl), positions, aux,
        target_keys=("t", "u"), max_iter=10,
    )
    assert np.array_equal(a_c, np.asarray(a_f))
    np.testing.assert_allclose(l_c, np.asarray(l_f), rtol=1e-6)
    np.testing.assert_allclose(tg_c, np.asarray(tg_f), rtol=1e-6)
    # the computed targets come back for the later blocks
    assert np.array_equal(np.asarray(tgts[0]), np.asarray(aux_t["t"]))
    assert np.array_equal(np.asarray(tgts[1]), np.asarray(aux_t["u"]))


def test_feature_block_later_block_takes_targets_from_aux(toy):
    """targets_fn=None: the target entries arrive in aux (a later block),
    and come back unchanged."""
    x, aux, positions = toy
    rng, vl_rng, tgt_rng = jax.random.split(jax.random.PRNGKey(5), 3)
    aux2 = {**aux, **_targets_fn(x, tgt_rng, aux)}
    a_c, l_c, tg_c, _ = _compose_feature(
        x, aux, positions, rng, vl_rng, tgt_rng, 3, False, True
    )
    a_f, l_f, tg_f, tgts = pgd_feature_block(
        _feat_loss, _vl_loss, _embed_fn, None,
        x, x, rng, vl_rng, tgt_rng,
        jnp.int32(3), jnp.asarray(False), jnp.asarray(True), positions, aux2,
        target_keys=("t", "u"), max_iter=10,
    )
    assert np.array_equal(a_c, np.asarray(a_f))
    np.testing.assert_allclose(tg_c, np.asarray(tg_f), rtol=1e-6)
    assert np.array_equal(np.asarray(tgts[0]), np.asarray(aux2["t"]))


@pytest.mark.parametrize("do_vl", [True, False])
def test_alternating_block_matches_composition(toy, do_vl):
    x, aux, positions = toy
    rng, vl_rng, tgt_rng = jax.random.split(jax.random.PRNGKey(7), 3)
    auxt = {**aux, **_targets_fn(x, tgt_rng, aux)}
    a_c, fl_c, ml_c = pgd_alternating_dynamic(
        _feat_loss, _mlm_loss, x, x, rng, jnp.int32(4), jnp.asarray(True),
        auxt, max_iter=10,
    )
    if do_vl:
        embeds = _embed_fn(auxt["variables"], auxt["text_ids"])
        a_c, tg_c = pgd_vl_step(_vl_loss, a_c, embeds, x, positions, vl_rng,
                                auxt)
        tg_c = np.asarray(tg_c, np.float32)
    else:
        tg_c = np.zeros((B, positions.shape[1], D), np.float32)

    a_f, fl_f, ml_f, tg_f, _ = pgd_alternating_block(
        _feat_loss, _mlm_loss, _vl_loss, _embed_fn, _targets_fn,
        x, x, rng, vl_rng, tgt_rng,
        jnp.int32(4), jnp.asarray(True), jnp.asarray(do_vl), positions, aux,
        target_keys=("t", "u"), max_iter=10,
    )
    assert np.array_equal(np.asarray(a_c), np.asarray(a_f))
    np.testing.assert_allclose(np.asarray(fl_c), np.asarray(fl_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ml_c), np.asarray(ml_f), rtol=1e-6)
    np.testing.assert_allclose(tg_c, np.asarray(tg_f), rtol=1e-6)


# --------------------------------------------------- orchestrator-level


def _tiny_albef_pipeline(fused: bool):
    from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
    from vqattack_tpu.config import tiny_test_config
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.models.bert import FusionBert
    from vqattack_tpu.text.similarity import NullGate
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.toy(
        ["what", "color", "is", "the", "dog", "cat", "red", "blue", "hat"]
    )
    cfg = tiny_test_config()
    bert = dataclasses.replace(cfg.albef.bert, vocab_size=tok.vocab_size)
    cfg = dataclasses.replace(
        cfg,
        albef=dataclasses.replace(cfg.albef, bert=bert),
        attack=dataclasses.replace(
            cfg.attack, dynamic_pgd=True, fused_block=fused, num_iters=8,
        ),
    )
    model = AlbefPretrain(cfg.albef)
    size = cfg.albef.vit.image_size
    px = jnp.zeros((1, size, size, 3))
    ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, jnp.ones_like(ids))
    mlm_cfg = dataclasses.replace(bert, fusion_layer=bert.num_layers)
    mlm_model = FusionBert(mlm_cfg, with_mlm_head=True)
    mlm_params = jax.jit(
        lambda k: mlm_model.init(k, ids, jnp.ones_like(ids))
    )(jax.random.key(1))
    return AlbefAttackPipeline(
        cfg, model, params, tok, NullGate(),
        mlm_model=mlm_model, mlm_params=mlm_params,
    )


def _batched_engine(fused: bool, mesh=None):
    from vqattack_tpu.attacks.batched import BatchedAlbefAttack

    p = _tiny_albef_pipeline(fused)
    return BatchedAlbefAttack(p, mesh=mesh)


def _fused_samples(n):
    questions = ["what color is the dog", "what color is the cat",
                 "what color is the hat", "what is the red dog"]
    rng = np.random.default_rng(1)
    out = []
    for i in range(n):
        q = questions[i % len(questions)]
        out.append({
            "qid": str(5000 + i),
            "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
            "question": q,
            "paraphrase": f"the {q.split()[-1]} is red",
            "target_answer": "red",
            "all_correct_answers": ["red"],
        })
    return out


def test_fused_batched_parity():
    """The lockstep engine with fused_block on vs off: identical results
    (both MAR and feature buckets, padded chunks included)."""
    samples = _fused_samples(3)
    outs = []
    for fused in (False, True):
        eng = _batched_engine(fused)
        outs.append(eng.run(samples, batch_size=2, rng=jax.random.key(4)))
    for a, b in zip(*outs):
        assert a.qid == b.qid
        assert a.adv_text == b.adv_text
        assert a.substitutions == b.substitutions
        np.testing.assert_allclose(a.adv_image, b.adv_image, atol=1e-6)
        np.testing.assert_allclose(a.feat_losses, b.feat_losses, rtol=1e-5)


def test_fused_batched_on_mesh():
    """The fused block programs under GSPMD on the 8-device CPU mesh."""
    from vqattack_tpu.parallel.mesh import make_mesh

    eng = _batched_engine(True, mesh=make_mesh(8))
    samples = _fused_samples(8)
    results = eng.run(samples, batch_size=8, rng=jax.random.key(4))
    assert len(results) == 8
    eps = eng.p.cfg.attack.eps
    by_qid = {s["qid"]: s for s in samples}
    for r in results:
        s = by_qid[r.qid]
        assert (np.abs(r.adv_image - s["pixels"]) <= eps + 1e-5).all()
        assert np.abs(r.adv_image - s["pixels"]).max() > 1e-4
        assert np.isfinite(r.feat_losses).all()


def test_fused_orchestrator_parity():
    """attack_sample with fused_block on vs off: identical adversarial
    image, text, substitutions and losses (the whole per-sample walk)."""
    import numpy as np

    outs = []
    for fused in (False, True):
        p = _tiny_albef_pipeline(fused)
        size = p.cfg.albef.vit.image_size
        # fresh generator per run: BOTH runs must see the same pixels
        px = np.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, size, size, 3)),
            np.float32,
        )
        res = p.attack_sample(
            px, "what color is the dog", "77",
            "the dog is red", "red", ["red"],
            rng=jax.random.key(9),
        )
        outs.append(res)
        del p
    a, b = outs
    assert a.adv_text == b.adv_text
    assert a.substitutions == b.substitutions
    assert a.num_blocks == b.num_blocks
    np.testing.assert_allclose(a.adv_image, b.adv_image, atol=1e-6)
    np.testing.assert_allclose(a.feat_losses, b.feat_losses, rtol=1e-5)
