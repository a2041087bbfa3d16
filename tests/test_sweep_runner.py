"""Mesh-wide sweep runner (parallel/sweep.py) on the virtual CPU mesh.

VERDICT round-1 item 5: one batched engine — paraphrase (text-attack)
samples must run lockstep-bucketed on the mesh, never one-at-a-time.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.parallel.mesh import make_mesh
from vqattack_tpu.parallel.sweep import make_sweep_runner
from vqattack_tpu.text.similarity import NullGate
from vqattack_tpu.text.tokenizer import WordPieceTokenizer

WORDS = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]


def _make_pipeline():
    tok = WordPieceTokenizer.toy(WORDS)
    base = tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=tok.vocab_size)
    albef_cfg = dataclasses.replace(base.albef, bert=bert)
    cfg = dataclasses.replace(base, albef=albef_cfg)

    surrogate = AlbefPretrain(albef_cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: surrogate.init(k, px, ids, mask, method=AlbefPretrain.init_all)
    )(jax.random.key(0))
    mlm_cfg = dataclasses.replace(bert, fusion_layer=bert.num_layers)
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids, mask))(jax.random.key(1))

    return AlbefAttackPipeline(
        cfg, surrogate, sparams, tok, NullGate(),
        mlm_model=mlm, mlm_params=mparams, use_pallas=False,
    ), cfg


def test_sweep_runner_mesh():
    pipe, cfg = _make_pipeline()
    mesh = make_mesh(8)
    runner = make_sweep_runner(pipe, mesh, batch_size=8)

    rng = np.random.default_rng(0)
    samples = [
        {"qid": str(i),
         "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
         "question": "what color is the dog"}
        for i in range(8)
    ]
    out = runner(samples)
    assert len(out) == 8
    for i in range(8):
        r = out[str(i)]
        assert r["adv_image"].shape == (1, 32, 32, 3)
        eps = cfg.attack.eps
        assert (np.abs(r["adv_image"] - samples[i]["pixels"]) <= eps + 1e-5).all()
        assert np.isfinite(r["losses"]).all()


def test_sweep_runner_paraphrase_samples_batched(monkeypatch):
    """Paraphrase samples ride the lockstep bucket engine (no per-sample
    fallback): pipeline.attack_sample must never be called, buckets must see
    full batches, and MAR (mlm) loss trajectories must come back."""
    pipe, cfg = _make_pipeline()
    mesh = make_mesh(8)

    def _boom(*a, **kw):  # pragma: no cover - the assertion IS the test
        raise AssertionError("per-sample fallback used — sweep must batch")

    monkeypatch.setattr(AlbefAttackPipeline, "attack_sample", _boom)

    from vqattack_tpu.attacks import batched as batched_mod

    bucket_sizes = []
    orig = batched_mod.BatchedAlbefAttack.attack_bucket

    def spy(self, pixels, states, rng):
        bucket_sizes.append(len(states))
        return orig(self, pixels, states, rng)

    monkeypatch.setattr(batched_mod.BatchedAlbefAttack, "attack_bucket", spy)

    runner = make_sweep_runner(pipe, mesh, batch_size=4)
    rng = np.random.default_rng(1)
    samples = [
        {"qid": str(i),
         "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
         "question": "what color is the dog",
         "paraphrase": "the dog is red",
         "target_answer": "red"}
        for i in range(4)
    ]
    out = runner(samples)
    assert len(out) == 4
    # all four paraphrase samples went through ONE lockstep bucket call
    assert bucket_sizes == [4]
    for i in range(4):
        r = out[str(i)]
        assert (np.abs(r["adv_image"] - samples[i]["pixels"])
                <= cfg.attack.eps + 1e-5).all()
        assert np.isfinite(r["losses"]).all()
        # MAR labels exist -> alternating path -> mlm trajectory present
        assert r["mlm_losses"] is not None and np.isfinite(r["mlm_losses"]).all()


def test_sweep_runner_dispatches_vlmo():
    """The unified runner routes a VLMo pipeline onto BatchedVlmoAttack."""
    import dataclasses as dc

    from vqattack_tpu.attacks.vlmo_orchestrator import VlmoAttackPipeline
    from vqattack_tpu.models.vlmo import VLMo

    from vqattack_tpu.models.bert import FusionBert

    tok = WordPieceTokenizer.toy(WORDS)
    base = tiny_test_config()
    vlmo_cfg = dc.replace(base.vlmo, vocab_size=tok.vocab_size)
    cfg = dc.replace(base, vlmo=vlmo_cfg)
    model = VLMo(vlmo_cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, vlmo_cfg.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(0))
    mlm_cfg = dc.replace(
        base.albef.bert, vocab_size=tok.vocab_size,
        fusion_layer=base.albef.bert.num_layers,
    )
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids[:, :8], mask[:, :8]))(
        jax.random.key(2)
    )
    pipe = VlmoAttackPipeline(
        cfg, model, sparams, sparams, tok, NullGate(),
        mlm_model=mlm, mlm_params=mparams,
        id2answer={0: "red"}, use_pallas=False,
    )
    mesh = make_mesh(8)
    runner = make_sweep_runner(pipe, mesh, batch_size=8)

    rng = np.random.default_rng(2)
    samples = [
        {"qid": str(100 + i),
         "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
         "question": "what color is the dog"}
        for i in range(8)
    ]
    out = runner(samples)
    assert len(out) == 8
    for i in range(8):
        r = out[str(100 + i)]
        assert (np.abs(r["adv_image"] - samples[i]["pixels"])
                <= cfg.attack.eps + 1e-5).all()
        assert np.isfinite(r["losses"]).all()


def test_sweep_runner_feature_only_pipeline_no_mlm():
    """Regression: a pipeline built WITHOUT a candidate MLM (feature-only
    image attack) must sweep — _prepare previously crashed dereferencing
    the missing candidate-MLM entry point."""
    tok = WordPieceTokenizer.toy(WORDS)
    base = tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=tok.vocab_size)
    albef_cfg = dataclasses.replace(base.albef, bert=bert)
    cfg = dataclasses.replace(base, albef=albef_cfg)

    surrogate = AlbefPretrain(albef_cfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: surrogate.init(k, px, ids, mask, method=AlbefPretrain.init_all)
    )(jax.random.key(0))
    pipe = AlbefAttackPipeline(
        cfg, surrogate, sparams, tok, NullGate(),
        mlm_model=None, mlm_params=None, use_pallas=False,
    )
    mesh = make_mesh(8)
    runner = make_sweep_runner(pipe, mesh, batch_size=4)
    rng = np.random.default_rng(3)
    samples = [
        {"qid": str(i),
         "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
         "question": "what color is the cat"}
        for i in range(4)
    ]
    out = runner(samples)
    assert len(out) == 4
    for i in range(4):
        r = out[str(i)]
        assert (np.abs(r["adv_image"] - samples[i]["pixels"])
                <= cfg.attack.eps + 1e-5).all()
        assert np.isfinite(r["losses"]).all()
        # no substitutions possible without a candidate MLM
        assert r.get("substitutions") in (None, [], ())
