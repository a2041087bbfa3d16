"""Mesh-wide sweep runner (parallel/sweep.py) on the virtual CPU mesh."""

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

WORDS = ["what", "color", "is", "the", "dog", "cat", "red"]


def test_sweep_runner_mesh():
    tok = WordPieceTokenizer.toy(WORDS)
    base = tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=tok.vocab_size)
    albef_cfg = dataclasses.replace(base.albef, bert=bert)
    cfg = dataclasses.replace(base, albef=albef_cfg)

    surrogate = AlbefPretrain(albef_cfg)
    px = jnp.zeros((1, cfg.data.image_size if False else 32, 32, 3))
    ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: surrogate.init(k, px, ids, mask, method=AlbefPretrain.init_all)
    )(jax.random.key(0))
    mlm_cfg = dataclasses.replace(bert, fusion_layer=bert.num_layers)
    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids, mask))(jax.random.key(1))

    pipe = AlbefAttackPipeline(
        cfg, surrogate, sparams, tok, NullGate(),
        mlm_model=mlm, mlm_params=mparams, use_pallas=False,
    )
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
