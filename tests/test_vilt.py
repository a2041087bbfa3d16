"""ViLT (single-stream, moe=False) family: forward, vqa head, conversion,
k-bias softmax invariance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.checkpoint.convert import convert_vilt
from vqattack_tpu.config import tiny_test_config, vilt_base_config
from vqattack_tpu.models.vlmo import VLMo


def tiny_vilt_cfg():
    base = tiny_test_config().vlmo
    return dataclasses.replace(
        base, moe=False, use_abs_pos_emb=True,
        need_relative_position_embed=False, layer_scale_init=None,
    )


def test_vilt_base_preset():
    cfg = vilt_base_config()
    assert not cfg.moe and cfg.patch_size == 32
    assert cfg.image_seq_len == (384 // 32) ** 2 + 1


def test_vilt_forward_and_vqa():
    cfg = tiny_vilt_cfg()
    model = VLMo(cfg)
    b, t = 2, cfg.max_text_len
    px = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((b, t), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(0))
    out = model.apply(params, ids, mask, px)
    assert out["cls_feats"].shape == (b, cfg.hidden_size)
    logits = model.apply(params, px, ids, mask, method=VLMo.vqa_logits)
    assert logits.shape == (b, cfg.vqa_label_size)
    # single-stream: blocks carry one 'mlp', no experts
    blk = params["params"]["blocks_0"]
    assert "mlp" in blk and "mlp_text" not in blk


def _fake_vilt_sd(cfg):
    rng = np.random.default_rng(0)
    d, depth = cfg.hidden_size, cfg.depth
    sd = {}
    sd["transformer.cls_token"] = np.zeros((1, 1, d), np.float32)
    sd["transformer.pos_embed"] = rng.normal(size=(1, cfg.image_seq_len, d)).astype(np.float32) * 0.02
    sd["transformer.patch_embed.proj.weight"] = rng.normal(
        size=(d, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32) * 0.02
    sd["transformer.patch_embed.proj.bias"] = np.zeros(d, np.float32)
    sd["transformer.norm.weight"] = np.ones(d, np.float32)
    sd["transformer.norm.bias"] = np.zeros(d, np.float32)
    for i in range(depth):
        bp = f"transformer.blocks.{i}"
        sd[f"{bp}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32) * 0.02
        sd[f"{bp}.attn.qkv.bias"] = rng.normal(size=(3 * d,)).astype(np.float32) * 0.02
        sd[f"{bp}.attn.proj.weight"] = rng.normal(size=(d, d)).astype(np.float32) * 0.02
        sd[f"{bp}.attn.proj.bias"] = np.zeros(d, np.float32)
        for n in ("norm1", "norm2"):
            sd[f"{bp}.{n}.weight"] = np.ones(d, np.float32)
            sd[f"{bp}.{n}.bias"] = np.zeros(d, np.float32)
        sd[f"{bp}.mlp.fc1.weight"] = rng.normal(size=(4 * d, d)).astype(np.float32) * 0.02
        sd[f"{bp}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        sd[f"{bp}.mlp.fc2.weight"] = rng.normal(size=(d, 4 * d)).astype(np.float32) * 0.02
        sd[f"{bp}.mlp.fc2.bias"] = np.zeros(d, np.float32)
    sd["text_embeddings.word_embeddings.weight"] = rng.normal(
        size=(cfg.vocab_size, d)).astype(np.float32) * 0.02
    sd["text_embeddings.position_embeddings.weight"] = rng.normal(
        size=(cfg.max_position_embeddings, d)).astype(np.float32) * 0.02
    sd["text_embeddings.token_type_embeddings.weight"] = np.zeros((2, d), np.float32)
    sd["text_embeddings.LayerNorm.weight"] = np.ones(d, np.float32)
    sd["text_embeddings.LayerNorm.bias"] = np.zeros(d, np.float32)
    sd["token_type_embeddings.weight"] = np.zeros((2, d), np.float32)
    sd["pooler.dense.weight"] = rng.normal(size=(d, d)).astype(np.float32) * 0.02
    sd["pooler.dense.bias"] = np.zeros(d, np.float32)
    sd["vqa_classifier.0.weight"] = rng.normal(size=(2 * d, d)).astype(np.float32) * 0.02
    sd["vqa_classifier.0.bias"] = np.zeros(2 * d, np.float32)
    sd["vqa_classifier.1.weight"] = np.ones(2 * d, np.float32)
    sd["vqa_classifier.1.bias"] = np.zeros(2 * d, np.float32)
    sd["vqa_classifier.3.weight"] = rng.normal(size=(cfg.vqa_label_size, 2 * d)).astype(np.float32) * 0.02
    sd["vqa_classifier.3.bias"] = np.zeros(cfg.vqa_label_size, np.float32)
    return sd


def test_convert_vilt_loads_and_runs():
    cfg = tiny_vilt_cfg()
    sd = _fake_vilt_sd(cfg)
    tree = convert_vilt(sd, depth=cfg.depth)
    model = VLMo(cfg, with_vqa_head=True)
    px = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    logits = model.apply({"params": tree}, px, ids, mask, method=VLMo.vqa_logits)
    assert logits.shape == (1, cfg.vqa_label_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_k_bias_is_softmax_invariant():
    """The conversion drops the key bias: verify attention outputs match a
    torch computation that keeps it."""
    torch = pytest.importorskip("torch")
    d, h, n = 8, 2, 5
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, n, d)).astype(np.float32)
    wq, wk, wv = (rng.normal(size=(d, d)).astype(np.float32) * 0.3 for _ in range(3))
    bq, bk, bv = (rng.normal(size=(d,)).astype(np.float32) * 0.3 for _ in range(3))

    def attn_np(with_k_bias):
        q = x @ wq.T + bq
        k = x @ wk.T + (bk if with_k_bias else 0)
        v = x @ wv.T + bv
        def split(t):
            return t.reshape(1, n, h, d // h).transpose(0, 2, 1, 3)
        qs, ks, vs = split(q), split(k), split(v)
        logits = qs @ ks.transpose(0, 1, 3, 2) / np.sqrt(d / h)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        return (w @ vs).transpose(0, 2, 1, 3).reshape(1, n, d)

    np.testing.assert_allclose(attn_np(True), attn_np(False), atol=1e-5)
