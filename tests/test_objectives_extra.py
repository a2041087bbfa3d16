"""Momentum-distillation pretrain loss, VQA fine-tuning loss, textpt
conversion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA, mlm_random_mask
from vqattack_tpu.train.objectives import (
    albef_pretrain_loss,
    albef_vqa_train_loss,
    momentum_update,
)

CFG = tiny_test_config()


def _pretrain_setup():
    model = AlbefPretrain(CFG.albef)
    rng = np.random.default_rng(0)
    b, s = 3, 8
    px = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(5, CFG.albef.bert.vocab_size, (b, s)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(
        lambda k: model.init(k, px, ids, mask, method=AlbefPretrain.init_all)
    )(jax.random.key(0))
    mlm_ids, mlm_labels = mlm_random_mask(
        jax.random.key(1), ids, CFG.albef.bert.vocab_size, 4, mlm_probability=0.4
    )
    batch = {"pixels": px, "text_ids": ids, "text_mask": mask,
             "mlm_ids": mlm_ids, "mlm_labels": mlm_labels}
    return model, params, batch


def test_pretrain_loss_with_distillation():
    model, params, batch = _pretrain_setup()
    teacher = momentum_update(params, jax.tree_util.tree_map(jnp.copy, params), 0.9)
    hard, m1 = albef_pretrain_loss(model, params, batch, jax.random.key(2))
    soft, m2 = albef_pretrain_loss(
        model, params, batch, jax.random.key(2),
        teacher_params=teacher, alpha=0.4,
    )
    assert np.isfinite(float(hard)) and np.isfinite(float(soft))
    # identical teacher == student at alpha>0 still changes the target mix
    assert float(hard) != float(soft)
    # gradient flows in both modes
    g = jax.grad(
        lambda p: albef_pretrain_loss(
            model, p, batch, jax.random.key(2), teacher_params=teacher, alpha=0.4
        )[0]
    )(params)
    assert np.isfinite(float(jax.flatten_util.ravel_pytree(g)[0].sum()))


def test_vqa_train_loss():
    victim = AlbefVQA(CFG.albef)
    rng = np.random.default_rng(0)
    b, s, a, l = 2, 8, 3, 4
    px = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((b, s), jnp.int32)
    mask = jnp.ones_like(ids)
    ans_ids = jnp.asarray(
        rng.integers(5, CFG.albef.bert.vocab_size, (b, a, l)), jnp.int32
    ).at[:, :, 0].set(2)
    ans_mask = jnp.ones((b, a, l), jnp.int32)
    weights = jnp.asarray([[0.6, 0.4, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    params = jax.jit(
        lambda k: victim.init(
            k, px, ids, mask, ans_ids[0], ans_mask[0], 2
        )
    )(jax.random.key(0))
    batch = {"pixels": px, "text_ids": ids, "text_mask": mask,
             "answer_ids": ans_ids, "answer_mask": ans_mask,
             "answer_weights": weights}
    loss, _ = albef_vqa_train_loss(victim, params, batch)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # zero-weight slots contribute nothing: doubling their ids is a no-op
    batch2 = dict(batch)
    batch2["answer_ids"] = ans_ids.at[:, 2, :].set(7)
    loss2, _ = albef_vqa_train_loss(victim, params, batch2)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)


def test_textpt_conversion():
    from vqattack_tpu.checkpoint.convert import convert_textpt_state_dict

    d, heads, layers = 8, 2, 3
    sd = {}
    for i in range(layers):
        sd[f"blocks.{i}.attn.relative_position_bias_table"] = np.full(
            (10, heads), i, np.float32
        )
        sd[f"blocks.{i}.mlp.fc1.weight"] = np.zeros((d, d), np.float32)
        sd[f"blocks.{i}.norm2.weight"] = np.ones(d, np.float32)
    sd["cls_token"] = np.zeros((1, 1, d), np.float32)
    out = convert_textpt_state_dict(sd, all_num_relative_distance=20,
                                    num_heads_times_layers=heads * layers)
    assert "transformer.blocks.0.mlp_imag.fc1.weight" in out
    assert "transformer.blocks.0.norm2_imag.weight" in out
    assert "transformer.cls_token" in out
    tbl = out["relative_position_bias_table"]
    assert tbl.shape == (20, heads * layers)
    # merged column blocks carry each layer's values; padding rows zero
    assert (tbl[:10, 0:2] == 0).all() and (tbl[:10, 2:4] == 1).all()
    assert (tbl[10:] == 0).all()


def test_retrieval_train_loss():
    from vqattack_tpu.models.albef_tasks import AlbefRetrieval
    from vqattack_tpu.train.objectives import retrieval_train_loss

    model = AlbefRetrieval(CFG.albef)
    rng = np.random.default_rng(0)
    b, s = 4, 8
    px = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(5, CFG.albef.bert.vocab_size, (b, s)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    batch = {"pixels": px, "text_ids": ids, "text_mask": mask,
             "idx": jnp.asarray([0, 0, 1, 2])}
    loss, metrics = retrieval_train_loss(model, params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert set(metrics) >= {"loss", "loss_ita", "loss_itm"}
