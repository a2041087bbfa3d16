"""Training path: optimizer factory, schedules, objectives, end-to-end tiny
training steps (loss decreases), multi-device step on the CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain, mlm_random_mask
from vqattack_tpu.models.vlmo import VLMo
from vqattack_tpu.train.objectives import (
    albef_pretrain_loss,
    contrastive_loss,
    itm_loss,
    masked_lm_loss,
    nlvr2_loss,
    sample_hard_negatives,
    update_feature_queue,
    momentum_update,
    vqa_bce_loss,
)
from vqattack_tpu.train.optim import create_optimizer, create_schedule, decay_mask
from vqattack_tpu.train.trainer import create_train_state, make_train_step

CFG = tiny_test_config()


def test_schedules():
    s = create_schedule("cosine", 1e-3, total_steps=100, warmup_steps=10, warmup_lr=0.0)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(99)) < 1e-3
    lin = create_schedule("linear", 1e-3, total_steps=100)
    assert float(lin(0)) == pytest.approx(1e-3)
    step = create_schedule("step", 1e-3, total_steps=100, decay_steps=10, decay_rate=0.5)
    assert float(step(10)) == pytest.approx(5e-4)


def test_decay_mask_excludes_norm_bias():
    params = {
        "dense": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros(2)},
        "LayerNorm": {"scale": jnp.zeros(2), "bias": jnp.zeros(2)},
        "word_embeddings": {"embedding": jnp.zeros((4, 2))},
    }
    m = decay_mask(params)
    assert m["dense"]["kernel"] is True
    assert m["dense"]["bias"] is False
    assert m["LayerNorm"]["scale"] is False
    assert m["word_embeddings"]["embedding"] is False


def test_objective_primitives():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 5, 11)), jnp.float32)
    labels = jnp.array([[1, -100, 3, -100, -100], [2, 2, -100, -100, -100]])
    assert float(masked_lm_loss(logits, labels)) > 0

    img = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    txt = img + 0.01 * jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    aligned = contrastive_loss(img, txt, jnp.asarray(0.07))
    shuffled = contrastive_loss(img, txt[::-1], jnp.asarray(0.07))
    assert float(aligned) < float(shuffled)

    sim = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    ni, nt = sample_hard_negatives(jax.random.key(0), sim, sim.T)
    assert (np.asarray(ni) != np.arange(4)).all()
    assert (np.asarray(nt) != np.arange(4)).all()

    assert float(itm_loss(jnp.array([[0.0, 5.0]]), jnp.array([[5.0, 0.0]]))) < 0.1

    v = vqa_bce_loss(jnp.zeros((2, 16)), jnp.zeros((2, 16)))
    assert np.isfinite(float(v))
    assert float(nlvr2_loss(jnp.array([[10.0, 0.0]]), jnp.array([0]))) < 1e-3

    q = jnp.zeros((8, 16))
    q2, ptr = update_feature_queue(q, jnp.asarray(0), jnp.ones((4, 8)))
    assert int(ptr) == 4 and float(q2[:, 0].sum()) == 8.0

    p = {"w": jnp.ones(3)}
    mp = {"w": jnp.zeros(3)}
    out = momentum_update(p, mp, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1)


@pytest.mark.parametrize("family", ["albef", "vlmo_vqa"])
def test_training_loss_decreases(family):
    rng = np.random.default_rng(0)
    b, s = 4, 8
    px = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)

    if family == "albef":
        model = AlbefPretrain(CFG.albef)
        ids = jnp.asarray(rng.integers(5, CFG.albef.bert.vocab_size, (b, s)), jnp.int32)
        mask = jnp.ones_like(ids)
        params = jax.jit(
            lambda k: model.init(k, px, ids, mask, method=AlbefPretrain.init_all)
        )(jax.random.key(0))
        mlm_ids, mlm_labels = mlm_random_mask(
            jax.random.key(1), ids, CFG.albef.bert.vocab_size, 4, mlm_probability=0.3
        )
        batch = {"pixels": px, "text_ids": ids, "text_mask": mask,
                 "mlm_ids": mlm_ids, "mlm_labels": mlm_labels}

        def loss_fn(p, batch, key):
            return albef_pretrain_loss(model, p, batch, key)
    else:
        vcfg = CFG.vlmo
        model = VLMo(vcfg)
        ids = jnp.asarray(rng.integers(5, vcfg.vocab_size, (b, vcfg.max_text_len)), jnp.int32)
        mask = jnp.ones_like(ids)
        params = jax.jit(
            lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
        )(jax.random.key(0))
        targets = jnp.zeros((b, vcfg.vqa_label_size)).at[:, 3].set(1.0)
        batch = {"pixels": px, "text_ids": ids, "text_mask": mask, "targets": targets}

        def loss_fn(p, batch, key):
            logits = model.apply(
                p, batch["pixels"], batch["text_ids"], batch["text_mask"],
                method=VLMo.vqa_logits,
            )
            loss = vqa_bce_loss(logits, batch["targets"])
            return loss, {"loss": loss}

    tx = create_optimizer(params, "adamw", 1e-3, weight_decay=0.01)
    state = create_train_state(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)

    losses = []
    key = jax.random.key(2)
    for i in range(5):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_sharded_train_step():
    """The same train step, batch sharded over the 8-device data mesh."""
    from vqattack_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    vcfg = CFG.vlmo
    model = VLMo(vcfg)
    b = 8
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1, 1, (b, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((b, vcfg.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(lambda k: model.init(k, ids, mask, px, method=VLMo.init_all))(
        jax.random.key(0)
    )
    targets = jnp.zeros((b, vcfg.vqa_label_size)).at[:, 1].set(1.0)

    def loss_fn(p, batch, key):
        logits = model.apply(
            p, batch["pixels"], batch["text_ids"], batch["text_mask"],
            method=VLMo.vqa_logits,
        )
        loss = vqa_bce_loss(logits, batch["targets"])
        return loss, {"loss": loss}

    tx = create_optimizer(params, "adamw", 1e-3)
    mesh = make_mesh(8)
    state = create_train_state(shard_params(params, mesh), tx)
    batch = shard_batch(
        {"pixels": px, "text_ids": ids, "text_mask": mask, "targets": targets}, mesh
    )
    step = make_train_step(loss_fn, tx, donate=False)
    state2, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_train_state_checkpointing(tmp_path):
    from vqattack_tpu.checkpoint.io import (
        restore_latest_train_state,
        save_train_state,
    )
    from vqattack_tpu.train.trainer import TrainState

    state = TrainState(
        jnp.asarray(7, jnp.int32),
        {"w": jnp.arange(4, dtype=jnp.float32)},
        {"m": jnp.zeros(4)},
    )
    save_train_state(state, str(tmp_path), 7)
    save_train_state(state, str(tmp_path), 9)
    restored = restore_latest_train_state(str(tmp_path), state)
    assert int(restored.step) == 7  # same content; newest dir restored
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4))
    # keep pruning
    for s in (11, 13, 15):
        save_train_state(state, str(tmp_path), s, keep=2)
    from vqattack_tpu.checkpoint.io import find_train_steps

    assert sorted(find_train_steps(str(tmp_path))) == [13, 15]


def test_feature_queue_rejects_non_divisible_batch():
    """dynamic_update_slice clamps instead of wrapping; the enqueue must
    refuse geometries where the ring pointer would desync (the reference
    asserts queue_size % batch_size == 0, model_pretrain.py:295)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from vqattack_tpu.train.objectives import update_feature_queue

    q = jnp.zeros((4, 10))
    with _pytest.raises(ValueError, match="multiple"):
        update_feature_queue(q, jnp.asarray(8), jnp.ones((4, 4)))
    # divisible geometry wraps correctly
    q2, ptr = update_feature_queue(jnp.zeros((4, 8)), jnp.asarray(4),
                                   jnp.ones((4, 4)))
    assert int(ptr) == 0
    assert float(q2[:, 4:].sum()) == 16.0 and float(q2[:, :4].sum()) == 0.0


def test_irtr_loss_rejects_batch_of_one():
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from vqattack_tpu.train.objectives import vlmo_irtr_train_loss

    batch = {"pixels": jnp.zeros((1, 8, 8, 3)),
             "text_ids": jnp.ones((1, 4), jnp.int32),
             "text_mask": jnp.ones((1, 4), jnp.int32)}
    with _pytest.raises(ValueError, match="batch >= 2"):
        vlmo_irtr_train_loss(None, None, batch, jax.random.key(0))
