"""Batched lockstep attack: bucketing, invariants, single-sample equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.attacks.batched import BatchedAlbefAttack
from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
from vqattack_tpu.config import tiny_test_config
from vqattack_tpu.models.albef import AlbefPretrain
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.text.similarity import NullGate
from vqattack_tpu.text.tokenizer import WordPieceTokenizer

WORDS = ["what", "color", "is", "the", "dog", "cat", "red", "blue", "hat",
         "a", "park", "ball"]


@pytest.fixture(scope="module")
def batched():
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

    pipe = AlbefAttackPipeline(
        cfg, surrogate, sparams, tok, NullGate(),
        mlm_model=mlm, mlm_params=mparams, use_pallas=False,
    )
    return BatchedAlbefAttack(pipe)


def _samples(n, with_para=False):
    rng = np.random.default_rng(0)
    out = []
    questions = ["what color is the dog", "what color is the cat",
                 "what color is the hat", "what color is the ball"]
    for i in range(n):
        s = {
            "qid": str(3000 + i),
            "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
            "question": questions[i % len(questions)],
        }
        if with_para:
            word = questions[i % len(questions)].split()[-1]
            s["paraphrase"] = f"the {word} is red."
            s["target_answer"] = "red"
            s["all_correct_answers"] = ["red", "blue"]
        out.append(s)
    return out


def test_batched_feature_bucket(batched):
    samples = _samples(3)
    results = batched.run(samples, batch_size=2)
    assert len(results) == 3
    eps = batched.p.cfg.attack.eps
    for r, s in zip(sorted(results, key=lambda r: r.qid), samples):
        assert r.old_alg == 1
        assert (np.abs(r.adv_image - s["pixels"]) <= eps + 1e-5).all()
        assert np.abs(r.adv_image - s["pixels"]).max() > 1e-3
        assert r.feat_losses.shape[0] == batched.p.cfg.attack.num_iters


def test_batched_mar_bucket(batched):
    samples = _samples(2, with_para=True)
    results = batched.run(samples, batch_size=2)
    assert len(results) == 2
    for r in results:
        assert r.old_alg == 0
        assert r.mlm_losses is not None


def test_batched_matches_single(batched):
    """Padding rows must behave exactly like independent fresh-state
    samples.  A 3-sample bucket at batch_size=4 pads with a duplicate of
    the last sample; running the same bucket with that duplicate added as
    a REAL 4th sample produces the identical chunk (same program, same
    fold key, same pixel rows), so the first three results must match
    bit-for-bit.  Any mutable-state leak from the padding copy into the
    real sample it mirrors (substitutions, mar_words) diverges here."""
    samples = _samples(3, with_para=True)
    manual = samples + [dict(samples[-1])]     # the padding row, made real
    r_pad = batched.run(samples, batch_size=4)
    r_man = batched.run(manual, batch_size=4)[:3]
    assert len(r_pad) == 3
    for a, b in zip(r_pad, r_man):
        assert a.qid == b.qid
        assert a.adv_text == b.adv_text
        assert a.substitutions == b.substitutions
        assert np.array_equal(a.adv_image, b.adv_image)
        assert np.array_equal(a.feat_losses, b.feat_losses)
        assert np.isfinite(a.feat_losses).all()


def test_batched_vlmo(batched):
    """VLMo lockstep bucket via the adapter subclass."""
    import dataclasses as dc

    from vqattack_tpu.attacks.batched import BatchedVlmoAttack
    from vqattack_tpu.attacks.vlmo_orchestrator import VlmoAttackPipeline
    from vqattack_tpu.models.vlmo import VLMo

    tok = WordPieceTokenizer.toy(WORDS)
    base = tiny_test_config()
    vcfg = dc.replace(base.vlmo, vocab_size=tok.vocab_size)
    cfg = dc.replace(base, vlmo=vcfg)
    model = VLMo(vcfg)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, vcfg.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    sparams = jax.jit(
        lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
    )(jax.random.key(0))
    mlm_cfg = dc.replace(base.albef.bert, vocab_size=tok.vocab_size,
                         fusion_layer=base.albef.bert.num_layers)
    from vqattack_tpu.models.bert import FusionBert

    mlm = FusionBert(mlm_cfg, with_mlm_head=True)
    mparams = jax.jit(lambda k: mlm.init(k, ids[:, :8], mask[:, :8]))(jax.random.key(1))
    pipe = VlmoAttackPipeline(
        cfg, model, sparams, sparams, tok, NullGate(),
        mlm_model=mlm, mlm_params=mparams, use_pallas=False,
    )
    b = BatchedVlmoAttack(pipe)

    rng = np.random.default_rng(0)
    samples = [
        {"qid": str(4000 + i),
         "pixels": rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32),
         "question": "what color is the dog",
         "paraphrase": "the dog is red.", "target_answer": "red",
         "all_correct_answers": ["red"]}
        for i in range(2)
    ]
    results = b.run(samples, batch_size=2)
    assert len(results) == 2
    for r in results:
        assert r.old_alg == 0 and r.mlm_losses is not None
        assert (np.abs(r.adv_image) <= 1 + 1e-6).all()


def test_batched_on_mesh(batched):
    """The lockstep bucket sharded over the 8-device CPU mesh (config #5)."""
    from vqattack_tpu.attacks.batched import BatchedAlbefAttack
    from vqattack_tpu.parallel.mesh import make_mesh

    mesh_attack = BatchedAlbefAttack(batched.p, mesh=make_mesh(8))
    samples = _samples(8)
    results = mesh_attack.run(samples, batch_size=8)
    assert len(results) == 8
    eps = batched.p.cfg.attack.eps
    by_qid = {s["qid"]: s for s in samples}
    for r in results:
        s = by_qid[r.qid]
        assert (np.abs(r.adv_image - s["pixels"]) <= eps + 1e-5).all()
        assert np.isfinite(r.feat_losses).all()


def test_pipelined_buckets_match_serial(batched):
    """``pipeline_depth > 1`` overlaps independent buckets on worker threads
    (attacks/batched.py::run); results must be bit-identical to the serial
    order — same qid order, same adversarial images, same substitutions."""
    samples = _samples(6, with_para=True) + _samples(3)
    # distinct qids across the two groups
    for i, s in enumerate(samples):
        s["qid"] = str(5000 + i)
    serial = batched.run(samples, batch_size=2, pipeline_depth=1)
    piped = batched.run(samples, batch_size=2, pipeline_depth=3)
    assert [r.qid for r in piped] == [r.qid for r in serial]
    for a, b in zip(serial, piped):
        np.testing.assert_array_equal(a.adv_image, b.adv_image)
        assert a.adv_text == b.adv_text
        assert a.substitutions == b.substitutions
        np.testing.assert_array_equal(a.feat_losses, b.feat_losses)


def test_leftover_chunks_pad_to_pow2(batched):
    """A partial tail bucket pads to the next power of two, not the full
    batch size (chip time scales with padded rows)."""
    samples = _samples(3)  # same bucket key (equal k, no paraphrase)
    out = batched.run(samples, batch_size=8)
    assert len(out) == 3
    assert batched.last_chunk_sizes == [4]       # next_pow2(3), not 8
    assert abs(batched.last_occupancy - 3 / 4) < 1e-9
