"""Self-arming asset-gated validations (VERDICT round 2, Next #5).

Every test here skips cleanly in the zero-egress CI environment and lights
up — with zero new code — the day the reference's external assets mount.
Point ``VQATTACK_ASSETS`` at a directory containing any of:

    ALBEF.pth                    # reference surrogate (ALBEF pre-train)
    albef_vqa.pth                # reference victim (ALBEF VQA fine-tune)
    bert-base-uncased/           # HF dir: weights + vocab.txt
    use/                         # TF-hub Universal Sentence Encoder SavedModel
    vqa_val/                     # VQAv2 val images (COCO_val2014_*.jpg)
    vqa_5k/ann.json              # the reference's 5k attack subset annotations
    vqa_5k/{answers,right,sur,tgt,para,allc}.json|txt  # side tables

Run with ``python -m pytest -m assets tests/test_assets_gated.py`` (the
``assets`` marker selects them; they also run in a plain suite invocation,
skipping where files are absent).  This is the ASR-parity prologue of
ROADMAP.md's runbook as executable tests:

- USE-gate byte parity vs the TF-hub model itself
  (``adv_attack.py:101-103`` loads the same hub module);
- BertMeanPoolGate calibration on the REAL bert-base checkpoint, asserting
  the shipped default operating point (0.985) against the measured one;
- a 10-pair ``gen_feats`` golden check: real-checkpoint activations vs the
  reference's own torch model run in-process (better than saved goldens);
- a 50-sample flip-rate smoke through the production CLI.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ASSETS = os.environ.get("VQATTACK_ASSETS", "/root/assets")


def _asset(*parts):
    return os.path.join(ASSETS, *parts)


def _need(*parts):
    p = _asset(*parts)
    if not os.path.exists(p):
        pytest.skip(f"asset not mounted: {p} (set VQATTACK_ASSETS)")
    return p


pytestmark = pytest.mark.assets


@pytest.mark.assets
def test_use_gate_parity_vs_tfhub():
    """``USEGate`` must reproduce the TF-hub model's cosine scores exactly —
    the reference thresholds USE-space similarity at 0.95
    (``adv_attack.py:315-318``); any embedding drift shifts accept/reject
    decisions and therefore ASR."""
    use_dir = _need("use")
    tf = pytest.importorskip("tensorflow")
    hub = pytest.importorskip("tensorflow_hub")

    from vqattack_tpu.text.similarity import USEGate

    gate = USEGate(use_dir)
    ref_q = "what color is the dog"
    cands = ["what colour is the dog", "what color is the cat",
             "dog the is color what", "how many dogs are there"]
    got = gate.scores(ref_q, cands)

    with tf.device("cpu"):
        model = hub.load(use_dir)
        embs = np.asarray(model([ref_q, *cands]))
    embs = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    want = embs[1:] @ embs[0]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # monotone sanity: the paraphrase outscores the scramble
    assert got[0] > got[2]


@pytest.mark.assets
def test_bert_gate_calibration_on_real_checkpoint():
    """Calibrate BertMeanPoolGate on the real bert-base weights against the
    real USE gate and assert the SHIPPED default (0.985, docs/GATES.md —
    currently derived from synthetic probes) sits within the measured
    calibration band.  A failure here means update
    ``similarity.BERT_SPACE_DEFAULT`` to the printed value."""
    _need("bert-base-uncased")
    _need("use")
    pytest.importorskip("tensorflow")

    _need("ALBEF.pth")
    import jax

    from vqattack_tpu.checkpoint.convert import (
        convert_albef_pretrain,
        load_torch_checkpoint,
    )
    from vqattack_tpu.config import albef_attack_config
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.run import _albef_text_tower  # the CLI's embed method
    from vqattack_tpu.text.calibrate import gate_score_profile, suggest_threshold
    from vqattack_tpu.text.similarity import (
        BERT_SPACE_DEFAULT,
        USEGate,
        make_gate,
    )
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.from_file(_asset("bert-base-uncased", "vocab.txt"))
    sd = load_torch_checkpoint(_asset("ALBEF.pth"))
    cfg = albef_attack_config()
    model = AlbefPretrain(cfg.albef)
    params = {"params": convert_albef_pretrain(sd, depth=12, num_layers=12,
                                               fusion_layer=6)}
    _embed = jax.jit(
        lambda v, ids, mask: model.apply(v, ids, mask,
                                         method=_albef_text_tower))
    gate = make_gate("bert", embed_fn=lambda i, m: _embed(params, i, m),
                     tokenizer=tok, max_length=cfg.attack.max_text_len)

    questions = [
        "what color is the dog", "how many people are in the photo",
        "is the man wearing a hat", "what is the woman holding",
        "where is the cat sitting", "what time of day is it",
    ]
    prof = gate_score_profile(gate, questions, np.random.default_rng(0))
    thr = suggest_threshold(prof)
    use_gate = USEGate(_asset("use"))
    prof_use = gate_score_profile(use_gate, questions, np.random.default_rng(0))
    thr_use = suggest_threshold(prof_use)
    print(f"calibrated bert threshold {thr:.4f} (USE {thr_use:.4f}); "
          f"shipped default {BERT_SPACE_DEFAULT}")
    assert abs(thr - BERT_SPACE_DEFAULT) < 0.02, (
        f"real-checkpoint calibration {thr:.4f} drifted from the shipped "
        f"default {BERT_SPACE_DEFAULT} — update BERT_SPACE_DEFAULT")


def _first_images(n):
    img_dir = _need("vqa_val")
    imgs = sorted(p for p in os.listdir(img_dir) if p.endswith(".jpg"))[:n]
    if len(imgs) < n:
        pytest.skip(f"need {n} images in {img_dir}")
    return [os.path.join(img_dir, p) for p in imgs]


@pytest.mark.assets
def test_gen_feats_golden_10_pairs():
    """Real-checkpoint activation parity: convert ``ALBEF.pth`` and compare
    ``gen_feats`` on 10 real image/question pairs against the reference's
    own torch model loaded from the same file (tolerance 1e-4 f32,
    ROADMAP.md runbook step 3)."""
    ckpt = _need("ALBEF.pth")
    _need("bert-base-uncased")
    torch = pytest.importorskip("torch")
    from PIL import Image

    import jax.numpy as jnp

    import reference_shim as rs
    from vqattack_tpu.checkpoint.convert import (
        convert_albef_pretrain,
        load_torch_checkpoint,
    )
    from vqattack_tpu.config import albef_attack_config
    from vqattack_tpu.data.transforms import test_transform
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    ref = rs.albef_models()
    sd = load_torch_checkpoint(ckpt)
    cfg = albef_attack_config().albef
    model = AlbefPretrain(cfg)
    params = {"params": convert_albef_pretrain(sd, depth=12, num_layers=12,
                                               fusion_layer=6)}

    # the reference model, from the same state dict
    import torch.nn as nn
    import types as _t

    pre = ref.pretrain.ALBEF_pre.__new__(ref.pretrain.ALBEF_pre)
    nn.Module.__init__(pre)
    pre.mlm_probability = 0.0
    pre.tokenizer = _t.SimpleNamespace(pad_token_id=0, cls_token_id=101,
                                       mask_token_id=103)
    from transformers.models.bert.configuration_bert import BertConfig as HFC

    pre.visual_encoder = ref.vit.VisionTransformer(
        img_size=480, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        mlp_ratio=4, qkv_bias=True)
    pre.text_encoder = ref.xbert.BertForMaskedLM(config=HFC(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072, fusion_layer=6,
        encoder_width=768, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0))
    pre.vision_proj = nn.Linear(768, 256)
    pre.text_proj = nn.Linear(768, 256)
    pre.itm_head = nn.Linear(768, 2)
    pre.temp = nn.Parameter(torch.ones([]) * 0.07)
    missing = pre.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not missing.unexpected_keys
    pre.eval()

    tok = WordPieceTokenizer.from_file(
        _asset("bert-base-uncased", "vocab.txt"))
    tfm = test_transform(480)
    qs = ["what color is this", "how many are there"] * 5
    for img_path, q in zip(_first_images(10), qs):
        px = np.asarray(tfm(Image.open(img_path).convert("RGB")))[None]
        ids1, mask1 = tok.encode(q, max_length=25)
        ids, mask = ids1[None].astype(np.int64), mask1[None].astype(np.int64)
        with torch.no_grad():
            il, tl = pre.Gen_feats(
                torch.from_numpy(px.transpose(0, 3, 1, 2)),
                torch.from_numpy(ids), torch.from_numpy(mask))
        img_j, txt_j, _ = model.apply(
            {"params": params["params"]}, jnp.asarray(px), jnp.asarray(ids),
            jnp.asarray(mask), method=AlbefPretrain.gen_feats)
        np.testing.assert_allclose(
            np.asarray(img_j), torch.stack(il, 1).numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(txt_j), torch.stack(tl, 1).numpy(), atol=1e-4)


@pytest.mark.assets
def test_flip_rate_smoke_50(tmp_path):
    """50-sample sweep through the production CLI on real assets: completes,
    flips a sane fraction, writes artifacts (ROADMAP.md runbook step 2)."""
    _need("ALBEF.pth")
    _need("albef_vqa.pth")
    ann = _need("vqa_5k", "ann.json")
    _need("vqa_val")

    out = tmp_path / "out"
    cmd = [
        sys.executable, "-m", "vqattack_tpu.run", "--pipeline", "albef",
        "--vocab", _asset("bert-base-uncased", "vocab.txt"),
        "--surrogate-ckpt", _asset("ALBEF.pth"),
        "--victim-ckpt", _asset("albef_vqa.pth"),
        "--bert-mlm", _asset("bert-base-uncased"),
        "--ann", ann, "--image-root", _asset("vqa_val"),
        "--answer-list", _asset("vqa_5k", "answers.json"),
        "--right-part", _asset("vqa_5k", "right.txt"),
        "--surrogate-ans", _asset("vqa_5k", "sur.json"),
        "--target-ans", _asset("vqa_5k", "tgt.json"),
        "--paraphrases", _asset("vqa_5k", "para.json"),
        "--all-correct", _asset("vqa_5k", "allc.json"),
        "--output", str(out), "--limit", "50", "--batch-size", "8",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    assert r.returncode == 0, r.stderr[-4000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["samples"] == 50
    # the reference reports ~65-75% ASR on ALBEF->ALBEF; a smoke floor of
    # 40% catches gross breakage without over-pinning
    assert summary["attack_accuracy"] >= 0.4, summary
    assert (out / "adv_txt_dict.json").exists()
