"""Retrieval recall, caption scorers, Grad-CAM probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.eval.caption_scorers import bleu, cider, rouge_l
from vqattack_tpu.eval.retrieval_eval import (
    irtr_recall,
    irtr_recall_with_rerank,
    recall_at_k,
)


def test_recall_at_k():
    scores = np.array([[0.9, 0.1, 0.0], [0.2, 0.1, 0.8], [0.5, 0.6, 0.4]])
    gt = np.array([0, 2, 0])
    r = recall_at_k(scores, gt, ks=(1, 2))
    assert r["r@1"] == pytest.approx(2 / 3)
    assert r["r@2"] == pytest.approx(1.0)


def test_irtr_recall_perfect():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(5, 8))
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt = img + 0.01 * rng.normal(size=(5, 8))
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    res = irtr_recall(img, txt, np.arange(5))
    assert res["t2i_r@1"] == 1.0 and res["i2t_r@1"] == 1.0

    def itm_fn(t_idx, i_idx):
        return np.asarray([(txt[t] @ img[i]) for t, i in zip(t_idx, i_idx)])

    rr = irtr_recall_with_rerank(img, txt, np.arange(5), itm_fn, k_test=3)
    assert rr["rerank_t2i_r@1"] == 1.0


def test_caption_scorers():
    cands = ["the dog runs fast", "a cat sits"]
    refs = [["the dog runs fast", "a dog runs"], ["a cat sits on the mat"]]
    assert bleu(cands, refs) > 0.5
    assert rouge_l(cands, refs) > 0.5
    assert cider(cands, refs) > 0.0
    # degenerate: no overlap
    assert bleu(["xyz"], [["abc def"]]) == 0.0
    assert rouge_l(["xyz"], [["abc def"]]) == 0.0


def test_gradcam_probe():
    from vqattack_tpu.config import tiny_test_config
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.utils.gradcam import albef_question_gradcam

    cfg = tiny_test_config().albef
    model = AlbefPretrain(cfg)
    px = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32
    )
    ids = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones_like(ids)
    params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
    cam = albef_question_gradcam(model, params, px, ids, mask, layer=3)
    g = cfg.vit.image_size // cfg.vit.patch_size
    assert cam.shape == (1, g, g)
    assert np.isfinite(cam).all() and (cam >= 0).all()
    assert cam.max() > 0  # some attention mass reaches the patches


def test_visualize_cli(tmp_path):
    """Grad-CAM CLI smoke: writes a heat-map overlay PNG."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import dataclasses

    from PIL import Image

    from vqattack_tpu import config as cfg_mod
    from vqattack_tpu.text.tokenizer import SPECIAL_TOKENS
    from vqattack_tpu.visualize import main

    toks = list(SPECIAL_TOKENS) + ["what", "color", "is", "the", "dog"]
    for c in "abcdefghijklmnopqrstuvwxyz":
        toks += [c, f"##{c}"]
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(toks) + "\n")

    rng = np.random.default_rng(0)
    img_path = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(img_path)

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=len(toks))
    cfg = dataclasses.replace(base, albef=dataclasses.replace(base.albef, bert=bert))
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out = tmp_path / "cam.png"
    main([
        "--image", str(img_path), "--question", "what color is the dog",
        "--vocab", str(vocab), "--config", str(cfg_path),
        "--layer", "3", "--out", str(out),
    ])
    assert out.exists()
    with Image.open(out) as im:
        assert im.size == (32, 32)


def test_grounding_eval(tmp_path):
    """REFER loader + grounding accuracy (refTools/refer_python3.py +
    dataset/utils.py:149-213 semantics) on a synthetic RefCOCO tree."""
    import json
    import os

    from vqattack_tpu.eval.grounding import (
        Refer,
        compute_iou,
        grounding_accuracy,
    )

    data_dir = tmp_path / "refcoco+"
    os.makedirs(data_dir)
    refs = [
        # val ref whose box sits in the bright quadrant of the heatmap
        {"ref_id": 1, "ann_id": 10, "image_id": 100, "category_id": 1,
         "split": "val", "sentences": [{"sent_id": 0, "sent": "left thing",
                                        "tokens": ["left", "thing"]}]},
        # testA ref whose box does NOT match where the heatmap points
        {"ref_id": 2, "ann_id": 11, "image_id": 100, "category_id": 1,
         "split": "testA", "sentences": [{"sent_id": 1, "sent": "right thing",
                                          "tokens": ["right", "thing"]}]},
    ]
    json.dump(refs, open(data_dir / "refs(unc).json", "w"))
    json.dump(
        {"images": [{"id": 100, "height": 48, "width": 48}],
         "annotations": [
             {"id": 10, "image_id": 100, "bbox": [0, 0, 24, 24]},
             {"id": 11, "image_id": 100, "bbox": [24, 24, 24, 24]},
         ],
         "categories": [{"id": 1, "name": "thing"}]},
        open(data_dir / "instances.json", "w"),
    )
    refer = Refer(str(tmp_path), "refcoco+", "unc")
    assert set(refer.getRefIds("val")) == {1}
    assert refer.getRefBox(2) == [24, 24, 24, 24]

    # IoU follows the reference's inclusive-pixel formula
    assert compute_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert compute_iou([0, 0, 10, 10], [20, 20, 5, 5]) == 0.0

    # heatmap bright in the top-left quadrant -> both refs pick the
    # top-left detection box: correct for ref 1 (val), wrong for ref 2
    pred = np.zeros((24, 24), np.float32)
    pred[:12, :12] = 1.0
    dets = {"100": [[0, 0, 24, 24], [24, 24, 24, 24]]}
    acc = grounding_accuracy(
        [{"ref_id": 1, "pred": pred}, {"ref_id": 2, "pred": pred}],
        dets, refer, alpha=0.5, mask_size=24,
    )
    assert acc == {"val_d": 1.0, "testA_d": 0.0}
