"""Data layer + eval metrics tests (transform numerics, VQA dataset JSON
path, arrow round-trip, side tables, official soft accuracy)."""

import json

import numpy as np
import pytest

from vqattack_tpu.data.side_tables import SideTables
from vqattack_tpu.data.transforms import (
    denormalize,
    inception_normalize,
    train_transform,
)
from vqattack_tpu.data.transforms import test_transform as make_eval_transform
from vqattack_tpu.data.vqa import VQADataset, pre_question
from vqattack_tpu.eval.metrics import AttackAccuracy, VQAScore
from vqattack_tpu.eval.vqa_eval import VQAEval, normalize_answer, vqa_soft_accuracy


def test_normalize_roundtrip():
    img = np.random.default_rng(0).integers(0, 255, (8, 8, 3), np.uint8)
    x = inception_normalize(img)
    assert x.min() >= -1 and x.max() <= 1
    back = denormalize(x)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_test_transform_range_and_shape():
    pytest.importorskip("PIL")
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (37, 53, 3), np.uint8)
    )
    x = make_eval_transform(32)(img)
    assert x.shape == (32, 32, 3) and x.dtype == np.float32
    assert -1 <= x.min() and x.max() <= 1
    y = train_transform(32)(img)
    assert y.shape == (32, 32, 3)


def test_pre_question():
    # reference semantics (dataset/utils.py:3-16): strips , . ' ! ? " ( ) *
    # # : ; ~ and maps -/ to spaces — the side tables are keyed to
    # predictions on THIS normalization
    assert pre_question("What IS the Dog; doing?!") == "what is the dog doing"
    assert pre_question("What's on the red-striped sofa/couch?") == (
        "whats on the red striped sofa couch"
    )
    assert pre_question("a b c d", max_words=2) == "a b"


def test_pre_question_matches_reference():
    """Differential: byte-identical to the reference's own pre_question for
    a punctuation-heavy battery (the stored answer tables assume it)."""
    import reference_shim as rs

    mod = rs.albef_dataset_utils()
    cases = [
        "What IS the Dog; doing?!",
        "What's on the red-striped sofa/couch?",
        "Is this a/b or (c)?  ",
        'He said "hi, there" -- twice!',
        "a b c d e f",
        "one, two, three... four?",
    ]
    for q in cases:
        assert pre_question(q, 30) == mod.pre_question(q, 30), q


def test_vqa_dataset_json(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / "x.jpg")
    ann = [
        {"image": "x.jpg", "question": "What color?", "question_id": 7,
         "answer": ["red", "red", "blue"]},
    ]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    alist = tmp_path / "answers.json"
    alist.write_text(json.dumps(["red", "blue"]))

    ds = VQADataset([str(ann_file)], str(img_dir), make_eval_transform(16),
                    split="train", answer_list=str(alist))
    item = ds[0]
    assert item["pixels"].shape == (1, 16, 16, 3)
    assert item["answers"] == ["red[SEP]", "blue[SEP]"]
    np.testing.assert_allclose(item["weights"], [2 / 3, 1 / 3])
    assert ds.answer_list == ["red", "blue"]

    test_ds = VQADataset([str(ann_file)], str(img_dir), make_eval_transform(16))
    items = list(test_ds.iter_batches(num_workers=2))
    assert len(items) == 1 and items[0]["qid"] == 7


def test_vqa_dataset_reference_task_dialects(tmp_path):
    """The reference's VE / NLVR / grounding annotation jsons load as-is
    (ve_dataset.py / nlvr_dataset.py / grounding_dataset.py layouts)."""
    pytest.importorskip("PIL")
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for name in ("a.jpg", "b.jpg", "ve_img.jpg"):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / name)

    # VE: 'sentence' text, string entailment label, extensionless image name
    # (ve_dataset.py:24 appends '.jpg')
    ve = tmp_path / "ve.json"
    ve.write_text(json.dumps([
        {"image": "ve_img", "sentence": "A man rides.", "label": "entailment"},
        {"image": "ve_img", "sentence": "A man sleeps.", "label": "contradiction"},
    ]))
    ds = VQADataset([str(ve)], str(img_dir), make_eval_transform(16))
    assert ds[0]["question"] == "a man rides"  # pre_question lowercase+strip
    assert ds[0]["label"] == 2 and ds[1]["label"] == 0

    # NLVR: paired 'images', 'True'/'False' labels (nlvr_dataset.py:25-38)
    nl = tmp_path / "nlvr.json"
    nl.write_text(json.dumps([
        {"images": ["a.jpg", "b.jpg"], "sentence": "Both match.",
         "label": "True"},
    ]))
    ds = VQADataset([str(nl)], str(img_dir), make_eval_transform(16))
    item = ds[0]
    assert item["pixels0"].shape == (1, 16, 16, 3)
    assert item["pixels1"].shape == (1, 16, 16, 3)
    assert item["label"] == 1

    # grounding: 'text' field, ref_id passthrough, image-identity indices
    # shared across same-image rows (grounding_dataset.py:17-45)
    gr = tmp_path / "grounding.json"
    gr.write_text(json.dumps([
        {"image": "a.jpg", "text": "left dog", "ref_id": 11},
        {"image": "b.jpg", "text": "right dog", "ref_id": 12},
        {"image": "a.jpg", "text": "the same image again", "ref_id": 13},
    ]))
    ds = VQADataset([str(gr)], str(img_dir), make_eval_transform(16))
    items = [ds[i] for i in range(3)]
    assert [i["ref_id"] for i in items] == [11, 12, 13]
    assert items[0]["img_idx"] == items[2]["img_idx"] != items[1]["img_idx"]
    assert items[0]["question"] == "left dog"


def test_side_tables(tmp_path):
    (tmp_path / "right.txt").write_text("100\n200\n")
    (tmp_path / "sur.json").write_text(json.dumps({"100": "red", "200": "dog"}))
    (tmp_path / "tgt.json").write_text(json.dumps({"100": "red"}))
    (tmp_path / "para.json").write_text(
        json.dumps({"100": ["red", "the car is red."]})
    )
    (tmp_path / "allc.json").write_text(json.dumps({"100": ["red", "crimson"]}))
    st = SideTables.load(
        [str(tmp_path / "right.txt")], [str(tmp_path / "sur.json")],
        [str(tmp_path / "tgt.json")], [str(tmp_path / "para.json")],
        [str(tmp_path / "allc.json")],
    )
    assert st.correct_qids == [100, 200]
    assert st.alignment_ok(100, ["red", "blue"], [1.0, 0.3])
    assert not st.alignment_ok(100, ["blue"], [1.0])
    info = st.attack_inputs(100)
    assert info["paraphrase"] == "the car is red."
    assert info["target_answer"] == "red"
    assert st.attack_inputs(999) is None


def test_arrow_roundtrip(tmp_path):
    pytest.importorskip("pyarrow")
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from vqattack_tpu.data.arrow import VQAv2ArrowDataset
    from vqattack_tpu.data.arrow_writer import write_vqa_arrow

    img_dir = tmp_path / "val2014"
    img_dir.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
        img_dir / "COCO_val2014_000000000001.jpg"
    )
    qjson = {"questions": [
        {"question": "what color?", "question_id": 11, "image_id": 1},
        {"question": "how many?", "question_id": 12, "image_id": 1},
    ]}
    ajson = {"annotations": [
        {"question_id": 11, "answers": [{"answer": "red"}] * 6 + [{"answer": "blue"}]},
        {"question_id": 12, "answers": [{"answer": "two"}] * 10},
    ]}
    (tmp_path / "q.json").write_text(json.dumps(qjson))
    (tmp_path / "a.json").write_text(json.dumps(ajson))
    out = tmp_path / "vqa.arrow"
    vocab = write_vqa_arrow(
        str(tmp_path / "q.json"), str(tmp_path / "a.json"), str(img_dir), str(out)
    )
    assert "red" in vocab and "2" in vocab  # number normalization applied

    ds = VQAv2ArrowDataset([str(out)], make_eval_transform(16))
    assert len(ds) == 2
    item = ds[0]
    assert item["pixels"].shape == (1, 16, 16, 3)
    assert item["qid"] in (11, 12)
    assert len(item["answer_labels"]) == len(item["answer_scores"])
    # soft score: 6x 'red' -> 1.0
    i11 = 0 if item["qid"] == 11 else 1
    it = ds[i11]
    assert max(it["answer_scores"]) == 1.0


def test_vqa_api_and_typed_eval():
    """The official VQA annotation api + per-type accuracy breakdown
    (vqaTools/vqa.py:24-160, vqaEval.py:68-121)."""
    from vqattack_tpu.eval.vqa_eval import VQA, VQAEval

    gt = {"annotations": [
        {"question_id": 1, "image_id": 10, "question_type": "what color",
         "answer_type": "other",
         "answers": [{"answer": "red"}] * 5 + [{"answer": "blue"}] * 5},
        {"question_id": 2, "image_id": 10, "question_type": "is the",
         "answer_type": "yes/no", "answers": [{"answer": "yes"}] * 10},
        {"question_id": 3, "image_id": 11, "question_type": "is the",
         "answer_type": "yes/no", "answers": [{"answer": "no"}] * 10},
    ]}
    qs = {"questions": [
        {"question_id": 1, "image_id": 10, "question": "what color is it"},
        {"question_id": 2, "image_id": 10, "question": "is the dog real"},
        {"question_id": 3, "image_id": 11, "question": "is the cat real"},
    ]}
    vqa = VQA(gt, qs)
    assert sorted(vqa.getQuesIds(imgIds=[10])) == [1, 2]
    assert sorted(set(vqa.getImgIds(ansTypes=["yes/no"]))) == [10, 11]
    assert vqa.loadQA(2)[0]["answers"][0]["answer"] == "yes"
    assert vqa.qqa[3]["question"] == "is the cat real"

    res = vqa.load_res([
        {"question_id": 1, "answer": "red"},
        {"question_id": 2, "answer": "yes"},
        {"question_id": 3, "answer": "yes"},
    ])
    assert res.qa[1]["answer_type"] == "other"

    ev = VQAEval()
    out = ev.evaluate(vqa, res)
    # q1: "red" matches 5 of 10 -> 1.0; q2 correct 1.0; q3 wrong 0.0
    assert out["overall"] == pytest.approx(100 * (1.0 + 1.0 + 0.0) / 3)
    assert out["perAnswerType"]["yes/no"] == pytest.approx(50.0)
    assert out["perQuestionType"]["what color"] == pytest.approx(100.0)


def test_vqa_soft_accuracy():
    # official leave-one-out values (vqaEval.py:97-105): k matches of n are
    # NOT min(1, k/3) — each matching annotator's own subset sees k-1
    assert vqa_soft_accuracy("red", ["red"] * 3 + ["blue"] * 7) == pytest.approx(0.9)
    assert vqa_soft_accuracy("red", ["red", "blue", "blue"]) == pytest.approx(2 / 9)
    assert vqa_soft_accuracy("red", ["red"] * 4 + ["blue"] * 6) == 1.0
    assert vqa_soft_accuracy("Red!", ["red"] * 5) == 1.0  # normalization
    assert vqa_soft_accuracy("two", ["2"] * 5) == 1.0  # number words
    assert normalize_answer("The dog") == "dog"  # article strip


def test_attack_accuracy_and_vqascore():
    aa = AttackAccuracy(print_every=2)
    aa.update("blue", "red")
    aa.update("red", "red")
    assert aa.value == 0.5
    vs = VQAScore()
    logits = np.array([[0.1, 0.9], [0.8, 0.2]])
    targets = np.array([[0.0, 1.0], [0.3, 0.0]])
    vs.update_logits(logits, targets)
    assert vs.compute() == pytest.approx((1.0 + 0.3) / 2)


def test_device_preprocess_matches_pil():
    pytest.importorskip("PIL")
    import jax.numpy as jnp
    from PIL import Image

    from vqattack_tpu.data.device_transforms import device_preprocess

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (60, 44, 3), np.uint8)
    out = np.asarray(device_preprocess(jnp.asarray(raw[None]), out_size=32))[0]
    ref = make_eval_transform(32)(Image.fromarray(raw))
    # PIL rounds to uint8 after EACH separable pass and clips negative cubic
    # lobes per pass; the device path computes in float. Mean agreement is
    # sub-level; outliers stay within ~10 uint8 levels.
    assert out.shape == ref.shape
    d = np.abs(out - ref)
    assert d.mean() < 0.01 and d.max() < 0.1, (d.mean(), d.max())
    # upsample path too
    raw2 = rng.integers(0, 255, (20, 20, 3), np.uint8)
    out2 = np.asarray(device_preprocess(jnp.asarray(raw2[None]), out_size=32))[0]
    ref2 = make_eval_transform(32)(Image.fromarray(raw2))
    d2 = np.abs(out2 - ref2)
    assert d2.mean() < 0.01 and d2.max() < 0.12, (d2.mean(), d2.max())


def test_side_tables_string_and_int_qids(tmp_path):
    (tmp_path / "right.txt").write_text("7\n")
    for name, content in [("sur", {"7": "a"}), ("tgt", {"7": "a"}),
                          ("para", {"7": ["a", "b c."]}), ("allc", {"7": ["a"]})]:
        (tmp_path / f"{name}.json").write_text(json.dumps(content))
    st = SideTables.load([str(tmp_path / "right.txt")], [str(tmp_path / "sur.json")],
                         [str(tmp_path / "tgt.json")], [str(tmp_path / "para.json")],
                         [str(tmp_path / "allc.json")])
    # both int and numeric-string qids resolve
    assert st.attack_inputs(7)["target_answer"] == "a"
    assert st.attack_inputs("7")["target_answer"] == "a"


def test_meters_log_every():
    from vqattack_tpu.utils.meters import MetricLogger

    lines = []
    logger = MetricLogger(log_fn=lines.append)
    for item in logger.log_every(range(5), 2, "hdr"):
        logger.update(x=float(item))
    assert any("hdr" in l for l in lines)
    assert any("Total time" in l for l in lines)
    assert logger.meters["x"].global_avg == 2.0


def test_all_reduce_mean_single_process():
    from vqattack_tpu.eval.metrics import all_reduce_mean

    assert all_reduce_mean([1.0, 2.0, 3.0]) == 2.0
    assert all_reduce_mean([]) == 0.0


def test_pixelbert_transform_geometry_and_registry():
    """pixelbert output dims are //32-snapped MinMax sizes; the registry
    resolves the reference's four transform keys
    (``vlmo/transforms/__init__.py:10-19``)."""
    pytest.importorskip("PIL")
    from PIL import Image

    from vqattack_tpu.data.transforms import (
        keys_to_transforms,
        pixelbert_transform,
        pixelbert_transform_randaug,
    )

    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (480, 640, 3), dtype=np.uint8)
    )
    x = pixelbert_transform(size=384)(img)
    # shorter 480 -> 384, longer 640 -> 512; both multiples of 32
    assert x.shape == (384, 512, 3) and x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0

    y = pixelbert_transform_randaug(size=224)(img)
    assert y.ndim == 3 and y.shape[0] % 32 == 0 and y.shape[1] % 32 == 0

    import random

    fns = keys_to_transforms(
        ["pixelbert", "pixelbert_randaug", "square_transform",
         "square_transform_randaug"], size=224)
    assert len(fns) == 4
    sq = fns[2](img)
    assert sq.shape == (224, 224, 3)
    random.seed(0)
    tr = fns[3](img)
    assert tr.shape == (224, 224, 3)
