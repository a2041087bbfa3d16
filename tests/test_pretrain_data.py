"""VLMo pretraining data family: raw fixtures -> arrow writers -> datasets.

Builds a synthetic raw-data tree for each corpus in the reference's layout
(``vlmo/utils/write_*.py`` inputs), runs the writers, and opens the results
through the dataset classes — proving the full prep pipeline end to end.
"""

import json
import os

import numpy as np
import pytest

from vqattack_tpu.data import pretrain_writers as w
from vqattack_tpu.data.pretrain_datasets import (
    ConcatDataset,
    make_pretrain_dataset,
)


def _save_img(path, size=20, seed=0, fmt="JPEG"):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.random.default_rng(seed).integers(0, 255, (size, size, 3), np.uint8)
    Image.fromarray(arr, "RGB").save(path, fmt)


def _transform(img):
    return np.asarray(img.resize((16, 16)), np.float32) / 127.5 - 1.0


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """One synthetic raw tree per corpus, in the reference's layouts."""
    root = tmp_path_factory.mktemp("raw")

    # --- coco karpathy -----------------------------------------------------
    coco = root / "coco"
    images = []
    for i, split in enumerate(["train", "val", "restval", "test"]):
        fn = f"COCO_{split}_{i:06d}.jpg"
        sub = "train2014" if split in ("train", "restval") else "val2014"
        _save_img(str(coco / sub / fn), seed=i)
        images.append(
            {"filename": fn, "split": split,
             "sentences": [{"raw": f"a {split} photo"},
                           {"raw": f"another {split} photo"}]}
        )
    os.makedirs(coco / "karpathy", exist_ok=True)
    json.dump({"images": images}, open(coco / "karpathy" / "dataset_coco.json", "w"))

    # --- f30k karpathy -----------------------------------------------------
    f30k = root / "f30k"
    images = []
    for i, split in enumerate(["train", "val", "test"]):
        fn = f"f30k_{i}.jpg"
        _save_img(str(f30k / "flickr30k-images" / fn), seed=10 + i)
        images.append(
            {"filename": fn, "split": split,
             "sentences": [{"raw": f"flickr {split} caption"}]}
        )
    os.makedirs(f30k / "karpathy", exist_ok=True)
    json.dump(
        {"images": images}, open(f30k / "karpathy" / "dataset_flickr30k.json", "w")
    )

    # --- conceptual captions ------------------------------------------------
    gcc = root / "gcc"
    for split in ["train", "val"]:
        annot = []
        for i in range(3):
            fn = f"cc_{split}_{i}.jpg"
            _save_img(str(gcc / f"images_{split}" / "0" / fn), seed=20 + i)
            annot.append([f"images_{split}/0/{fn}", f"cc {split} caption {i}"])
        json.dump(annot, open(gcc / f"{split}_annot.json", "w"))

    # --- sbu -----------------------------------------------------------------
    sbu = root / "sbu"
    annot = []
    for i in range(3):
        fn = f"sbu_{i}.jpg"
        _save_img(str(sbu / "images_train" / "0" / fn), seed=30 + i)
        annot.append([f"images_train/0/{fn}", f"sbu caption {i}"])
    json.dump(annot, open(sbu / "annot.json", "w"))

    # --- visual genome --------------------------------------------------------
    vg = root / "vg"
    regions = []
    for i in range(2):
        _save_img(str(vg / "images" / "VG_100K" / f"{100 + i}.jpg"), seed=40 + i)
        regions.append(
            {"regions": [
                {"image_id": 100 + i, "phrase": f"vg region {i}",
                 "width": 5, "height": 6, "x": 1, "y": 2},
                {"image_id": 100 + i, "phrase": f"vg region {i} b",
                 "width": 3, "height": 4, "x": 0, "y": 0},
            ]}
        )
    os.makedirs(vg / "annotations", exist_ok=True)
    json.dump(regions, open(vg / "annotations" / "region_descriptions.json", "w"))

    # --- wikibk ----------------------------------------------------------------
    wk = root / "wikibk"
    os.makedirs(wk, exist_ok=True)
    for i in range(2):
        with open(wk / f"wikibk.{i}.txt", "w") as f:
            f.write(f"sentence one of shard {i}\nsentence two of shard {i}\n")

    # --- nlvr2 -------------------------------------------------------------------
    nl = root / "nlvr2root"
    rows = []
    for i in range(2):
        iden = f"train-{i}-0"
        base = nl / "images" / "train" / "7" / iden
        _save_img(str(base) + "-img0.png", seed=50 + i, fmt="PNG")
        _save_img(str(base) + "-img1.png", seed=60 + i, fmt="PNG")
        rows.append(
            {"identifier": iden + "-0", "sentence": f"the images match {i}",
             "label": "True" if i == 0 else "False", "directory": 7}
        )
    os.makedirs(nl / "nlvr2" / "data", exist_ok=True)
    with open(nl / "nlvr2" / "data" / "train.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    # --- textvqa ------------------------------------------------------------
    tv = root / "textvqa"
    _save_img(str(tv / "train_images" / "tvimg0.jpg"), seed=70)
    for split, qid in (("train", 1), ("val", 2)):
        # 10 human answers: "sign" x4, "stop sign" x6 -> scores 1.0, 1.0
        json.dump(
            {"data": [{"image_id": "tvimg0", "question_id": qid,
                       "question": f"what does the {split} sign say",
                       "answers": ["sign"] * 4 + ["stop sign"] * 6}]},
            open(tv / f"TextVQA_0.5.1_{split}.json", "w"),
        )

    return root


@pytest.fixture(scope="module")
def arrow_root(data_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("arrow"))
    assert len(w.write_coco_karpathy(str(data_root / "coco"), out)) == 4
    assert len(w.write_f30k_karpathy(str(data_root / "f30k"), out)) == 3
    assert len(w.write_conceptual_caption(str(data_root / "gcc"), out)) == 2
    assert len(w.write_sbu(str(data_root / "sbu"), out)) == 1
    assert len(w.write_vg(str(data_root / "vg"), out)) == 1
    assert len(w.write_wikibk(str(data_root / "wikibk"), out)) == 2
    assert len(w.write_nlvr2(str(data_root / "nlvr2root"), out)) == 1
    assert len(w.write_text_vqa(str(data_root / "textvqa"), out)) == 2
    return out


@pytest.mark.parametrize("name,n_train", [
    ("coco", 4),   # train(2 captions) + restval(2 captions)
    ("f30k", 1),
    ("gcc", 3),
    ("sbu", 3),
    ("vg", 4),     # 2 images x 2 region phrases
])
def test_caption_datasets(arrow_root, name, n_train):
    ds = make_pretrain_dataset(name, arrow_root, _transform, split="train")
    assert len(ds) == n_train
    item = ds[0]
    assert item["pixels"].shape == (1, 16, 16, 3)
    assert isinstance(item["text"], str) and item["text"]


def test_wikibk_dataset(arrow_root):
    ds = make_pretrain_dataset("wikibk", arrow_root, None, split="train")
    assert len(ds) == 4  # 2 shards x 2 sentences
    assert "sentence" in ds[0]["text"]


def test_nlvr2_dataset(arrow_root):
    ds = make_pretrain_dataset("nlvr2", arrow_root, _transform, split="train")
    assert len(ds) == 2
    item = ds[0]
    assert item["pixels0"].shape == (1, 16, 16, 3)
    assert item["pixels1"].shape == (1, 16, 16, 3)
    assert item["label"] in (0, 1)
    labels = sorted(ds[i]["label"] for i in range(len(ds)))
    assert labels == [0, 1]


def test_text_vqa_writer(arrow_root):
    """TextVQA rows carry the writer's occurrence-score quirks
    (write_text_vqa.py:13-23,44): non-official score table, zero-filled
    answer_labels, both splits drawn from train_images."""
    import pyarrow as pa

    for split in ("train", "val"):
        with pa.memory_map(
            os.path.join(arrow_root, f"text_vqa_{split}.arrow"), "r"
        ) as src:
            tbl = pa.ipc.RecordBatchFileReader(src).read_all()
        assert tbl.column_names == [
            "image", "questions", "answers", "answer_labels",
            "answer_scores", "image_id", "question_id", "split"]
        assert tbl.num_rows == 1
        row = tbl.to_pylist()[0]
        assert row["image_id"] == "tvimg0"
        assert row["answers"] == [["sign", "stop sign"]]
        assert row["answer_scores"] == [[1.0, 1.0]]  # counts 4 and 6 both cap
        assert row["answer_labels"] == [[0, 0]]
    assert w.textvqa_occurrence_score(1) == pytest.approx(0.3)
    assert w.textvqa_occurrence_score(3) == pytest.approx(0.9)
    assert w.textvqa_occurrence_score(7) == 1.0


def test_concat_dataset(arrow_root):
    a = make_pretrain_dataset("coco", arrow_root, _transform, split="train")
    b = make_pretrain_dataset("sbu", arrow_root, _transform, split="train")
    cat = ConcatDataset([a, b])
    assert len(cat) == len(a) + len(b)
    assert cat[len(a)]["text"] == b[0]["text"]


def test_arrow_schema_roundtrip_matches_reference_layout(arrow_root):
    """The written tables carry the reference's exact column sets."""
    import pyarrow as pa

    def cols(name):
        with pa.memory_map(os.path.join(arrow_root, name), "r") as src:
            return pa.ipc.RecordBatchFileReader(src).read_all().column_names

    assert cols("coco_caption_karpathy_train.arrow") == [
        "image", "caption", "image_id", "split"]
    assert cols("vg.arrow") == [
        "image", "caption", "width", "height", "x", "y", "image_id"]
    assert cols("wikibk_train_0.arrow") == ["image", "caption", "source", "split"]
    assert cols("nlvr2_train.arrow") == [
        "image_0", "image_1", "questions", "answers", "identifier"]
