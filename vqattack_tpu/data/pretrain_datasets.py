"""The VLMo pretraining dataset family over arrow tables.

Mirrors ``vlmo/datasets/*.py``: each class binds the split -> arrow-name
mapping of its reference counterpart and yields the same item surface —
caption datasets give ``{pixels, text}``, wikibk is text-only, NLVR2 yields
the two image streams plus a boolean label.  Tables come from
:mod:`vqattack_tpu.data.pretrain_writers` (or the reference's own
``make_arrow`` outputs — the schemas are interchangeable).
"""

from __future__ import annotations

import io
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from vqattack_tpu.data.arrow import ArrowDataset, _open_table


def _resolve(dataset_root: str, names: Sequence[str]) -> List[str]:
    """names -> existing .arrow paths (missing shards are skipped, matching
    the reference's fixed-range name lists over partially-built dirs)."""
    paths = []
    for n in names:
        p = os.path.join(dataset_root, f"{n}.arrow")
        if os.path.exists(p):
            paths.append(p)
    if not paths:
        raise FileNotFoundError(
            f"none of {list(names)} found under {dataset_root}"
        )
    return paths


class CaptionArrowDataset(ArrowDataset):
    """(image, caption) pretraining item: ``{pixels, text}``."""

    def __getitem__(self, raw_index: int) -> Dict[str, Any]:
        return {
            "pixels": self.get_image(raw_index)[None],
            "text": self.get_text(raw_index),
            # aliases for task collators that expect VQA-style keys
            "question": self.get_text(raw_index),
        }


class CocoCaptionKarpathyDataset(CaptionArrowDataset):
    """``coco_caption_karpathy_dataset.py``: train = train+restval."""

    SPLITS = {
        "train": ["coco_caption_karpathy_train", "coco_caption_karpathy_restval"],
        "val": ["coco_caption_karpathy_val"],
        "test": ["coco_caption_karpathy_test"],
    }

    def __init__(self, dataset_root: str, transform: Callable, split: str = "train"):
        super().__init__(_resolve(dataset_root, self.SPLITS[split]), transform)


class F30KCaptionKarpathyDataset(CaptionArrowDataset):
    SPLITS = {
        "train": ["f30k_caption_karpathy_train"],
        "val": ["f30k_caption_karpathy_val"],
        "test": ["f30k_caption_karpathy_test"],
    }

    def __init__(self, dataset_root: str, transform: Callable, split: str = "train"):
        super().__init__(_resolve(dataset_root, self.SPLITS[split]), transform)


class ConceptualCaptionDataset(CaptionArrowDataset):
    """``conceptual_caption_dataset.py``: train shards 0..29, test -> val."""

    def __init__(self, dataset_root: str, transform: Callable, split: str = "train"):
        if split == "test":
            split = "val"
        names = (
            [f"conceptual_caption_train_{i}" for i in range(30)]
            if split == "train"
            else ["conceptual_caption_val_0"]
        )
        super().__init__(_resolve(dataset_root, names), transform)


class SBUCaptionDataset(CaptionArrowDataset):
    """``sbu_caption_dataset.py``: train shards 0..8; no val tables."""

    def __init__(self, dataset_root: str, transform: Callable, split: str = "train"):
        names = [f"sbu_{i}" for i in range(9)]
        super().__init__(_resolve(dataset_root, names), transform)


class VisualGenomeCaptionDataset(CaptionArrowDataset):
    """``vg_caption_dataset.py``: single ``vg.arrow``, train only."""

    def __init__(self, dataset_root: str, transform: Callable, split: str = "train"):
        super().__init__(_resolve(dataset_root, ["vg"]), transform)


class WikibkDataset:
    """Text-only MLM corpus (``wikibk_dataset.py``): ``{text}`` items; the
    image column holds the literal string "None"."""

    def __init__(self, dataset_root: str, transform: Callable = None,
                 split: str = "train", num_shards: int = 50):
        import pyarrow as pa

        if split == "test":
            split = "val"
        names = (
            [f"wikibk_train_{i}" for i in range(num_shards)]
            if split == "train"
            else ["wikibk_val_0"]
        )
        tables = [_open_table(p) for p in _resolve(dataset_root, names)]
        self.table = (
            pa.concat_tables(tables, promote_options="default")
            if len(tables) > 1
            else tables[0]
        )
        self._texts = self.table["caption"].to_pylist()
        self.index_mapper = [
            (i, j) for i, caps in enumerate(self._texts) for j in range(len(caps))
        ]

    def __len__(self) -> int:
        return len(self.index_mapper)

    def __getitem__(self, raw_index: int) -> Dict[str, Any]:
        i, j = self.index_mapper[raw_index]
        return {"text": self._texts[i][j], "question": self._texts[i][j]}


class NLVR2Dataset:
    """Paired-image reasoning (``nlvr2_dataset.py``): item =
    ``{pixels0, pixels1, sentence, label}`` with label in {0, 1}
    ("True"/"False" strings in the table)."""

    SPLITS = {
        "train": ["nlvr2_train"],
        "val": ["nlvr2_dev", "nlvr2_test1"],
        "test": ["nlvr2_dev", "nlvr2_test1"],
    }

    def __init__(self, dataset_root: str, transform: Callable, split: str = "train"):
        import pyarrow as pa

        tables = [_open_table(p) for p in _resolve(dataset_root, self.SPLITS[split])]
        self.table = (
            pa.concat_tables(tables, promote_options="default")
            if len(tables) > 1
            else tables[0]
        )
        self.transform = transform
        self._texts = self.table["questions"].to_pylist()
        self._answers = self.table["answers"].to_pylist()
        self.index_mapper = [
            (i, j) for i, qs in enumerate(self._texts) for j in range(len(qs))
        ]

    def __len__(self) -> int:
        return len(self.index_mapper)

    def _image(self, row: int, key: str) -> np.ndarray:
        from PIL import Image

        data = self.table[key][row].as_py()
        with Image.open(io.BytesIO(data)) as img:
            return self.transform(img)

    def __getitem__(self, raw_index: int) -> Dict[str, Any]:
        i, j = self.index_mapper[raw_index]
        return {
            "pixels0": self._image(i, "image_0")[None],
            "pixels1": self._image(i, "image_1")[None],
            "sentence": self._texts[i][j],
            "question": self._texts[i][j],
            "label": int(self._answers[i][j] == "True"),
        }


# registry: dataset key -> class (the reference's datamodule `dataset_cls`
# bindings, vlmo/datamodules/*.py)
PRETRAIN_DATASETS = {
    "coco": CocoCaptionKarpathyDataset,
    "f30k": F30KCaptionKarpathyDataset,
    "gcc": ConceptualCaptionDataset,
    "sbu": SBUCaptionDataset,
    "vg": VisualGenomeCaptionDataset,
    "wikibk": WikibkDataset,
    "nlvr2": NLVR2Dataset,
}


def make_pretrain_dataset(
    name: str, dataset_root: str, transform: Callable, split: str = "train"
):
    return PRETRAIN_DATASETS[name](dataset_root, transform, split=split)


class ConcatDataset:
    """Multi-corpus concat (the reference's ``MTDataModule`` ConcatDataset)."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        d = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        return self.datasets[d][idx - int(self._offsets[d])]
