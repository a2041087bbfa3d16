"""pyarrow-backed datasets (the VLMo data path).

Reference: ``VLMO_VQAttack/vlmo/datasets/base_dataset.py`` — memory-mapped
``.arrow`` tables with an (image_index, caption_index) flattening
(``:72-82``), JPEG bytes decoded per item, fixed-length tokenization, and the
VQAv2 split tables ``vqav2_rest_val`` + ``vqav2_trainable_val`` for test
(``vqav2_dataset.py:24-26``) carrying ``{questions, answers, answer_labels,
answer_scores, question_id}`` columns.  Writer in ``data/arrow_writer.py``
reproduces the reference's ``make_arrow`` schema.
"""

from __future__ import annotations

import io
from typing import Any, Callable, Dict, List, Sequence

import numpy as np


def _open_table(path: str):
    import pyarrow as pa

    with pa.memory_map(path, "r") as source:
        return pa.ipc.RecordBatchFileReader(source).read_all()


class ArrowDataset:
    """Flattened (image, caption) view over arrow tables
    (``base_dataset.py:11-117``)."""

    def __init__(
        self,
        paths: Sequence[str],
        transform: Callable,
        text_column: str = "caption",
    ):
        import pyarrow as pa

        tables = [_open_table(p) for p in paths]
        self.table = pa.concat_tables(tables, promote_options="default") if len(tables) > 1 else tables[0]
        self.transform = transform
        self.text_column = text_column
        # index mapper: flatten per-image caption lists
        self.index_mapper: List[tuple] = []
        texts = self.table[text_column].to_pylist()
        for i, caps in enumerate(texts):
            caps = caps if isinstance(caps, list) else [caps]
            for j in range(len(caps)):
                self.index_mapper.append((i, j))
        self._texts = texts

    def __len__(self) -> int:
        return len(self.index_mapper)

    def get_image(self, raw_index: int) -> np.ndarray:
        from PIL import Image

        i, _ = self.index_mapper[raw_index]
        img_bytes = self.table["image"][i].as_py()
        with Image.open(io.BytesIO(img_bytes)) as img:
            return self.transform(img)

    def get_text(self, raw_index: int) -> str:
        i, j = self.index_mapper[raw_index]
        caps = self._texts[i]
        return caps[j] if isinstance(caps, list) else caps

    def iter_batches(self, indices=None, num_workers: int = 4, prefetch: int = 8):
        """Threaded prefetching iterator (same surface as VQADataset)."""
        from vqattack_tpu.data.iter_utils import threaded_iter

        yield from threaded_iter(self, indices, num_workers, prefetch)


class VQAv2ArrowDataset(ArrowDataset):
    """VQAv2 over arrow (``vqav2_dataset.py``): item carries the question,
    answer labels and soft scores, and the question id."""

    def __init__(self, paths: Sequence[str], transform: Callable):
        super().__init__(paths, transform, text_column="questions")
        self._answers = (
            self.table["answers"].to_pylist() if "answers" in self.table.column_names else None
        )
        self._labels = (
            self.table["answer_labels"].to_pylist()
            if "answer_labels" in self.table.column_names
            else None
        )
        self._scores = (
            self.table["answer_scores"].to_pylist()
            if "answer_scores" in self.table.column_names
            else None
        )
        self._qids = (
            self.table["question_id"].to_pylist()
            if "question_id" in self.table.column_names
            else None
        )

    def __getitem__(self, raw_index: int) -> Dict[str, Any]:
        i, j = self.index_mapper[raw_index]
        item: Dict[str, Any] = {
            "pixels": self.get_image(raw_index)[None],
            "question": self.get_text(raw_index),
        }
        if self._qids is not None:
            q = self._qids[i]
            item["qid"] = q[j] if isinstance(q, list) else q
        if self._answers is not None:
            a = self._answers[i]
            item["answers"] = a[j] if a and isinstance(a[0], list) else a
        if self._labels is not None:
            l = self._labels[i]
            item["answer_labels"] = l[j] if l and isinstance(l[0], list) else l
        if self._scores is not None:
            s = self._scores[i]
            item["answer_scores"] = s[j] if s and isinstance(s[0], list) else s
        return item
