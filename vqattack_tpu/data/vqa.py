"""VQAv2 dataset over JSON annotations + JPEGs (the ALBEF data path).

Reference: ``ALBEF_attack/dataset/vqa_dataset.py`` — per-item dict
``{image, question, question_id, answer[], weight[]}`` where test items carry
the question id and train items carry answer-frequency weights (1/3 per
occurrence, ``vqa_dataset.py:55-66``); question text normalized by
``pre_question`` (``dataset/utils.py:3-16``); answer list loaded from
``answer_list.json`` with the ``'[SEP]'`` eos appended at tokenization time
(``adv_attack.py:396``).

This loader is framework-free (numpy out) and exposes a simple batched
iterator with background threads standing in for torch DataLoader workers.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence


def pre_question(question: str, max_words: int = 50) -> str:
    """Lowercase, strip punctuation/underscores, collapse whitespace, cap
    word count (``dataset/utils.py:3-16``)."""
    q = re.sub(r"([.!\"()*#:;~])", "", question.lower())
    q = q.rstrip(" ")
    words = q.split(" ")
    if len(words) > max_words:
        q = " ".join(words[:max_words])
    return q


class VQADataset:
    def __init__(
        self,
        ann_files: Sequence[str],
        image_root: str,
        transform: Callable,
        split: str = "test",
        answer_list: Optional[str] = None,
        max_ques_words: int = 30,
    ):
        self.ann: List[dict] = []
        for f in ann_files:
            with open(f) as fh:
                self.ann.extend(json.load(fh))
        self.image_root = image_root
        self.transform = transform
        self.split = split
        self.max_ques_words = max_ques_words
        self.answer_list: List[str] = []
        if answer_list:
            with open(answer_list) as fh:
                self.answer_list = json.load(fh)

    def __len__(self) -> int:
        return len(self.ann)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        """Failure-tolerant read: corrupt/missing images retry with a random
        resample (reference ``base_dataset.get_suite``, ``:149-168``)."""
        import random as _random

        for attempt in range(8):
            try:
                return self._get_item(idx)
            except (OSError, KeyError, ValueError) as e:
                if attempt == 7:
                    raise
                idx = _random.Random(idx + attempt).randrange(len(self))
        raise RuntimeError("unreachable")

    def _get_item(self, idx: int) -> Dict[str, Any]:
        ann = self.ann[idx]
        from PIL import Image

        path = os.path.join(self.image_root, ann["image"])
        with Image.open(path) as img:
            pixels = self.transform(img)

        item: Dict[str, Any] = {
            "pixels": pixels[None],  # [1, H, W, 3]
            "question": pre_question(ann["question"], self.max_ques_words),
            "qid": ann.get("question_id"),
        }
        # task annotations pass through (VE/NLVR labels, VLMo soft targets)
        for key in ("label", "answer_labels", "answer_scores", "sentence"):
            if key in ann:
                item[key] = ann[key]
        if self.split == "test":
            return item
        # train: answer-frequency weights (vqa_dataset.py:55-66)
        answers: List[str] = []
        weights: List[float] = []
        for a in ann.get("answer", []):
            if a in answers:
                weights[answers.index(a)] += 1 / 3
            else:
                answers.append(a)
                weights.append(1 / 3)
        item["answers"] = [a + "[SEP]" for a in answers]
        item["weights"] = weights
        return item

    def iter_batches(
        self, indices: Optional[Sequence[int]] = None, num_workers: int = 4,
        prefetch: int = 8,
    ) -> Iterator[Dict[str, Any]]:
        """Threaded prefetching iterator (stands in for DataLoader workers)."""
        from vqattack_tpu.data.iter_utils import threaded_iter

        yield from threaded_iter(self, indices, num_workers, prefetch)
