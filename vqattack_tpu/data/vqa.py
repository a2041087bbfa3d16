"""VQAv2 dataset over JSON annotations + JPEGs (the ALBEF data path).

Reference: ``ALBEF_attack/dataset/vqa_dataset.py`` — per-item dict
``{image, question, question_id, answer[], weight[]}``; BOTH splits carry
answer-frequency weights (1/len(answers) per occurrence,
``vqa_dataset.py:44-66``) — the attack uses the test split's
answers/weights for its per-sample alignment guard
(``adv_attack.py:416-427``); train answers get the ``'[SEP]'`` eos
appended (``vqa_dataset.py:89``), test answers do not; question text
normalized by ``pre_question`` (``dataset/utils.py:3-16``).

This loader is framework-free (numpy out) and exposes a simple batched
iterator with background threads standing in for torch DataLoader workers.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence


def pre_question(question: str, max_words: int = 50) -> str:
    """Lowercase, strip the reference's exact punctuation set (including
    comma, apostrophe and question mark), map ``-``/``/`` to spaces, cap
    word count (``dataset/utils.py:3-16`` verbatim semantics — the side
    tables are keyed to predictions on THIS normalization)."""
    q = re.sub(r"([,.'!?\"()*#:;~])", "", question.lower())
    q = q.replace("-", " ").replace("/", " ")
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
        self._img_ids: Dict[str, int] = {}
        import threading

        self._img_ids_lock = threading.Lock()

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

    # string-label dialects of the reference task annotations:
    # ve_dataset.py:14 maps SNLI-VE entailment labels; nlvr_dataset.py:35-38
    # maps 'True'/'False'
    _STR_LABELS = {"entailment": 2, "neutral": 1, "contradiction": 0,
                   "True": 1, "False": 0}

    def _load_pixels(self, name: str):
        from PIL import Image

        path = os.path.join(self.image_root, name)
        if "." not in os.path.basename(name):
            path += ".jpg"  # ve_dataset.py:24 appends the extension
        with Image.open(path) as img:
            return self.transform(img)[None]  # [1, H, W, 3]

    def _get_item(self, idx: int) -> Dict[str, Any]:
        ann = self.ann[idx]

        # text field across the reference's annotation dialects: VQA
        # 'question', VE/NLVR 'sentence', grounding 'text', caption 'caption'
        text = ann.get("question")
        if text is None:
            text = ann.get("sentence", ann.get("text", ann.get("caption", "")))
        if isinstance(text, list):  # caption jsons may carry several
            text = text[0] if text else ""
        item: Dict[str, Any] = {
            "question": pre_question(text, self.max_ques_words),
            "qid": ann.get("question_id"),
        }
        if "images" in ann:  # NLVR paired streams (nlvr_dataset.py:25-31)
            item["pixels0"] = self._load_pixels(ann["images"][0])
            item["pixels1"] = self._load_pixels(ann["images"][1])
            item["pixels"] = item["pixels0"]
        else:
            item["pixels"] = self._load_pixels(ann["image"])
            # image-identity index: retrieval/grounding training treats
            # same-image samples as positives (grounding_dataset.py:17-24)
            img_id = str(ann["image"]).split("/")[-1]
            # iter_batches runs __getitem__ on worker threads; the
            # read-modify-write on the identity table must be atomic or two
            # distinct images can share one index (false ITA positives)
            with self._img_ids_lock:
                item["img_idx"] = self._img_ids.setdefault(
                    img_id, len(self._img_ids)
                )
        # task annotations pass through (VE/NLVR labels, VLMo soft targets)
        for key in ("label", "answer_labels", "answer_scores", "sentence",
                    "ref_id"):
            if key in ann:
                item[key] = ann[key]
        if isinstance(item.get("label"), str):
            item["label"] = self._STR_LABELS.get(item["label"], 0)
        # answer-frequency weights, BOTH splits (vqa_dataset.py:44-66):
        # each occurrence adds 1/len(answers) so a question's weights sum
        # to 1 — the attack's alignment guard compares against max(weight)
        # and the VQA train loss scales by these weights
        raw = ann.get("answer", [])
        answers: List[str] = []
        weights: List[float] = []
        for a in raw:
            if a in answers:
                weights[answers.index(a)] += 1 / len(raw)
            else:
                answers.append(a)
                weights.append(1 / len(raw))
        if self.split == "test":
            # test answers carry no eos (vqa_dataset.py:64-67)
            if answers:
                item["answers"] = answers
                item["weights"] = weights
            return item
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
