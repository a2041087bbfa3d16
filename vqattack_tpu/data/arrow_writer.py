"""VQAv2 json+jpeg -> arrow table writer (the reference's ``make_arrow``
pipelines, ``vlmo/utils/write_vqa.py`` + ``glossary.py`` normalization).

Schema per row: image bytes, questions (list per image), answers,
answer_labels (indices into the 3,129-answer vocabulary), answer_scores (the
official soft scores), question_id, split.
"""

from __future__ import annotations

import json
import os
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Sequence


def normalize_word(word: str) -> str:
    """Glossary answer normalization (``vlmo/utils/glossary.py:167-190``) =
    the official VQA rules: punctuation rules (digit-aware period/comma
    handling), number words -> digits, article removal, contraction
    restoration — delegated to :mod:`vqattack_tpu.eval.vqa_eval`, which
    implements the identical spec constants.  A simplified strip (no
    contractions, unconditional period removal) would build a DIFFERENT
    3,129-answer vocabulary ("dont know" vs "don't know", "1.5" vs "15")."""
    from vqattack_tpu.eval.vqa_eval import normalize_answer

    return normalize_answer(word)


def build_answer_vocab(
    annotations: Sequence[dict], vocab_size: int = 3129
) -> List[str]:
    """Most frequent normalized answers (the reference's 3,129-label space)."""
    counts: Counter = Counter()
    for ann in annotations:
        for a in ann.get("answers", []):
            counts[normalize_word(a.get("answer", a) if isinstance(a, dict) else a)] += 1
    return [w for w, _ in counts.most_common(vocab_size)]


def soft_score(count: int) -> float:
    """Official VQA soft score: min(1, count/3) (``vqaEval.py:100`` family)."""
    return min(1.0, count / 3.0)


def write_vqa_arrow(
    questions_json: str,
    annotations_json: Optional[str],
    image_root: str,
    out_path: str,
    answer_vocab: Optional[List[str]] = None,
    split: str = "val",
) -> List[str]:
    """Build the arrow table.  Returns the answer vocabulary used."""
    import pyarrow as pa

    with open(questions_json) as f:
        questions = json.load(f)["questions"]
    anns_by_qid: Dict[int, dict] = {}
    if annotations_json:
        with open(annotations_json) as f:
            for ann in json.load(f)["annotations"]:
                anns_by_qid[ann["question_id"]] = ann
    if answer_vocab is None and anns_by_qid:
        answer_vocab = build_answer_vocab(list(anns_by_qid.values()))
    vocab_index = {a: i for i, a in enumerate(answer_vocab or [])}

    by_image: Dict[str, dict] = defaultdict(
        lambda: {"questions": [], "answers": [], "answer_labels": [],
                 "answer_scores": [], "question_id": []}
    )
    for q in questions:
        img_name = f"COCO_{split}2014_{q['image_id']:012d}.jpg"
        row = by_image[img_name]
        row["questions"].append(q["question"])
        row["question_id"].append(q["question_id"])
        ann = anns_by_qid.get(q["question_id"])
        if ann:
            counts = Counter(normalize_word(a["answer"]) for a in ann["answers"])
            labels, scores, answers = [], [], []
            for a, c in counts.items():
                if a in vocab_index:
                    labels.append(vocab_index[a])
                    scores.append(soft_score(c))
                    answers.append(a)
            row["answers"].append(answers)
            row["answer_labels"].append(labels)
            row["answer_scores"].append(scores)
        else:
            row["answers"].append([])
            row["answer_labels"].append([])
            row["answer_scores"].append([])

    rows = []
    for img_name, row in by_image.items():
        path = os.path.join(image_root, img_name)
        if not os.path.exists(path):
            continue
        with open(path, "rb") as f:
            img_bytes = f.read()
        rows.append(
            {
                "image": img_bytes,
                "questions": row["questions"],
                "answers": row["answers"],
                "answer_labels": row["answer_labels"],
                "answer_scores": row["answer_scores"],
                "question_id": row["question_id"],
                "split": split,
            }
        )
    table = pa.Table.from_pylist(rows)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with pa.OSFile(out_path, "wb") as sink:
        with pa.RecordBatchFileWriter(sink, table.schema) as writer:
            writer.write_table(table)
    return answer_vocab or []
