"""Generate synthetic assets for driving the production CLI end-to-end.

Creates the full flag surface of ``python -m vqattack_tpu.run`` (see
``docs/REPRODUCE.md``) with no real checkpoints or datasets: a 30,522-line
vocab with the HF special-token positions, a 480px jpeg, a VQA annotation
json, and the five side-table families.  Weights stay random (``run.py``
initializes when no ``--surrogate-ckpt`` is given) — this exercises every
code path at real geometry, which is what on-TPU verification needs.

Usage: ``python scripts/make_synth_assets.py [outdir] [n_samples]``
(default ``/tmp/vqa_synth_assets``, 2 samples); prints the ready-to-paste
CLI invocation.  ``n_samples > 2`` cycles question templates with varying
substitutable-word counts, so a batched sweep over them exercises the
lockstep bucketing across distinct block schedules (attacks/batched.py).
"""

from __future__ import annotations

import json
import os
import sys


WORDS = [
    "what", "color", "is", "the", "a", "dog", "cat", "man", "woman", "person",
    "red", "blue", "green", "yellow", "white", "black", "frisbee", "ball",
    "hat", "shirt", "wearing", "holding", "playing", "running", "sitting",
    "standing", "table", "grass", "street", "room", "many", "how", "two",
    "three", "there", "this", "that", "on", "in", "of", "and", "are", "it",
]


def make_vocab(path: str) -> None:
    """30,522 tokens with HF bert-base-uncased special positions:
    [PAD]=0, [unused*]=1..99, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103."""
    toks = ["[PAD]"]
    toks += [f"[unused{i}]" for i in range(99)]
    toks += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    toks += WORDS
    toks += ["##" + w for w in WORDS]
    while len(toks) < 30522:
        toks.append(f"tok{len(toks)}")
    with open(path, "w") as f:
        f.write("\n".join(toks[:30522]) + "\n")


def make_image(path: str, size: int = 640) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr, "RGB").save(path, quality=90)


def main(outdir: str, n_samples: int = 2) -> None:
    os.makedirs(outdir, exist_ok=True)
    j = lambda name, obj: json.dump(  # noqa: E731
        obj, open(os.path.join(outdir, name), "w")
    )
    make_vocab(os.path.join(outdir, "vocab.txt"))
    make_image(os.path.join(outdir, "img0.jpg"))

    samples = [
        # (qid, question, surrogate answer, paraphrase)
        (1001, "what color is the dog", "red", "the dog is red"),
        (1002, "what is the man holding", "frisbee", "the man is holding a frisbee"),
    ]
    # extra samples cycle templates with different substitutable-word counts
    # (different k -> different block schedules -> distinct sweep buckets)
    templates = [
        ("what color is the cat", "blue", "the cat is blue"),
        ("what is the woman wearing", "hat", "the woman is wearing a hat"),
        ("how many dog are there", "two", "there are two dog"),
        ("what is the person playing", "ball", "the person is playing ball"),
        ("what color is the shirt the man is wearing", "green",
         "the shirt the man is wearing is green"),
        ("is the cat sitting on the table", "yes", "the cat is sitting on the table"),
    ]
    for i in range(max(0, n_samples - len(samples))):
        q, ans, para = templates[i % len(templates)]
        samples.append((1003 + i, q, ans, para))
    samples = samples[:max(1, n_samples)]
    ann = [
        # ground-truth answers included: the CLI's alignment guard
        # (adv_attack.py:416-427) requires the stored surrogate answer to be
        # a max-weight ground-truth answer before attacking
        {"image": "img0.jpg", "question": q, "question_id": qid,
         "answer": [ans] * 10}
        for qid, q, ans, _ in samples
    ]
    j("ann.json", ann)
    answer_vocab = ["red", "blue", "green", "frisbee", "ball", "dog", "cat",
                    "hat", "two", "yes"]
    j("answers.json", answer_vocab)
    with open(os.path.join(outdir, "right.txt"), "w") as f:
        f.write("\n".join(str(qid) for qid, *_ in samples) + "\n")
    j("sur.json", {str(qid): ans for qid, _, ans, _ in samples})
    j("tgt.json", {str(qid): ans for qid, _, ans, _ in samples})
    j("para.json", {str(qid): [ans, para] for qid, _, ans, para in samples})
    j("allc.json", {str(qid): [ans] for qid, _, ans, _ in samples})

    # ---- VLMo pipeline assets: pyarrow table + id2answer -----------------
    try:
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from vqattack_tpu.data.arrow_writer import write_vqa_arrow

        img_dir = os.path.join(outdir, "val2014")
        os.makedirs(img_dir, exist_ok=True)
        for qid, *_ in samples:
            dst = os.path.join(img_dir, f"COCO_val2014_{qid:012d}.jpg")
            if not os.path.exists(dst):
                make_image(dst)
        j("vqa_q.json", {"questions": [
            {"question": q, "question_id": qid, "image_id": qid}
            for qid, q, _, _ in samples
        ]})
        j("vqa_a.json", {"annotations": [
            {"question_id": qid, "answers": [{"answer": ans}] * 10}
            for qid, _, ans, _ in samples
        ]})
        write_vqa_arrow(
            os.path.join(outdir, "vqa_q.json"), os.path.join(outdir, "vqa_a.json"),
            img_dir, os.path.join(outdir, "vqa.arrow"),
        )
        # label index -> answer string (objectives.py:818-820's id2answer)
        j("id2answer.json", {str(i): a for i, a in enumerate(answer_vocab)})
    except ImportError as e:
        print(f"skipped VLMo arrow assets ({e})")

    print(
        f"python -m vqattack_tpu.run --pipeline albef --vocab {outdir}/vocab.txt "
        f"--ann {outdir}/ann.json --image-root {outdir} "
        f"--answer-list {outdir}/answers.json --right-part {outdir}/right.txt "
        f"--surrogate-ans {outdir}/sur.json --target-ans {outdir}/tgt.json "
        f"--paraphrases {outdir}/para.json --all-correct {outdir}/allc.json "
        f"--output {outdir}/out --limit 1"
    )
    print(
        f"python -m vqattack_tpu.run --pipeline vlmo --vocab {outdir}/vocab.txt "
        f"--arrow {outdir}/vqa.arrow --id2answer {outdir}/id2answer.json "
        f"--right-part {outdir}/right.txt --surrogate-ans {outdir}/sur.json "
        f"--target-ans {outdir}/tgt.json --paraphrases {outdir}/para.json "
        f"--all-correct {outdir}/allc.json --output {outdir}/out_vlmo --limit 1"
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/vqa_synth_assets",
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
    )
