"""Generate synthetic assets for driving the production CLI end-to-end.

Creates the full flag surface of ``python -m vqattack_tpu.run`` (see
``docs/REPRODUCE.md``) with no real checkpoints or datasets: a 30,522-line
vocab with the HF special-token positions, a 480px jpeg, a VQA annotation
json, and the five side-table families.  Weights stay random (``run.py``
initializes when no ``--surrogate-ckpt`` is given) — this exercises every
code path at real geometry, which is what on-TPU verification needs.

Usage: ``python scripts/make_synth_assets.py [outdir] [n_samples]
[--realistic]`` (default ``/tmp/vqa_synth_assets``, 2 samples); prints the
ready-to-paste CLI invocation.  ``n_samples > 2`` cycles question templates
with varying substitutable-word counts, so a batched sweep over them
exercises the lockstep bucketing across distinct block schedules
(attacks/batched.py).  ``--realistic`` draws questions from a VQAv2-like
length / substitutable-k / paraphrase-count distribution instead — the
steady-state-sweep measurement input (PERF.md round 3).
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


def realistic_samples(n: int, seed: int = 0):
    """Samples with a VQAv2-like question-length / substitutable-k /
    paraphrase-count distribution (VERDICT r2 Next #4).

    Length histogram approximates the VQAv2 val questions the vendored side
    tables index (mean ~6.2 words, 4-12 range); the substitutable word count
    k (words NOT in the vendored filter list — the quantity that drives the
    text-attack block schedule, ``compute_iter_schedule``) follows the
    1-5 spread real questions produce; paraphrase lists carry 2-4 entries
    like the reference's paraphrase tables."""
    import numpy as np

    rng = np.random.default_rng(seed)
    lengths = [4, 5, 6, 7, 8, 9, 10, 12]
    length_p = [0.08, 0.24, 0.26, 0.18, 0.11, 0.07, 0.04, 0.02]
    # content words (substitutable: not in the vendored filter list)
    content = ["dog", "cat", "man", "woman", "person", "red", "blue",
               "green", "yellow", "white", "black", "frisbee", "ball",
               "hat", "shirt", "table", "grass", "street", "room",
               "wearing", "holding", "playing", "running", "sitting",
               "standing"]
    # filler words (filtered: stopwords/question words — contribute length
    # but not substitution slots)
    fillers = ["what", "is", "the", "a", "on", "in", "of", "and", "are",
               "it", "this", "that", "there", "how", "many"]
    answer_vocab = ["red", "blue", "green", "frisbee", "ball", "dog", "cat",
                    "hat", "two", "yes"]
    out = []
    for i in range(n):
        L = int(rng.choice(lengths, p=length_p))
        k = int(np.clip(1 + rng.poisson(1.2), 1, min(5, L - 2)))
        words = ["what"]
        body = list(rng.choice(content, size=k, replace=False))
        while len(words) + len(body) < L:
            words.append(str(rng.choice(fillers)))
        rest = words[1:] + body
        rng.shuffle(rest)
        q = " ".join(["what"] + rest)[: 25 * 6]
        ans = answer_vocab[i % len(answer_vocab)]
        paras = [ans, f"the answer is {ans}"]
        for _ in range(int(rng.integers(0, 3))):
            paras.append(f"{ans} " + " ".join(
                rng.choice(content, size=2, replace=False)))
        out.append((2000 + i, q, ans, paras))
    return out


def main(outdir: str, n_samples: int = 2, realistic: bool = False) -> None:
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
    if realistic:
        samples = [(qid, q, ans, paras[1])
                   for qid, q, ans, paras in realistic_samples(n_samples)]
        para_lists = {str(s[0]): p[3] for s, p in
                      zip(samples, realistic_samples(n_samples))}
    else:
        para_lists = None
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
    j("para.json", para_lists if para_lists is not None
      else {str(qid): [ans, para] for qid, _, ans, para in samples})
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
    argv = [a for a in sys.argv[1:] if a != "--realistic"]
    main(
        argv[0] if argv else "/tmp/vqa_synth_assets",
        int(argv[1]) if len(argv) > 1 else 2,
        realistic="--realistic" in sys.argv,
    )
