"""Offline black-box transfer evaluation over stored adversarial artifacts.

The reference persists per-qid adversarial images + a text JSON and runs
true black-box transfer (to ViLT/BLIP/etc.) offline from those artifacts
(SURVEY §0.3).  This driver replays a stored attack directory against any
victim this framework can load::

    python -m vqattack_tpu.transfer_eval --pipeline albef \
        --artifacts attack_out --vocab vocab.txt \
        --victim-ckpt albef_vqa.pth --answer-list answers.json \
        --surrogate-ans albef_ans_table.txt

Reports the flip rate (attack_accuracy) and, when ground-truth answers are
supplied, the official VQA soft accuracy of the victim on the adversarial
pairs.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="offline transfer eval")
    p.add_argument("--pipeline", choices=["albef", "vlmo"], default="albef")
    p.add_argument("--artifacts", required=True, help="attack output dir")
    p.add_argument("--txt-json", default=None, help="adv text dict (default: <artifacts>/adv_txt_dict.json)")
    p.add_argument("--config", default=None)
    p.add_argument("--vocab", required=True)
    p.add_argument("--victim-ckpt", default=None)
    p.add_argument("--answer-list", default=None)
    p.add_argument("--id2answer", default=None)
    p.add_argument("--surrogate-ans", nargs="*", default=[],
                   help="clean answers to measure flips against")
    p.add_argument("--gt-answers", default=None,
                   help="json {qid: [human answers]} for soft accuracy")
    p.add_argument("--answer-max-len", type=int, default=16)
    p.add_argument("--limit", type=int, default=None)
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    from vqattack_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from vqattack_tpu import config as cfg_mod
    from vqattack_tpu.eval.metrics import AttackAccuracy
    from vqattack_tpu.eval.vqa_eval import VQAEval
    from vqattack_tpu.run import _build_pipeline
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer

    cfg = cfg_mod.load_config(args.config) if args.config else cfg_mod.albef_attack_config()
    tokenizer = WordPieceTokenizer.from_file(args.vocab)

    class _Args:  # reuse the run.py pipeline builder surface
        pipeline = args.pipeline
        surrogate_ckpt = None
        victim_ckpt = args.victim_ckpt
        bert_mlm = None
        use_path = None
        id2answer = args.id2answer

    pipeline = _build_pipeline(_Args, cfg, tokenizer, use_pallas=False)

    txt_path = args.txt_json or os.path.join(args.artifacts, "adv_txt_dict.json")
    adv_texts = {}
    if os.path.exists(txt_path):
        with open(txt_path) as f:
            adv_texts = json.load(f)

    clean_answers = {}
    for path in args.surrogate_ans:
        with open(path) as f:
            clean_answers.update(json.load(f))
    gt = {}
    if args.gt_answers:
        with open(args.gt_answers) as f:
            gt = json.load(f)

    answer_ids = answer_mask = None
    answer_list = []
    if args.pipeline == "albef":
        if not args.answer_list:
            raise SystemExit(
                "--answer-list is required for --pipeline albef (the ALBEF "
                "victim ranks a fixed candidate-answer list)"
            )
        with open(args.answer_list) as f:
            answer_list = json.load(f)
        ids, mask = tokenizer.encode_batch(
            [a + "[SEP]" for a in answer_list], max_length=args.answer_max_len
        )
        answer_ids, answer_mask = jnp.asarray(ids), jnp.asarray(mask)

    flip = AttackAccuracy()
    vqa = VQAEval()
    files = sorted(glob.glob(os.path.join(args.artifacts, "*.npy")))
    if args.limit:
        files = files[: args.limit]
    # batched replay: one victim decode per 16-artifact chunk instead of a
    # batch-1 forward per pair
    for start in range(0, len(files), 16):
        chunk = files[start : start + 16]
        qids = [os.path.splitext(os.path.basename(p))[0] for p in chunk]
        images = [np.load(p) for p in chunk]
        texts = [adv_texts.get(q, "") for q in qids]
        if args.pipeline == "albef":
            topk_ids, _ = pipeline.evaluate_victim_batch(
                images, texts, answer_ids, answer_mask
            )
            preds = [answer_list[int(row[0])] for row in np.asarray(topk_ids)]
        else:
            preds = [a for _, a in pipeline.evaluate_victim_batch(images, texts)]
        for qid, pred in zip(qids, preds):
            clean = clean_answers.get(qid)
            if clean is not None:
                flip.update(pred, clean)
            if qid in gt:
                vqa.update(qid, pred, gt[qid])

    out = {
        "samples": len(files),
        "attack_accuracy": flip.value if flip.flips else None,
        "vqa_soft_accuracy": vqa.accuracy if vqa.accuracies else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
