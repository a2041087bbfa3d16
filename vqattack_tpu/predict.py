"""Inference/serving CLI — the reference's Replicate ``predict.py`` surface:
answer a question about an image with a fine-tuned victim::

    python -m vqattack_tpu.predict --pipeline albef \
        --image img.jpg --question "what color is the dog" \
        --vocab vocab.txt --victim-ckpt albef_vqa.pth \
        --answer-list answer_list.json [--topk 5]

Batched serving goes through :class:`Predictor` (jitted once; feed NHWC
uint8 or normalized float batches).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional, Sequence, Tuple


class Predictor:
    """Resident-victim VQA answering (ALBEF rank_answer or VLMo classifier)."""

    def __init__(self, pipeline, answer_list: Sequence[str] = (),
                 answer_ids=None, answer_mask=None):
        self.pipeline = pipeline
        self.answer_list = list(answer_list)
        self.answer_ids = answer_ids
        self.answer_mask = answer_mask

    def answer(self, pixels, question: str, topk: int = 5) -> List[Tuple[str, float]]:
        import numpy as np

        if self.answer_ids is not None:  # ALBEF two-pass ranking
            topk_ids, topk_probs = self.pipeline.evaluate_victim(
                pixels, question, self.answer_ids, self.answer_mask
            )
            ids = np.asarray(topk_ids)[0][:topk]
            probs = np.asarray(topk_probs)[0][:topk]
            return [(self.answer_list[int(i)], float(p)) for i, p in zip(ids, probs)]
        # VLMo classifier
        import jax
        import jax.numpy as jnp

        ids, mask = self.pipeline.encode(question)
        logits = self.pipeline._vqa_logits(
            self.pipeline.victim_params, jnp.asarray(pixels), ids, mask
        )
        probs = np.asarray(jax.nn.softmax(logits, -1))[0]
        order = np.argsort(-probs)[:topk]
        return [
            (self.pipeline.id2answer.get(int(i), str(int(i))), float(probs[i]))
            for i in order
        ]


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="VQA inference")
    p.add_argument("--pipeline", choices=["albef", "vlmo"], default="albef")
    p.add_argument("--image", required=True)
    p.add_argument("--question", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--victim-ckpt", default=None)
    p.add_argument("--answer-list", default=None)
    p.add_argument("--id2answer", default=None)
    p.add_argument("--answer-max-len", type=int, default=16)
    p.add_argument("--topk", type=int, default=5)
    return p


def main(argv: Optional[list] = None) -> None:
    args = build_argparser().parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    import jax.numpy as jnp
    from PIL import Image

    from vqattack_tpu import config as cfg_mod
    from vqattack_tpu.data.transforms import test_transform
    from vqattack_tpu.run import _build_pipeline
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer
    from vqattack_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = cfg_mod.load_config(args.config) if args.config else cfg_mod.albef_attack_config()
    tokenizer = WordPieceTokenizer.from_file(args.vocab)

    class _Args:
        pipeline = args.pipeline
        surrogate_ckpt = None
        victim_ckpt = args.victim_ckpt
        bert_mlm = None
        use_path = None
        id2answer = args.id2answer

    pipeline = _build_pipeline(_Args, cfg, tokenizer, use_pallas=False)

    answer_list: List[str] = []
    answer_ids = answer_mask = None
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

    with Image.open(args.image) as img:
        pixels = test_transform(cfg.data.image_size)(img)[None]

    predictor = Predictor(pipeline, answer_list, answer_ids, answer_mask)
    # normalize exactly like the batch-eval dataset path so serving and
    # sweep answers agree for the same raw question (dataset/utils.py:3-16)
    from vqattack_tpu.data.vqa import pre_question

    question = pre_question(args.question)
    out = predictor.answer(pixels, question, args.topk)
    print(json.dumps({"question": question, "answers": out}))


if __name__ == "__main__":
    main()
