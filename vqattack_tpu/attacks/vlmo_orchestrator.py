"""The VLMo attack orchestrator (the reference's ``VLMo.test_step``,
``vlmo_module.py:1725-2093``).

Differences from the ALBEF pipeline:

- text is fixed-length (``max_text_len=40``) — everything is already
  static-shape in the reference, a perfect fit for jit;
- clean targets are (per-layer cls stack, masked token-feature stack)
  (``Gen_ori_feats``, ``vlmo_module.py:1287-1312``);
- the victim is the resident VQA-classifier head over the same trunk with
  *victim* params (``vqa_test_step_after_pgd``, ``objectives.py:812-829``) —
  the reference's surrogate<->victim full-model-reload churn every 10 samples
  (``reload_pretrain``/``reload_vqa``) becomes two persistent param trees;
- the MLM answer-recovery probe decodes argmax tokens at the masked
  paraphrase positions between blocks (``vlmo_module.py:2036-2051``).
"""

from __future__ import annotations

import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.attacks import vlmo as vlmo_losses
from vqattack_tpu.attacks.mar_labels import MarLabels, build_mar_labels
from vqattack_tpu.attacks.orchestrator import AttackResult, pad_eval_batch
from vqattack_tpu.attacks.pgd import (
    pgd_alternating,
    pgd_alternating_block,
    pgd_alternating_dynamic,
    pgd_feature,
    pgd_feature_block,
    pgd_feature_dynamic,
    pgd_vl_step,
)
from vqattack_tpu.attacks.text_attack import (
    apply_substitutions_to_paraphrase,
    generate_candidates,
    select_substitutions,
)
from vqattack_tpu.config import RunConfig
from vqattack_tpu.models.vlmo import VLMo
from vqattack_tpu.text.similarity import SimilarityGate, pad_to_bucket
from vqattack_tpu.text.tokenizer import WordPieceTokenizer


class VlmoAttackPipeline:
    def __init__(
        self,
        cfg: RunConfig,
        model: VLMo,
        surrogate_params: Any,
        victim_params: Any,
        tokenizer: WordPieceTokenizer,
        gate: SimilarityGate,
        mlm_model: Any = None,         # candidate-generation BERT MLM
        mlm_params: Any = None,
        id2answer: Optional[Dict[int, str]] = None,
        filter_words: Optional[frozenset] = None,
        # opt-in: measured slower than XLA's fused update (PERF.md profile)
        use_pallas: bool = False,
    ):
        self.cfg = cfg
        self.model = model
        self.surrogate_params = surrogate_params
        self.victim_params = victim_params
        self.tokenizer = tokenizer
        self.gate = gate
        self.mlm_model = mlm_model
        self.mlm_params = mlm_params
        self.id2answer = id2answer or {}
        if filter_words is None:
            from vqattack_tpu.text.filter_words import default_filter_words

            filter_words = default_filter_words()
        self.filter_words = filter_words
        self.use_pallas = use_pallas

        self._attack_feats = jax.jit(
            lambda v, px, ids, m: model.apply(v, px, ids, m, method=VLMo.attack_feats)
        )
        self._attack_mlm = jax.jit(
            lambda v, px, ids, m: model.apply(v, px, ids, m, method=VLMo.attack_mlm)
        )
        self._embed_text = jax.jit(
            lambda v, ids: model.apply(v, ids, method=VLMo.embed_text)
        )
        self._vqa_logits = jax.jit(
            lambda v, px, ids, m: model.apply(v, px, ids, m, method=VLMo.vqa_logits)
        )
        if mlm_model is not None:
            self._cand_mlm_logits = jax.jit(
                lambda v, ids, mask: mlm_model.apply(v, ids, mask, mode="text")[2]
            )
            # device-side top-k (see AlbefAttackPipeline): [B,S,K] transfers
            # instead of the full-vocab logits
            k = cfg.attack.mlm_top_k
            self._cand_mlm_topk = jax.jit(
                lambda v, ids, mask: jax.lax.top_k(
                    mlm_model.apply(v, ids, mask, mode="text")[2], k
                )
            )
        # rel-pos biases are parameter-only: gather them ONCE instead of per
        # PGD iteration (models/vlmo.py::precompute_joint_biases)
        self._rel_biases = jax.jit(
            lambda v: model.apply(v, method=VLMo.precompute_joint_biases)
        )(surrogate_params)
        self._feature_loss = vlmo_losses.make_feature_loss(model)
        self._mlm_loss = vlmo_losses.make_mlm_loss(model)
        self._vl_loss = vlmo_losses.make_vl_loss(model)

        # clean-targets as a pure fn for the fused first-block program
        # (pgd.py::pgd_feature_block); reads the original question ids from
        # aux["ori_ids"/"ori_mask"], mirrors clean_targets() exactly
        tap_bf16 = cfg.attack.tap_dtype == "bfloat16"

        def _targets_fn(ori_px, key, aux):
            del key  # VLMo clean targets are deterministic (no MLM masking)
            _, layer_cls, tokens, token_mask = model.apply(
                aux["variables"], ori_px, aux["ori_ids"], aux["ori_mask"],
                method=VLMo.attack_feats,
            )
            if tap_bf16:
                layer_cls = layer_cls.astype(jnp.bfloat16)
                tokens = tokens.astype(jnp.bfloat16)
            return {
                "tgt_layer_cls": layer_cls,
                "tgt_tokens": tokens,
                "tgt_token_mask": token_mask.astype(jnp.float32),
            }

        self._targets_fn = _targets_fn
        self._target_keys = ("tgt_layer_cls", "tgt_tokens", "tgt_token_mask")

    # ------------------------------------------------------------------ utils

    @property
    def max_text_len(self) -> int:
        return self.model.cfg.max_text_len

    def encode(self, text: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids, mask = self.tokenizer.encode(text, self.max_text_len)
        return jnp.asarray(ids[None]), jnp.asarray(mask[None])

    def candidate_mlm_logits(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        return np.asarray(
            self._cand_mlm_logits(self.mlm_params, jnp.asarray(ids), jnp.asarray(mask))
        )

    def candidate_mlm_topk(self, ids: np.ndarray, mask: np.ndarray):
        """(scores [B,S,K], ids [B,S,K]) with the top-k reduced ON device."""
        s, i = self._cand_mlm_topk(
            self.mlm_params, jnp.asarray(ids), jnp.asarray(mask)
        )
        return np.asarray(s), np.asarray(i)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        # power-of-two batch bucketing: candidate counts vary per sample, and
        # every distinct batch size is a fresh compile (text/similarity.py)
        padded, n = pad_to_bucket(texts)
        ids, _ = self.tokenizer.encode_batch(padded, self.max_text_len)
        return np.asarray(self._embed_text(self.surrogate_params, jnp.asarray(ids)))[:n]

    def clean_targets(self, pixels, text_ids, text_mask):
        """(tgt_layer_cls, tgt_tokens, tgt_token_mask) from the clean pair
        (``Gen_ori_feats``)."""
        _, layer_cls, tokens, token_mask = self._attack_feats(
            self.surrogate_params, pixels, text_ids, text_mask
        )
        if self.cfg.attack.tap_dtype == "bfloat16":
            # halve the per-iteration HBM read of the target stacks
            # (config.py tap_dtype); the mask stays f32
            layer_cls = layer_cls.astype(jnp.bfloat16)
            tokens = tokens.astype(jnp.bfloat16)
        return layer_cls, tokens, token_mask.astype(jnp.float32)

    # ---------------------------------------------------------------- attack

    def attack_sample(
        self,
        pixels: np.ndarray,
        question: str,
        qid: str,
        paraphrase: Optional[str],
        target_answer: Optional[str],
        all_correct_answers: Sequence[str] = (),
        rng: Optional[jax.Array] = None,
    ) -> AttackResult:
        atk = self.cfg.attack
        if rng is None:
            rng = jax.random.key(self.cfg.seed)
        qid_fold = int(qid) if str(qid).isdigit() else zlib.crc32(str(qid).encode())
        r_pgd = jax.random.fold_in(rng, qid_fold % (2 ** 31))

        ori_px = jnp.asarray(pixels)
        ori_text = question
        adv_text = question

        if paraphrase is not None and target_answer is not None:
            # VLMo dialect: every encoded paraphrase sentence ends with '.'
            # (vlmo_module.py:1756,1802,1867)
            mar = build_mar_labels(
                paraphrase, target_answer, all_correct_answers,
                self.tokenizer, self.max_text_len, atk.max_answers,
                sentence_suffix=".",
            )
        else:
            mar = MarLabels(1, None, None, None, [], [], [], 0)
        old_alg = mar.old_alg

        ori_ids, ori_mask = self.encode(question)
        fused = atk.dynamic_pgd and atk.fused_block
        if fused:
            # targets compute inside block 0's fused program (Next #3)
            tgt_layer_cls = tgt_tokens = tgt_token_mask = None
        else:
            tgt_layer_cls, tgt_tokens, tgt_token_mask = self.clean_targets(
                ori_px, ori_ids, ori_mask
            )
        ori_emb = np.asarray(self._embed_text(self.surrogate_params, ori_ids))[0]

        # VLMo dialect: the raw arrow question keeps its trailing '?'; the
        # reference tokenizes/substitutes on the stripped text
        # (vlmo_module.py:1539,1644,1923) — without the strip, a '?'-attached
        # final word spans 2 sub-tokens and silently loses substitutability
        cands = generate_candidates(
            question.strip("?"), self.tokenizer, self.candidate_mlm_logits,
            self.filter_words, total_iters=atk.num_iters,
            top_k=atk.mlm_top_k, score_threshold=atk.mlm_score_threshold,
            mlm_topk_fn=self.candidate_mlm_topk,
        )
        iter_list = cands.iter_list if cands.iter_list else [atk.num_iters]

        mar_words = list(mar.paraphrase_words)
        adv_px = ori_px
        feat_losses: List[np.ndarray] = []
        mlm_losses: List[np.ndarray] = []
        all_ops: List[Tuple[str, str]] = []
        first_block = True

        for block_idx, block_iters in enumerate(iter_list):
            ids, mask = self.encode(adv_text)
            aux = {
                "variables": self.surrogate_params,
                "text_ids": ids,
                "text_mask": mask,
                "rel_biases": self._rel_biases,
            }
            if fused and first_block:
                aux["ori_ids"] = ori_ids
                aux["ori_mask"] = ori_mask
            else:
                aux["tgt_layer_cls"] = tgt_layer_cls
                aux["tgt_tokens"] = tgt_tokens
                aux["tgt_token_mask"] = tgt_token_mask
            r_pgd, r_block = jax.random.split(r_pgd)
            rand_init = first_block and atk.rand_init
            # dynamic kernels clamp trips to max_iter on-device — enforce
            # the schedule invariant host-side (pgd.py hard contract; a
            # real exception so `python -O` keeps it)
            if block_iters > atk.num_iters:
                raise ValueError(
                    f"block_iters={block_iters} exceeds num_iters={atk.num_iters}"
                )

            is_last = (block_idx == len(iter_list) - 1
                       or not cands.attack_word_indices)
            tg = None
            if fused:
                ap = cands.attack_positions
                width = 1 << (max(len(ap), atk.max_sub_words, 1) - 1).bit_length()
                pos = np.zeros((1, width), np.int32)
                pos[0, : len(ap)] = ap
                r_pgd, r_vl = jax.random.split(r_pgd)
            if old_alg == 1:
                if fused:
                    adv_px, losses, tgf, tgts = pgd_feature_block(
                        self._feature_loss, self._vl_loss, self._embed_text,
                        self._targets_fn if first_block else None,
                        adv_px, ori_px, r_block, r_vl, r_block,
                        jnp.int32(block_iters), jnp.asarray(rand_init),
                        jnp.asarray(not is_last), jnp.asarray(pos), aux,
                        target_keys=self._target_keys,
                        eps=atk.eps, eps_iter=atk.step_size,
                        max_iter=atk.num_iters,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=self.use_pallas,
                    )
                    if first_block:
                        tgt_layer_cls, tgt_tokens, tgt_token_mask = tgts
                    if not is_last:
                        tg = np.asarray(tgf)[0][: len(ap)]
                elif atk.dynamic_pgd:
                    adv_px, losses = pgd_feature_dynamic(
                        self._feature_loss, adv_px, ori_px, r_block,
                        jnp.int32(block_iters), jnp.asarray(rand_init), aux,
                        eps=atk.eps, eps_iter=atk.step_size,
                        max_iter=atk.num_iters,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=self.use_pallas,
                    )
                else:
                    adv_px, losses = pgd_feature(
                        self._feature_loss, adv_px, ori_px, r_block, aux,
                        eps=atk.eps, eps_iter=atk.step_size, nb_iter=block_iters,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        rand_init=rand_init, use_pallas=self.use_pallas,
                        unroll=atk.scan_unroll,
                    )
                feat_losses.append(np.asarray(losses)[:block_iters, 0])
            else:
                cur_ids, cur_mask = self.tokenizer.encode(
                    " ".join(mar_words) + ".", self.max_text_len
                )
                aligned = int(cur_mask.sum()) == mar.true_len
                aux["mlm_ids"] = jnp.asarray(cur_ids[None])
                aux["mlm_mask"] = jnp.asarray(cur_mask[None])
                aux["mlm_labels"] = jnp.asarray(mar.labels[None])
                second_loss = self._mlm_loss if aligned else self._feature_loss
                if fused:
                    adv_px, fl, ml, tgf, tgts = pgd_alternating_block(
                        self._feature_loss, second_loss, self._vl_loss,
                        self._embed_text,
                        self._targets_fn if first_block else None,
                        adv_px, ori_px, r_block, r_vl, r_block,
                        jnp.int32(block_iters // 2), jnp.asarray(rand_init),
                        jnp.asarray(not is_last), jnp.asarray(pos), aux,
                        target_keys=self._target_keys,
                        eps=atk.eps, eps_iter=atk.step_size,
                        max_iter=atk.num_iters // 2,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=self.use_pallas,
                    )
                    if first_block:
                        tgt_layer_cls, tgt_tokens, tgt_token_mask = tgts
                    if not is_last:
                        tg = np.asarray(tgf)[0][: len(ap)]
                elif atk.dynamic_pgd:
                    adv_px, fl, ml = pgd_alternating_dynamic(
                        self._feature_loss, second_loss, adv_px, ori_px, r_block,
                        jnp.int32(block_iters // 2), jnp.asarray(rand_init), aux,
                        eps=atk.eps, eps_iter=atk.step_size,
                        max_iter=atk.num_iters // 2,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=self.use_pallas,
                    )
                else:
                    adv_px, fl, ml = pgd_alternating(
                        self._feature_loss, second_loss, adv_px, ori_px, r_block, aux,
                        eps=atk.eps, eps_iter=atk.step_size, nb_iter=block_iters // 2,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        rand_init=rand_init, use_pallas=self.use_pallas,
                        unroll=atk.scan_unroll,
                    )
                feat_losses.append(np.asarray(fl)[: block_iters // 2, 0])
                mlm_losses.append(np.asarray(ml)[: block_iters // 2, 0])
            first_block = False

            if is_last:
                break

            if not fused:
                adv_embeds = self._embed_text(self.surrogate_params, ids)
                positions = jnp.asarray([cands.attack_positions])
                r_pgd, r_vl = jax.random.split(r_pgd)
                adv_px, text_grad = pgd_vl_step(
                    self._vl_loss, adv_px, adv_embeds, ori_px, positions, r_vl,
                    aux, eps=atk.eps, eps_iter=atk.step_size,
                    clip_min=atk.clip_min, clip_max=atk.clip_max,
                    use_pallas=self.use_pallas,
                )
                tg = np.asarray(text_grad)[0]
            adv_text, ops = select_substitutions(
                adv_text, ori_text, tg, cands,
                ori_emb, self.embed_texts, self.gate.scores,
                sim_threshold=self.gate.operating_point(atk.sim_threshold),
                max_length=self.max_text_len,
                question_suffix="?",
            )
            all_ops.extend(ops)
            if old_alg == 0 and ops:
                mar_words = apply_substitutions_to_paraphrase(mar_words, ops)

        return AttackResult(
            qid=str(qid),
            adv_image=np.asarray(adv_px),
            adv_text=adv_text,
            old_alg=old_alg,
            feat_losses=np.concatenate(feat_losses) if feat_losses else np.zeros(0),
            mlm_losses=np.concatenate(mlm_losses) if mlm_losses else None,
            num_blocks=len(iter_list),
            substitutions=all_ops,
        )

    # ------------------------------------------------------------------ eval

    def recover_answer_probe(
        self, adv_px: jnp.ndarray, mar: MarLabels
    ) -> Optional[str]:
        """MLM answer-recovery diagnostic (``vlmo_module.py:2036-2051``):
        argmax-decode the masked paraphrase positions on the adversarial
        image."""
        if mar.old_alg == 1:
            return None
        ids = jnp.asarray(mar.mlm_ids[None])
        mask = jnp.asarray(mar.mlm_mask[None])
        logits, _, _, _ = self._attack_mlm(self.surrogate_params, adv_px, ids, mask)
        out_ids = np.asarray(mar.mlm_ids).copy()
        pos = np.where(out_ids == self.tokenizer.mask_token_id)[0]
        pred = np.asarray(jnp.argmax(logits[0], axis=-1))
        out_ids[pos] = pred[pos]
        return self.tokenizer.decode(out_ids[1:])

    def evaluate_victim(self, adv_image: np.ndarray, adv_text: str) -> Tuple[int, str]:
        """Black-box check on the resident victim params: 3,129-way classifier
        argmax -> id2answer (``vlmo_module.py:2063-2091``)."""
        ids, mask = self.encode(adv_text)
        logits = self._vqa_logits(self.victim_params, jnp.asarray(adv_image), ids, mask)
        pred = int(np.asarray(jnp.argmax(logits, axis=-1))[0])
        return pred, self.id2answer.get(pred, str(pred))

    def evaluate_victim_batch(
        self,
        adv_images: Sequence[np.ndarray],      # N x [1, H, W, 3]
        adv_texts: Sequence[str],
    ) -> List[Tuple[int, str]]:
        """:meth:`evaluate_victim` for N pairs in ONE jitted classifier call
        (pads N to a power of two)."""
        if not adv_texts:
            return []
        px, ids, mask, n = pad_eval_batch(
            adv_images, adv_texts, self.tokenizer, self.max_text_len
        )
        logits = self._vqa_logits(self.victim_params, px, ids, mask)
        preds = np.asarray(jnp.argmax(logits, axis=-1))[:n]
        return [(int(p), self.id2answer.get(int(p), str(int(p)))) for p in preds]


def load_id2answer(path: str) -> Dict[int, str]:
    """``id2answer.txt`` loader: the reference stores a dill-pickled
    defaultdict (``objectives.py:818-820``); JSON accepted too."""
    import json

    try:
        with open(path) as f:
            d = json.load(f)
        return {int(k): v for k, v in d.items()}
    except (UnicodeDecodeError, json.JSONDecodeError):
        # dill first: the reference's file is dill-pickled and its
        # defaultdict factory (a lambda) is not loadable by stdlib pickle
        try:
            import dill as pickle
        except ImportError:
            import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        return {int(k): v for k, v in d.items()}
