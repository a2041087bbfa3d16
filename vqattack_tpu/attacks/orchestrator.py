"""The ALBEF attack orchestrator: per-sample attack loop + black-box eval.

Host/device choreography (SURVEY §7.0): for each sample the PGD iteration
budget runs as ``k+1`` jitted ``lax.scan`` blocks, with the host-side text
machinery (WordPiece re-tokenization, similarity gate, substitution
bookkeeping) only at block boundaries — mirroring the reference's structure
(``adv_attack.py:385-715``) while killing its three throughput sinks
(per-iteration host syncs, model reload churn, per-candidate tiny forwards).

All device entry points are jitted once and reused across samples: the aux
pytree carries everything sample-specific (see ``attacks/pgd.py``).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import zlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.attacks import albef as albef_losses
from vqattack_tpu.attacks.mar_labels import MarLabels, build_mar_labels
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
from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA, mlm_random_mask
from vqattack_tpu.text.similarity import SimilarityGate, pad_to_bucket
from vqattack_tpu.text.tokenizer import WordPieceTokenizer


def pad_eval_batch(
    adv_images: Sequence[np.ndarray],
    adv_texts: Sequence[str],
    tokenizer: WordPieceTokenizer,
    max_text_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Assemble a power-of-two-padded victim-eval batch: ``(pixels [P,...],
    ids [P,S], mask [P,S], n_real)``.  Shared by both pipelines'
    ``evaluate_victim_batch``; callers must slice results ``[:n_real]``."""
    padded_texts, n = pad_to_bucket(list(adv_texts))
    pad = len(padded_texts) - n
    px = np.concatenate(list(adv_images) + [adv_images[-1]] * pad, axis=0)
    ids, mask = tokenizer.encode_batch(padded_texts, max_text_len)
    return jnp.asarray(px), jnp.asarray(ids), jnp.asarray(mask), n


@dataclasses.dataclass
class AttackResult:
    qid: str
    adv_image: np.ndarray          # [1, H, W, 3]
    adv_text: str
    old_alg: int
    feat_losses: np.ndarray        # concatenated per-iteration feature losses
    mlm_losses: Optional[np.ndarray]
    num_blocks: int
    substitutions: List[Tuple[str, str]]


class AlbefAttackPipeline:
    """Holds the three resident param trees (surrogate, victim, candidate
    MLM) + jitted entry points; replaces the reference's checkpoint-reload
    churn (``vlmo_module.py:330-567`` pattern) with persistent device state.
    """

    def __init__(
        self,
        cfg: RunConfig,
        surrogate: AlbefPretrain,
        surrogate_params: Any,
        tokenizer: WordPieceTokenizer,
        gate: SimilarityGate,
        victim: Optional[AlbefVQA] = None,
        victim_params: Any = None,
        mlm_model: Any = None,          # FusionBert(with_mlm_head) for candidates
        mlm_params: Any = None,
        filter_words: Optional[frozenset] = None,
        # Pallas PGD-update kernel: measured slower than XLA's free fusion
        # at every production config (layout copies around the kernel —
        # PERF.md profile section); opt-in only.
        use_pallas: bool = False,
    ):
        self.cfg = cfg
        self.surrogate = surrogate
        self.surrogate_params = surrogate_params
        self.victim = victim
        self.victim_params = victim_params
        self.mlm_model = mlm_model
        self.mlm_params = mlm_params
        self.tokenizer = tokenizer
        self.gate = gate
        if filter_words is None:
            from vqattack_tpu.text.filter_words import default_filter_words

            filter_words = default_filter_words()
        self.filter_words = filter_words
        self.use_pallas = use_pallas

        self._special = (
            tokenizer.mask_token_id,
            tokenizer.pad_token_id,
            tokenizer.cls_token_id,
        )
        # jitted device entry points (compiled once, reused across samples)
        self._gen_feats = jax.jit(
            lambda v, px, ids, m: surrogate.apply(
                v, px, ids, m, method=AlbefPretrain.gen_feats
            )
        )
        self._embed_text = jax.jit(
            lambda v, ids: surrogate.apply(v, ids, method=AlbefPretrain.embed_text)
        )
        if mlm_model is not None:
            self._cand_mlm_logits = jax.jit(
                lambda v, ids, mask: mlm_model.apply(v, ids, mask, mode="text")[2]
            )
            # device-side top-k: only [B,S,K] transfers to host instead of
            # the full [B,S,vocab] logits (~0.5 GB per 64-question chunk
            # through the relay — the sweep's prepare-phase dominant term)
            k = cfg.attack.mlm_top_k
            self._cand_mlm_topk = jax.jit(
                lambda v, ids, mask: jax.lax.top_k(
                    mlm_model.apply(v, ids, mask, mode="text")[2], k
                )
            )
        if victim is not None:
            self._rank_answer = jax.jit(
                lambda v, px, ids, m, a_ids, a_mask, k: victim.apply(
                    v, px, ids, m, a_ids, a_mask, k
                ),
                static_argnums=(6,),
            )
        self._feature_loss = albef_losses.make_feature_loss(surrogate)
        self._mlm_loss = albef_losses.make_mlm_loss(surrogate)
        self._vl_loss = albef_losses.make_vl_loss(surrogate)

        # clean-targets as a pure fn over (ori_px, key, aux) for the fused
        # first-block program (pgd.py::pgd_feature_block): the same masked
        # gen_feats as clean_targets(), traced INTO the block program so the
        # separate dispatch (and the eager mlm_random_mask op chain) goes
        # away.  Reads the original question from aux["ori_ids"/"ori_mask"].
        special = self._special
        tap_bf16 = cfg.attack.tap_dtype == "bfloat16"

        def _targets_fn(ori_px, key, aux):
            masked_ids, _ = mlm_random_mask(
                key, aux["ori_ids"],
                vocab_size=surrogate.cfg.bert.vocab_size,
                mask_token_id=special[0], pad_token_id=special[1],
                cls_token_id=special[2],
                mlm_probability=surrogate.cfg.mlm_probability,
            )
            img_f, txt_f, _ = surrogate.apply(
                aux["variables"], ori_px, masked_ids, aux["ori_mask"],
                method=AlbefPretrain.gen_feats,
            )
            if tap_bf16:
                img_f = img_f.astype(jnp.bfloat16)
                txt_f = txt_f.astype(jnp.bfloat16)
            return {"tgt_img": img_f, "tgt_txt": txt_f}

        self._targets_fn = _targets_fn
        self._target_keys = ("tgt_img", "tgt_txt")

    # ------------------------------------------------------------------ utils

    def encode(self, text: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ids, mask = self.tokenizer.encode(text, self.cfg.attack.max_text_len)
        return jnp.asarray(ids[None]), jnp.asarray(mask[None])

    def clean_targets(self, pixels, text_ids, text_mask, rng):
        """Clean per-layer feature stacks (``Gen_ori_feats``,
        ``adv_attack.py:111-118``) — the reference's stochastic MLM masking
        applied with an explicit key."""
        masked_ids, _ = mlm_random_mask(
            rng,
            text_ids,
            vocab_size=self.surrogate.cfg.bert.vocab_size,
            mask_token_id=self._special[0],
            pad_token_id=self._special[1],
            cls_token_id=self._special[2],
            mlm_probability=self.surrogate.cfg.mlm_probability,
        )
        img_f, txt_f, _ = self._gen_feats(
            self.surrogate_params, pixels, masked_ids, text_mask
        )
        if self.cfg.attack.tap_dtype == "bfloat16":
            # halve the per-iteration HBM read of the target stacks; the
            # loss math follows cosine_sim's promotion rules (config.py)
            img_f = img_f.astype(jnp.bfloat16)
            txt_f = txt_f.astype(jnp.bfloat16)
        return img_f, txt_f

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
        ids, _ = self.tokenizer.encode_batch(padded, self.cfg.attack.max_text_len)
        return np.asarray(self._embed_text(self.surrogate_params, jnp.asarray(ids)))[
            :n, : self.cfg.attack.max_text_len
        ]

    # ---------------------------------------------------------------- attack

    def attack_sample(
        self,
        pixels: np.ndarray,           # [1, H, W, 3] normalized [-1, 1]
        question: str,
        qid: str,
        paraphrase: Optional[str],
        target_answer: Optional[str],
        all_correct_answers: Sequence[str] = (),
        rng: Optional[jax.Array] = None,
    ) -> AttackResult:
        """The full per-sample attack (``Adv_attack.evaluate`` body,
        ``adv_attack.py:415-715``)."""
        atk = self.cfg.attack
        if rng is None:
            rng = jax.random.key(self.cfg.seed)
        # stable per-qid fold (hash() is salted per process)
        qid_fold = int(qid) if str(qid).isdigit() else zlib.crc32(str(qid).encode())
        r_tgt, r_pgd = jax.random.split(jax.random.fold_in(rng, qid_fold % (2 ** 31)))

        ori_px = jnp.asarray(pixels)
        ori_text = question
        adv_text = question

        # MAR labels (old_alg==0 iff an answer word appears in the paraphrase)
        if paraphrase is not None and target_answer is not None:
            mar = build_mar_labels(
                paraphrase, target_answer, all_correct_answers,
                self.tokenizer, atk.max_text_len, atk.max_answers,
            )
        else:
            mar = MarLabels(1, None, None, None, [], [], [], 0)
        old_alg = mar.old_alg

        # clean feature targets from the original question; on the fused
        # path they compute INSIDE block 0's program (VERDICT r4 Next #3)
        ori_ids, ori_mask = self.encode(question)
        fused = atk.dynamic_pgd and atk.fused_block
        if fused:
            tgt_img = tgt_txt = None
        else:
            tgt_img, tgt_txt = self.clean_targets(ori_px, ori_ids, ori_mask, r_tgt)
        ori_emb = np.asarray(self._embed_text(self.surrogate_params, ori_ids))[0]

        # substitution candidates + block schedule
        cands = generate_candidates(
            question, self.tokenizer, self.candidate_mlm_logits,
            self.filter_words, total_iters=atk.num_iters,
            top_k=atk.mlm_top_k, score_threshold=atk.mlm_score_threshold,
            mlm_topk_fn=self.candidate_mlm_topk,
        )
        iter_list = cands.iter_list if cands.iter_list else [atk.num_iters]

        mar_words = list(mar.paraphrase_words)
        mlm_true_len = mar.true_len

        adv_px = ori_px
        feat_losses: List[np.ndarray] = []
        mlm_losses: List[np.ndarray] = []
        all_ops: List[Tuple[str, str]] = []
        first_block = True

        for block_idx, block_iters in enumerate(iter_list):
            ids, mask = self.encode(adv_text)
            # min-true-length cosine mask (the reference's ragged truncation,
            # fgm:121-126): adv vs clean token counts can differ after
            # substitution re-tokenization
            n_adv = int(np.asarray(mask).sum())
            n_ori = int(np.asarray(ori_mask).sum())
            n = min(n_adv, n_ori)
            token_mask = (np.arange(atk.max_text_len) < n).astype(np.float32)[None]

            aux = {
                "variables": self.surrogate_params,
                "text_ids": ids,
                "text_mask": mask,
                "txt_token_mask": jnp.asarray(token_mask),
                "special_ids": self._special,
            }
            if fused and first_block:
                # the fused first-block program computes the targets itself
                # from the original question (pgd.py::pgd_feature_block)
                aux["ori_ids"] = ori_ids
                aux["ori_mask"] = ori_mask
            else:
                aux["tgt_txt"] = tgt_txt
                aux["tgt_img"] = tgt_img
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
                # pad the VL gather width to a power of two floored at
                # max_sub_words (the batched engine's lattice policy)
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
                        adv_px, ori_px, r_block, r_vl, r_tgt,
                        jnp.int32(block_iters), jnp.asarray(rand_init),
                        jnp.asarray(not is_last), jnp.asarray(pos), aux,
                        target_keys=self._target_keys,
                        eps=atk.eps, eps_iter=atk.step_size,
                        max_iter=atk.num_iters,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=self.use_pallas,
                    )
                    if first_block:
                        tgt_img, tgt_txt = tgts
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
                # label-alignment guard: if substitution changed the masked
                # paraphrase's token count, the labels no longer align and the
                # reference falls back to the feature loss for the MLM step
                # (fgm:102-118 'bkp' wiring)
                cur_ids, cur_mask = self.tokenizer.encode(
                    " ".join(mar_words), atk.max_text_len
                )
                aligned = int(cur_mask.sum()) == mlm_true_len
                aux["mlm_ids"] = jnp.asarray(cur_ids[None])
                aux["mlm_mask"] = jnp.asarray(cur_mask[None])
                aux["mlm_labels"] = jnp.asarray(mar.labels[None])
                second_loss = self._mlm_loss if aligned else self._feature_loss
                if fused:
                    adv_px, fl, ml, tgf, tgts = pgd_alternating_block(
                        self._feature_loss, second_loss, self._vl_loss,
                        self._embed_text,
                        self._targets_fn if first_block else None,
                        adv_px, ori_px, r_block, r_vl, r_tgt,
                        jnp.int32(block_iters // 2), jnp.asarray(rand_init),
                        jnp.asarray(not is_last), jnp.asarray(pos), aux,
                        target_keys=self._target_keys,
                        eps=atk.eps, eps_iter=atk.step_size,
                        max_iter=atk.num_iters // 2,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=self.use_pallas,
                    )
                    if first_block:
                        tgt_img, tgt_txt = tgts
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

            # --- between blocks: VL joint step -> word substitution --------
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
                max_length=atk.max_text_len,
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

    def evaluate_victim(
        self,
        adv_image: np.ndarray,
        adv_text: str,
        answer_ids: jnp.ndarray,
        answer_mask: jnp.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Black-box check: victim's ranked answers on the adversarial pair
        (``adv_attack.py:717-733``).  ``k_test`` clamps to the answer-list
        size (the reference assumes 3,129 >= 128)."""
        ids, mask = self.encode(adv_text)
        k = min(self.cfg.k_test, int(answer_ids.shape[0]))
        return self._rank_answer(
            self.victim_params, jnp.asarray(adv_image), ids, mask,
            answer_ids, answer_mask, k,
        )

    def evaluate_victim_batch(
        self,
        adv_images: Sequence[np.ndarray],      # N x [1, H, W, 3]
        adv_texts: Sequence[str],
        answer_ids: jnp.ndarray,
        answer_mask: jnp.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """:meth:`evaluate_victim` for N pairs in ONE jitted rank_answer call
        (the sweep's eval cadence previously paid one batch-1 decode per
        pending sample).  Pads N to a power of two; returns
        ``(topk_ids [N,k], topk_probs [N,k])``."""
        k = min(self.cfg.k_test, int(answer_ids.shape[0]))
        if not adv_texts:
            return np.zeros((0, k), np.int32), np.zeros((0, k), np.float32)
        px, ids, mask, n = pad_eval_batch(
            adv_images, adv_texts, self.tokenizer, self.cfg.attack.max_text_len
        )
        topk_ids, topk_probs = self._rank_answer(
            self.victim_params, px, ids, mask, answer_ids, answer_mask, k,
        )
        return np.asarray(topk_ids)[:n], np.asarray(topk_probs)[:n]


def save_artifacts(
    results: Sequence[AttackResult], out_dir: str, txt_name: str = "adv_txt_dict.json"
) -> None:
    """Persist adversarial artifacts in the reference's layout: one image
    tensor per qid + one JSON text dict (``adv_attack.py:713-715``).
    Images are stored as ``.npy`` (NHWC float32) plus optional torch ``.pt``
    (NCHW) when torch is importable, for byte-compat with the reference's
    downstream transfer-eval scripts."""
    os.makedirs(out_dir, exist_ok=True)
    warned = False
    txt: Dict[str, str] = {}
    for r in results:
        np.save(os.path.join(out_dir, f"{r.qid}.npy"), r.adv_image)
        try:
            import torch

            torch.save(
                torch.tensor(r.adv_image.transpose(0, 3, 1, 2)),
                os.path.join(out_dir, f"{r.qid}.pt"),
            )
        except ImportError:
            if not warned:
                warned = True
                logging.getLogger(__name__).warning(
                    "torch unavailable: adversarial images saved as .npy "
                    "only (no reference-compatible .pt); vqattack_tpu's "
                    "transfer_eval reads .npy natively"
                )
        txt[r.qid] = r.adv_text
    path = os.path.join(out_dir, txt_name)
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(txt)
    with open(path, "w") as f:
        f.write(json.dumps(existing))
