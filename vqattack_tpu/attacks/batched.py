"""Batched multi-sample ALBEF attack: the sweep's throughput engine.

The reference attacks one (image, question) pair at a time (batch hard-fixed
to 1 — SURVEY §6).  Here samples sharing a block schedule run in lockstep:
one jitted PGD scan advances the whole batch, the VL step harvests every
sample's text-embedding gradients at once, and candidate scoring embeds all
samples' candidate sentences in a single device call.  The host only does
WordPiece bookkeeping between blocks.

Bucketing: the schedule is determined by ``k`` = number of substitutable
words (``compute_iter_schedule``), so a bucket = samples with equal
``(old_alg, k)``.  Buckets pad to a fixed batch size by repeating the last
sample (padding results are dropped), keeping one compiled program per
(bucket-shape, k).

MAR-label alignment can drift per sample mid-attack (a substitution changes
the masked paraphrase's token count); a mixed bucket switches its second PGD
step to a per-sample convex mix ``w*MAR + (1-w)*feature`` (one extra forward,
only when actually mixed).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
import os
import threading
import time
from collections import defaultdict, deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.attacks import albef as albef_losses
from vqattack_tpu.attacks.mar_labels import MarLabels, build_mar_labels
from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline, AttackResult
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
    SubstitutionRequest,
    WordCandidates,
    apply_substitutions_to_paraphrase,
    generate_candidates_batch,
    select_substitutions_multi,
)
from vqattack_tpu.models.albef import AlbefPretrain


class PhaseTimer:
    """Wall-clock attribution of the sweep's phases, for finding where
    end-to-end time goes beyond the PGD kernels (PERF.md "end-to-end").
    Enabled via ``VQATTACK_PHASE_TIMING=1``; each phase context syncs the
    values passed to ``phase(..., sync=...)`` so async device work is
    charged to the phase that launched it."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.acc: Dict[str, float] = defaultdict(float)
        self._lock = threading.Lock()  # pipelined buckets time concurrently

    def add(self, name: str, seconds: float) -> None:
        if self.enabled:
            with self._lock:
                self.acc[name] += seconds

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync() if callable(sync) else sync)
            self.add(name, time.perf_counter() - t0)

    def report(self, log_fn=print) -> None:
        if not self.enabled or not self.acc:
            return
        total = sum(self.acc.values())
        parts = ", ".join(
            f"{k}={v:.2f}s"
            for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1])
        )
        log_fn(f"phase timing: {parts} (sum {total:.2f}s)")


def _make_timer() -> PhaseTimer:
    return PhaseTimer(os.environ.get("VQATTACK_PHASE_TIMING") == "1")


# dispatch-batching chunk for sweep preparation: the candidate-MLM forwards
# and question embeddings batch this many samples per device call
_PREPARE_CHUNK = 64


@functools.lru_cache(maxsize=None)
def make_mixed_second_loss(model: AlbefPretrain):
    """Per-sample convex mix of the MAR and feature losses, weighted by
    ``aux['mlm_weight'] [B]`` — the batched analogue of the reference's
    per-sample shape-fallback (``fgm:102-118``)."""

    feat = albef_losses.make_feature_loss(model)
    mlm = albef_losses.make_mlm_loss(model)

    def loss_fn(adv_px, key, aux):
        k1, k2 = jax.random.split(key)
        _, ps_feat = feat(adv_px, k1, aux)
        _, ps_mlm = mlm(adv_px, k2, aux)
        w = aux["mlm_weight"]
        ps = w * ps_mlm + (1.0 - w) * ps_feat
        return jnp.sum(ps), ps

    return loss_fn


@dataclasses.dataclass
class _SampleState:
    qid: str
    question: str
    adv_text: str
    mar: MarLabels
    mar_words: List[str]
    cands: WordCandidates
    ori_emb: np.ndarray
    substitutions: List[Tuple[str, str]]


class BatchedAlbefAttack:
    """Lockstep attack over a bucket of same-schedule samples.

    Subclassable: :class:`BatchedVlmoAttack` overrides the target/aux
    adapters to reuse the identical block-loop over the VLMo pipeline.
    """

    # text dialect: VLMo strips/re-appends '?' around questions and ends
    # every encoded paraphrase sentence with '.' (vlmo_module.py:1539,1644,
    # 1756,1802); ALBEF text arrives pre_question-normalized with no appends
    _question_suffix = ""
    _sentence_suffix = ""

    def __init__(self, pipeline: AlbefAttackPipeline, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — sample batches shard
        over its data axis (params replicate/column-shard per
        ``parallel/mesh.py``); the same jitted programs run, GSPMD partitions
        them (BASELINE config #5)."""
        self.p = pipeline
        self.mesh = mesh
        self._mixed_loss = make_mixed_second_loss(pipeline.surrogate)
        self._timer = _make_timer()

    def _place(self, px, aux):
        if self.mesh is None:
            return px, aux
        from vqattack_tpu.parallel.mesh import shard_batch, shard_params

        px = shard_batch(px, self.mesh)
        out = {}
        for k, v in aux.items():
            if k == "variables":
                out[k] = shard_params(v, self.mesh)
            elif k in ("special_ids",):
                out[k] = v
            elif k == "rel_biases":
                # layer-stacked bias is batch-free: replicate
                import jax
                from jax.sharding import NamedSharding, PartitionSpec

                out[k] = jax.device_put(v, NamedSharding(self.mesh, PartitionSpec()))
            else:
                out[k] = shard_batch(v, self.mesh)
        return px, out

    # -- adapter surface (overridden per family) ---------------------------

    # aux keys holding the clean-target stacks (also the fused block
    # programs' target pytree order — pgd.py::pgd_feature_block)
    _target_keys = ("tgt_img", "tgt_txt")

    def _clean_targets(self, ori_px, ids, mask, rng):
        tgt_img, tgt_txt = self.p.clean_targets(ori_px, ids, mask, rng)
        return {"tgt_img": tgt_img, "tgt_txt": tgt_txt}

    def _block_aux(self, targets, ids, mask, n, max_len):
        """``targets=None`` (fused first block) omits the target entries —
        the fused program computes and returns them instead."""
        token_mask = (np.arange(max_len)[None] < n[:, None]).astype(np.float32)
        aux = {
            "variables": self.p.surrogate_params,
            "text_ids": ids,
            "text_mask": mask,
            "txt_token_mask": jnp.asarray(token_mask),
            "special_ids": self.p._special,
        }
        if targets is not None:
            aux.update(targets)
        return aux

    @property
    def _max_text_len(self) -> int:
        return self.p.cfg.attack.max_text_len

    # ------------------------------------------------------------------ prep

    def _prepare(self, sample: Dict[str, Any]) -> _SampleState:
        return self._prepare_many([sample])[0]

    def _prepare_many(self, samples: Sequence[Dict[str, Any]]) -> List[_SampleState]:
        """Per-sample attack state for the whole sweep at once.

        The per-sample version paid two ~61 ms device round-trips per sample
        (candidate-MLM forward + original-question embedding) — ~10 min of
        pure dispatch over a 5k sweep.  Here both batch across samples:
        candidates via :func:`generate_candidates_batch` (one MLM call per
        64-sample chunk) and the embeddings via chunked ``embed_texts``
        (power-of-two padded).  Results are those of the per-sample path."""
        p, atk = self.p, self.p.cfg.attack
        mars = []
        for sample in samples:
            if sample.get("paraphrase") and sample.get("target_answer"):
                mars.append(build_mar_labels(
                    sample["paraphrase"], sample["target_answer"],
                    sample.get("all_correct_answers", ()),
                    p.tokenizer, self._max_text_len, atk.max_answers,
                    sentence_suffix=self._sentence_suffix,
                ))
            else:
                mars.append(MarLabels(1, None, None, None, [], [], [], 0))
        if p.mlm_model is not None:
            qs = []
            for sample in samples:
                q = sample["question"]
                if self._question_suffix:
                    q = q.strip(self._question_suffix)
                qs.append(q)
            cands_list = generate_candidates_batch(
                qs, p.tokenizer, p.candidate_mlm_logits,
                p.filter_words, total_iters=atk.num_iters,
                top_k=atk.mlm_top_k, score_threshold=atk.mlm_score_threshold,
                max_mlm_batch=_PREPARE_CHUNK,
                mlm_topk_fn=p.candidate_mlm_topk,
            )
        else:
            # no candidate MLM -> image-only attack: empty substitution
            # state, single full-budget PGD block (iter_list falls back to
            # [num_iters] in attack_bucket)
            cands_list = [WordCandidates([], [], [], []) for _ in samples]
        ori_embs: List[np.ndarray] = []
        for start in range(0, len(samples), _PREPARE_CHUNK):
            texts = [
                s["question"] for s in samples[start : start + _PREPARE_CHUNK]
            ]
            ori_embs.extend(np.asarray(p.embed_texts(texts)))
        return [
            _SampleState(
                qid=str(sample["qid"]), question=sample["question"],
                adv_text=sample["question"], mar=mar,
                mar_words=list(mar.paraphrase_words), cands=cands,
                ori_emb=ori_emb, substitutions=[],
            )
            for sample, mar, cands, ori_emb in zip(
                samples, mars, cands_list, ori_embs
            )
        ]

    @staticmethod
    def bucket_key(state: _SampleState) -> Tuple[int, int]:
        return (state.mar.old_alg, len(state.cands.iter_list))

    def _encode_batch(self, texts: Sequence[str]):
        ids, mask = self.p.tokenizer.encode_batch(texts, self._max_text_len)
        return jnp.asarray(ids), jnp.asarray(mask)

    # ---------------------------------------------------------------- attack

    def attack_bucket(
        self,
        pixels: np.ndarray,           # [B, H, W, 3]
        states: List[_SampleState],
        rng: jax.Array,
    ) -> List[AttackResult]:
        p, atk = self.p, self.p.cfg.attack
        b = len(states)
        assert pixels.shape[0] == b
        old_alg = states[0].mar.old_alg
        iter_list = states[0].cands.iter_list or [atk.num_iters]
        assert all(self.bucket_key(s) == self.bucket_key(states[0]) for s in states)

        ori_px = jnp.asarray(pixels)
        adv_px = ori_px
        ori_ids, ori_mask = self._encode_batch([s.question for s in states])
        r_tgt, r_pgd = jax.random.split(rng)
        fused = atk.dynamic_pgd and atk.fused_block
        if fused:
            # targets compute INSIDE block 0's fused program and come back
            # as device arrays for the later blocks (VERDICT r4 Next #3)
            targets = None
        else:
            with self._timer.phase("clean_targets", sync=lambda: targets):
                targets = self._clean_targets(ori_px, ori_ids, ori_mask, r_tgt)
        n_ori = np.asarray(ori_mask).sum(1)

        feat_losses = [[] for _ in range(b)]
        mlm_losses = [[] for _ in range(b)]
        first_block = True

        # padded attack positions [B, P]; P rounds up to a power of two so
        # the program lattice stays small and scripts/warm_cache.py's
        # pre-compiled widths (1,2,4,...) cover every bucket
        max_p = max((len(s.cands.attack_positions) for s in states), default=0)
        if max_p > 0:
            if atk.dynamic_pgd:
                # floor the VL-step gather width at max_sub_words so typical
                # buckets share one program; an unusually word-dense bucket
                # can still exceed it (one position per attackable word,
                # hard-bounded by max_text_len), which is why warm_cache's
                # _vl_widths covers every power of two up to that bound
                max_p = max(max_p, atk.max_sub_words)
            max_p = 1 << (max_p - 1).bit_length()

        if self.mesh is not None:
            ori_px = self._place(ori_px, {})[0]

        for block_idx, block_iters in enumerate(iter_list):
            with self._timer.phase("block_prep"):
                ids, mask = self._encode_batch([s.adv_text for s in states])
                n_adv = np.asarray(mask).sum(1)
                n = np.minimum(n_adv, n_ori)
                aux = self._block_aux(targets, ids, mask, n, self._max_text_len)
                if fused and block_idx == 0:
                    # the fused first-block program reads the ORIGINAL
                    # question for its on-device clean-targets forward
                    aux["ori_ids"] = ori_ids
                    aux["ori_mask"] = ori_mask
                if old_alg != 1:
                    # add the MLM entries BEFORE placement so they carry the
                    # same mesh sharding as every other batch array
                    mlm_ids, mlm_mask, weights = [], [], []
                    for s in states:
                        ci, cm = p.tokenizer.encode(
                            " ".join(s.mar_words) + self._sentence_suffix,
                            self._max_text_len,
                        )
                        mlm_ids.append(ci)
                        mlm_mask.append(cm)
                        weights.append(1.0 if int(cm.sum()) == s.mar.true_len else 0.0)
                    aux["mlm_ids"] = jnp.asarray(np.stack(mlm_ids))
                    aux["mlm_mask"] = jnp.asarray(np.stack(mlm_mask))
                    aux["mlm_labels"] = jnp.asarray(
                        np.stack([s.mar.labels for s in states])
                    )
                    if all(w == 1.0 for w in weights):
                        second = p._mlm_loss
                    else:
                        second = self._mixed_loss
                        aux["mlm_weight"] = jnp.asarray(weights, jnp.float32)
                adv_px, aux = self._place(adv_px, aux)
            r_pgd, r_block = jax.random.split(r_pgd)
            rand_init = first_block and atk.rand_init
            # the dynamic kernels clamp their trip count to max_iter
            # on-device (silently truncating the attack) — enforce the
            # schedule invariant here where it is visible (hard contract:
            # a real exception, not an assert, so `python -O` keeps it)
            if block_iters > atk.num_iters:
                raise ValueError(
                    f"block_iters={block_iters} exceeds the attack budget "
                    f"num_iters={atk.num_iters}"
                )

            is_last = block_idx == len(iter_list) - 1 or max_p == 0
            if fused:
                pw = max(max_p, 1)
                pos = np.zeros((b, pw), np.int32)
                for j, s in enumerate(states):
                    ap = s.cands.attack_positions
                    pos[j, : len(ap)] = ap
                r_pgd, r_vl = jax.random.split(r_pgd)
                tfn = self.p._targets_fn if block_idx == 0 else None
            with self._timer.phase("pgd"):
                if old_alg == 1:
                    if fused:
                        adv_px, losses, tgf, tgts = pgd_feature_block(
                            p._feature_loss, p._vl_loss, p._embed_text, tfn,
                            adv_px, ori_px, r_block, r_vl, r_tgt,
                            jnp.int32(block_iters), jnp.asarray(rand_init),
                            jnp.asarray(not is_last), jnp.asarray(pos), aux,
                            target_keys=self._target_keys,
                            eps=atk.eps, eps_iter=atk.step_size,
                            max_iter=atk.num_iters,
                            clip_min=atk.clip_min, clip_max=atk.clip_max,
                            use_pallas=p.use_pallas,
                        )
                        if block_idx == 0:
                            targets = dict(zip(self._target_keys, tgts))
                    elif atk.dynamic_pgd:
                        adv_px, losses = pgd_feature_dynamic(
                            p._feature_loss, adv_px, ori_px, r_block,
                            jnp.int32(block_iters), jnp.asarray(rand_init), aux,
                            eps=atk.eps, eps_iter=atk.step_size,
                            max_iter=atk.num_iters,
                            clip_min=atk.clip_min, clip_max=atk.clip_max,
                            use_pallas=p.use_pallas,
                        )
                    else:
                        adv_px, losses = pgd_feature(
                            p._feature_loss, adv_px, ori_px, r_block, aux,
                            eps=atk.eps, eps_iter=atk.step_size, nb_iter=block_iters,
                            clip_min=atk.clip_min, clip_max=atk.clip_max,
                            rand_init=rand_init, use_pallas=p.use_pallas,
                            unroll=atk.scan_unroll,
                        )
                    ln = np.asarray(losses)[:block_iters]
                    for j in range(b):
                        feat_losses[j].append(ln[:, j])
                else:
                    if fused:
                        adv_px, fl, ml, tgf, tgts = pgd_alternating_block(
                            p._feature_loss, second, p._vl_loss,
                            p._embed_text, tfn,
                            adv_px, ori_px, r_block, r_vl, r_tgt,
                            jnp.int32(block_iters // 2), jnp.asarray(rand_init),
                            jnp.asarray(not is_last), jnp.asarray(pos), aux,
                            target_keys=self._target_keys,
                            eps=atk.eps, eps_iter=atk.step_size,
                            max_iter=atk.num_iters // 2,
                            clip_min=atk.clip_min, clip_max=atk.clip_max,
                            use_pallas=p.use_pallas,
                        )
                        if block_idx == 0:
                            targets = dict(zip(self._target_keys, tgts))
                    elif atk.dynamic_pgd:
                        adv_px, fl, ml = pgd_alternating_dynamic(
                            p._feature_loss, second, adv_px, ori_px, r_block,
                            jnp.int32(block_iters // 2), jnp.asarray(rand_init),
                            aux,
                            eps=atk.eps, eps_iter=atk.step_size,
                            max_iter=atk.num_iters // 2,
                            clip_min=atk.clip_min, clip_max=atk.clip_max,
                            use_pallas=p.use_pallas,
                        )
                    else:
                        adv_px, fl, ml = pgd_alternating(
                            p._feature_loss, second, adv_px, ori_px, r_block, aux,
                            eps=atk.eps, eps_iter=atk.step_size, nb_iter=block_iters // 2,
                            clip_min=atk.clip_min, clip_max=atk.clip_max,
                            rand_init=rand_init, use_pallas=p.use_pallas,
                            unroll=atk.scan_unroll,
                        )
                    fln = np.asarray(fl)[: block_iters // 2]
                    mln = np.asarray(ml)[: block_iters // 2]
                    for j in range(b):
                        feat_losses[j].append(fln[:, j])
                        mlm_losses[j].append(mln[:, j])
            first_block = False

            if is_last:
                break

            # --- VL step: every sample's text gradient in one program ------
            # (fused path: already part of the block program above — only
            # the host transfer of the harvested gradient remains here)
            with self._timer.phase("vl_step"):
                if fused:
                    tg = np.asarray(tgf)
                else:
                    adv_embeds = p._embed_text(p.surrogate_params, ids)
                    pos = np.zeros((b, max_p), np.int32)
                    for j, s in enumerate(states):
                        ap = s.cands.attack_positions
                        pos[j, : len(ap)] = ap
                    r_pgd, r_vl = jax.random.split(r_pgd)
                    adv_px, text_grad = pgd_vl_step(
                        p._vl_loss, adv_px, adv_embeds, ori_px,
                        jnp.asarray(pos), r_vl, aux,
                        eps=atk.eps, eps_iter=atk.step_size,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        use_pallas=p.use_pallas,
                    )
                    tg = np.asarray(text_grad)

            # --- substitution selection (host; the whole bucket's candidate
            # embeddings AND gate rounds batch into single device calls —
            # see select_substitutions_multi) ----------------------------
            with self._timer.phase("substitution"):
                thr = p.gate.operating_point(atk.sim_threshold)
                reqs, req_j = [], []
                for j, s in enumerate(states):
                    if not s.cands.attack_word_indices:
                        continue
                    reqs.append(SubstitutionRequest(
                        s.adv_text, s.question,
                        tg[j, : len(s.cands.attack_positions)],
                        s.cands, s.ori_emb, thr,
                    ))
                    req_j.append(j)
                outs = select_substitutions_multi(
                    reqs, p.embed_texts, p.gate.scores_pairs,
                    max_length=self._max_text_len,
                    question_suffix=self._question_suffix,
                    timer=self._timer,
                ) if reqs else []
                for j, (new_text, ops) in zip(req_j, outs):
                    s = states[j]
                    s.adv_text = new_text
                    s.substitutions.extend(ops)
                    if old_alg == 0 and ops:
                        s.mar_words = apply_substitutions_to_paraphrase(s.mar_words, ops)

        adv_np = np.asarray(adv_px)
        results = []
        for j, s in enumerate(states):
            results.append(
                AttackResult(
                    qid=s.qid,
                    adv_image=adv_np[j : j + 1],
                    adv_text=s.adv_text,
                    old_alg=old_alg,
                    feat_losses=np.concatenate(feat_losses[j]) if feat_losses[j] else np.zeros(0),
                    mlm_losses=np.concatenate(mlm_losses[j]) if mlm_losses[j] else None,
                    num_blocks=len(iter_list),
                    substitutions=s.substitutions,
                )
            )
        return results

    # ------------------------------------------------------------------ sweep

    def _run_chunk(
        self,
        chunk: List[Tuple[_SampleState, dict]],
        n_real: int,
        rng: jax.Array,
    ) -> List[AttackResult]:
        """Assemble one padded bucket's pixel batch + states and attack it.
        Pixel batches are built here (inside the worker when pipelined) so
        only ``pipeline_depth`` buckets of pixels are ever resident."""
        px = np.concatenate([np.asarray(s["pixels"]) for _, s in chunk])
        # padding copies get fresh mutable state so their (discarded)
        # substitutions can't leak into the real sample they mirror
        states = [
            dataclasses.replace(st, mar_words=list(st.mar_words), substitutions=[])
            if idx >= n_real
            else st
            for idx, (st, _) in enumerate(chunk)
        ]
        return self.attack_bucket(px, states, rng)[:n_real]

    def run(
        self,
        samples: Sequence[Dict[str, Any]],
        batch_size: int = 8,
        rng: Optional[jax.Array] = None,
        pipeline_depth: int = 1,
    ) -> List[AttackResult]:
        """Bucket by (old_alg, k), pad chunks to ``batch_size`` by repeating
        the last sample, run lockstep, drop padding results.

        ``pipeline_depth > 1`` overlaps independent buckets: while bucket
        *i*'s host-side text work runs (tokenization, candidate scoring, the
        similarity-gate ratchet — the largest non-device steady-state term,
        PERF.md "end-to-end"), bucket *i+1*'s PGD scans are already queued on
        the chip.  Per-bucket results are bit-identical to the serial order
        (each bucket's compute depends only on its own state + folded key);
        only wall-clock interleaving changes.  Depth 2 is the sweet spot —
        one bucket computing, one in host phases."""
        if rng is None:
            rng = jax.random.key(self.p.cfg.seed)
        with self._timer.phase("prepare"):
            prepared = list(zip(self._prepare_many(samples), samples))
        buckets: Dict[Tuple[int, int], List[Tuple[_SampleState, dict]]] = {}
        for st, s in prepared:
            buckets.setdefault(self.bucket_key(st), []).append((st, s))

        from vqattack_tpu.text.similarity import next_pow2

        # leftover chunks pad only to the next power of two (not the full
        # batch size): a 3-sample tail costs a b=4 program, not b=16 — the
        # extra compiled variants are bounded at log2(batch) per bucket key
        # (scripts/warm_cache.py pre-compiles them for SINGLE-DEVICE sweeps;
        # mesh programs are not warmed and compile on first use).  A mesh
        # needs the batch divisible by its DATA-axis size, so that's the floor
        # (an indivisible batch silently replicates — parallel/mesh.py).
        if self.mesh is None:
            min_b = 1
        else:
            from vqattack_tpu.parallel.mesh import DATA_AXIS

            min_b = int(self.mesh.shape[DATA_AXIS])
        chunks: List[Tuple[List[Tuple[_SampleState, dict]], int, jax.Array]] = []
        step = 0
        n_padded_rows = 0
        for key in sorted(buckets):
            entries = buckets[key]
            for i in range(0, len(entries), batch_size):
                chunk = entries[i : i + batch_size]
                n_real = len(chunk)
                target = max(next_pow2(n_real), min_b)
                target = min(batch_size, -(-target // min_b) * min_b)
                while len(chunk) < target:
                    chunk.append(chunk[-1])
                step += 1
                n_padded_rows += target
                chunks.append((chunk, n_real, jax.random.fold_in(rng, step)))
        # padding occupancy: chip time scales with padded rows, so a low
        # fraction here means the caller's buffer is too small for the
        # bucket-key spread (run.py --buffer-factor)
        self.last_occupancy = len(samples) / max(n_padded_rows, 1)
        self.last_chunk_sizes = [len(c) for c, _, _ in chunks]

        results: List[AttackResult] = []
        if pipeline_depth <= 1 or len(chunks) <= 1:
            for chunk, n_real, key in chunks:
                results.extend(self._run_chunk(chunk, n_real, key))
        else:
            with ThreadPoolExecutor(max_workers=pipeline_depth) as ex:
                pending = deque()
                for chunk, n_real, key in chunks:
                    if len(pending) >= pipeline_depth:
                        results.extend(pending.popleft().result())
                    pending.append(ex.submit(self._run_chunk, chunk, n_real, key))
                while pending:
                    results.extend(pending.popleft().result())
        self._timer.report()
        return results


@functools.lru_cache(maxsize=None)
def make_vlmo_mixed_second_loss(model):
    """Per-sample MAR/feature mix for VLMo buckets (see
    :func:`make_mixed_second_loss`)."""
    from vqattack_tpu.attacks import vlmo as vlmo_losses

    feat = vlmo_losses.make_feature_loss(model)
    mlm = vlmo_losses.make_mlm_loss(model)

    def loss_fn(adv_px, key, aux):
        k1, k2 = jax.random.split(key)
        _, ps_feat = feat(adv_px, k1, aux)
        _, ps_mlm = mlm(adv_px, k2, aux)
        w = aux["mlm_weight"]
        ps = w * ps_mlm + (1.0 - w) * ps_feat
        return jnp.sum(ps), ps

    return loss_fn


class BatchedVlmoAttack(BatchedAlbefAttack):
    """Lockstep VLMo buckets: same block loop, VLMo target/aux adapters."""

    _question_suffix = "?"
    _sentence_suffix = "."

    def __init__(self, pipeline, mesh=None):
        # note: VlmoAttackPipeline, not Albef — duck-typed member surface
        self.p = pipeline
        self.mesh = mesh
        self._mixed_loss = make_vlmo_mixed_second_loss(pipeline.model)
        self._timer = _make_timer()

    @property
    def _max_text_len(self) -> int:
        return self.p.max_text_len

    def _clean_targets(self, ori_px, ids, mask, rng):
        del rng  # VLMo's attack forward has no stochastic masking
        layer_cls, tokens, token_mask = self.p.clean_targets(ori_px, ids, mask)
        return {
            "tgt_layer_cls": layer_cls,
            "tgt_tokens": tokens,
            "tgt_token_mask": token_mask,
        }

    _target_keys = ("tgt_layer_cls", "tgt_tokens", "tgt_token_mask")

    def _block_aux(self, targets, ids, mask, n, max_len):
        del n, max_len  # VLMo token masking rides tgt_token_mask x adv mask
        aux = {
            "variables": self.p.surrogate_params,
            "text_ids": ids,
            "text_mask": mask,
            "rel_biases": self.p._rel_biases,
        }
        if targets is not None:
            aux.update(targets)
        return aux
