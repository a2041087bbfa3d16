"""Measure the reference's FULL END-TO-END execution shape on this chip
(VERDICT r4 Next #1).

``bench_reference_style.py`` reproduces only the PGD iteration loop
(``projected_gradient_descent.py:129-189``).  The reference's real per-pair
cost also includes the per-sample and per-block text machinery — this
harness reproduces the WHOLE per-sample loop of
``ALBEF_VQAttack/ALBEF_attack/adv_attack.py:385-715`` (and the VLMo
dialect, ``VLMO_VQAttack/vlmo/modules/vlmo_module.py:1725-2093``):

- MAR label construction + alignment guards (host);
- clean-target forward (``Gen_ori_feats``) — one device dispatch;
- candidate generation: one BERT-MLM forward + top-5 + host filtering
  (``cal_text_attack_list``, ``adv_attack.py:215-264``);
- the k+1-block schedule (``adv_attack.py:232-239``), with
  - one device dispatch PER FGM STEP and a device->host loss sync per
    iteration (``projected_gradient_descent.py:129-189``) — feature path:
    40 single-step dispatches; MAR path: 20 alternating-pair dispatches
    (the reference dispatches the two backward passes of a pair
    separately; fusing them into one program here UNDERSTATES the
    reference's dispatch count, i.e. is conservative);
  - one VL joint-step dispatch per non-final block
    (``projected_gradient_descent_vl.py``);
  - the reference's ``update_adv_text`` (``adv_attack.py:265-324``):
    ONE tiny BERT-embedding forward PER CANDIDATE SENTENCE
    (``adv_attack.py:278-298``) + ONE sentence-similarity-gate call PER
    TRIAL with threshold ratcheting (``adv_attack.py:300-324``);
  - MAR only: one full MLM-logits forward + argmax answer-recovery decode
    per non-final block (``adv_attack.py:700-712`` /
    ``vlmo_module.py:2036-2051``);
- artifact persistence per sample (``torch.save`` + text dict,
  ``adv_attack.py:713-715``);
- black-box victim eval every 10 samples, one batch-1 dispatch per stored
  sample (``adv_attack.py:717-733``); VLMo additionally pays the full
  model-RELOAD churn around each eval flush (``reload_vqa`` +
  ``reload_pretrain``, ``vlmo_module.py:2064,2087``) — emulated as a fresh
  host->device upload of the full param tree, which is the device-facing
  part of the reference's ``load_state_dict + .to(device)``.

Fairness protocol (every choice biases AGAINST the rebuild, so the
resulting ratio is a LOWER bound):

- heavy model programs run on the TPU exactly like the production
  pipeline's (same surrogate, same geometry, f32 like the reference,
  remat ON because it is the FASTER b=1 f32 configuration on this chip —
  PERF.md round-2 matrix);
- the per-candidate tiny embedding forwards and the per-trial similarity
  gate run on the HOST CPU BACKEND, not through the ~40 ms tunneled-TPU
  dispatch relay — local CUDA dispatch costs microseconds, so charging
  the relay here would inflate the baseline (the kernel-only baseline's
  documented caveat, made structural here);
- the similarity gate is a Universal-Sentence-Encoder-LARGE-shaped
  transformer (6 layers, d=512, h=8, ffn=2048) executed on CPU per trial
  — the reference pins USE to CPU TF (``adv_attack.py:101-103``); the
  per-call cost is architecture-determined, not weight-determined.  The
  artifact additionally reports ``s_per_pair_gate_free`` (the same wall
  minus the measured gate time) as the floor where the gate is free;
- the sample stream is ``make_synth_assets.realistic_samples`` with the
  SAME seed as the production 256-sample sweeps
  (``docs/SWEEP256_r04_DYNAMIC.json``), so the substitutable-k / block
  distribution matches.

Writes ``docs/REFSTYLE_E2E.json``; ``bench.py`` picks it up and emits
``vs_reference_style_e2e`` (production end-to-end marginal s/pair vs this
measurement) next to the kernel-loop ratio.

Usage::

    python scripts/bench_reference_e2e.py [--model albef|vlmo]
        [--samples 48] [--reps 3] [--write]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "REFSTYLE_E2E.json",
)


class Phases:
    """Wall-clock accumulator: phase name -> seconds, calls."""

    def __init__(self):
        self.acc: Dict[str, float] = {}
        self.calls: Dict[str, int] = {}

    class _Ctx:
        def __init__(self, p, name):
            self.p, self.name = p, name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            dt = time.perf_counter() - self.t0
            self.p.acc[self.name] = self.p.acc.get(self.name, 0.0) + dt
            self.p.calls[self.name] = self.p.calls.get(self.name, 0) + 1

    def phase(self, name):
        return Phases._Ctx(self, name)

    def reset(self):
        self.acc.clear()
        self.calls.clear()


# --------------------------------------------------------------- CPU text ops


def build_cpu_text_ops(vocab_size: int, hidden: int, max_len: int):
    """The reference's tiny text-side device ops, placed on the host CPU
    backend (see module docstring's fairness protocol):

    - ``embed(ids [1,S]) -> [1,S,D]`` — BertEmbeddings-shaped lookup
      (word + position tables + LayerNorm), the ``self.text_embeddings``
      call the reference makes once per candidate sentence
      (``adv_attack.py:295-298``);
    - ``use_sim(ids [2,S_use], mask [2,S_use]) -> scalar`` — the USE-large
      -shaped CPU gate (embed + 6-layer transformer + masked mean-pool +
      cosine of the pair), one call per trial (``adv_attack.py:315-318``).
    """
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        k = jax.random.key(0)
        ks = jax.random.split(k, 8)
        emb_p = {
            "word": jax.random.normal(ks[0], (vocab_size, hidden)) * 0.02,
            "pos": jax.random.normal(ks[1], (max_len, hidden)) * 0.02,
        }

        def _embed(p, ids):
            x = p["word"][ids] + p["pos"][None, : ids.shape[1]]
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-12)

        embed_jit = jax.jit(_embed)

        # USE-large-shaped encoder (6 x transformer, d=512, h=8, ffn=2048)
        D, H, F, L, S = 512, 8, 2048, 6, 16
        use_p = {
            "word": jax.random.normal(ks[2], (vocab_size, D)) * 0.02,
            "layers": [
                {
                    "qkv": jax.random.normal(jax.random.fold_in(ks[3], i), (D, 3 * D))
                    * 0.02,
                    "o": jax.random.normal(jax.random.fold_in(ks[4], i), (D, D)) * 0.02,
                    "f1": jax.random.normal(jax.random.fold_in(ks[5], i), (D, F))
                    * 0.02,
                    "f2": jax.random.normal(jax.random.fold_in(ks[6], i), (F, D))
                    * 0.02,
                }
                for i in range(L)
            ],
        }

        def _ln(x):
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-12)

        def _use(p, ids, mask):
            x = p["word"][ids]  # [2, S, D]
            m = mask[..., None]
            for lp in p["layers"]:
                h = _ln(x)
                qkv = h @ lp["qkv"]
                q, kk, v = jnp.split(qkv, 3, axis=-1)
                q = q.reshape(2, S, H, D // H)
                kk = kk.reshape(2, S, H, D // H)
                v = v.reshape(2, S, H, D // H)
                att = jnp.einsum("bqhd,bkhd->bhqk", q, kk) / jnp.sqrt(D / H)
                att = att + (1.0 - mask[:, None, None, :]) * -1e9
                att = jax.nn.softmax(att, axis=-1)
                o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(2, S, D)
                x = x + o @ lp["o"]
                x = x + jax.nn.gelu(_ln(x) @ lp["f1"]) @ lp["f2"]
            pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            n = pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)
            return jnp.dot(n[0], n[1])

        use_jit = jax.jit(_use)

    def embed(ids_np):
        import numpy as np

        with jax.default_device(cpu):
            return np.asarray(embed_jit(emb_p, jnp.asarray(ids_np)))

    def use_sim(ids2_np, mask2_np):
        with jax.default_device(cpu):
            return float(use_jit(use_p, jnp.asarray(ids2_np), jnp.asarray(mask2_np)))

    return embed, use_sim, S


# ------------------------------------------------------------ model builders


def build_models(kind: str, tokenizer, answer_texts):
    """Random-init surrogate + victim + candidate MLM at full geometry, with
    the per-entry-point jits the reference-shaped loop dispatches."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqattack_tpu.models.bert import FusionBert

    out = {}
    if kind == "albef":
        from vqattack_tpu.attacks import albef as losses_mod
        from vqattack_tpu.config import albef_attack_config
        from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA

        cfg = albef_attack_config()
        # remat ON: the faster b=1 f32 configuration on this chip (PERF.md
        # round-2 matrix) — makes the baseline FASTER, the ratio conservative
        albef = dataclasses.replace(
            cfg.albef,
            vit=dataclasses.replace(cfg.albef.vit, remat=True),
            bert=dataclasses.replace(cfg.albef.bert, remat=True),
        )
        cfg = dataclasses.replace(cfg, albef=albef)
        model = AlbefPretrain(cfg.albef, dtype=jnp.float32)
        size = cfg.albef.vit.image_size
        s = cfg.attack.max_text_len
        px = jnp.zeros((1, size, size, 3))
        ids = jnp.ones((1, s), jnp.int32)
        mask = jnp.ones_like(ids)
        params = jax.jit(model.init)(jax.random.key(0), px, ids, mask)
        victim = AlbefVQA(cfg.albef)
        a_ids, a_mask = tokenizer.encode_batch(
            [a + "[SEP]" for a in answer_texts], 8
        )
        a_ids, a_mask = jnp.asarray(a_ids), jnp.asarray(a_mask)
        vparams = jax.jit(
            lambda k: victim.init(k, px, ids, mask, a_ids, a_mask, 2)
        )(jax.random.key(2))
        out.update(
            cfg=cfg,
            gen_feats=jax.jit(
                lambda v, p, i, m: model.apply(
                    v, p, i, m, method=AlbefPretrain.gen_feats)
            ),
            mlm_logits=jax.jit(
                lambda v, p, i, m: model.apply(
                    v, p, i, m, method=AlbefPretrain.get_mlm_logits)
            ),
            feature_loss=losses_mod.make_feature_loss(model),
            mlm_loss=losses_mod.make_mlm_loss(model),
            vl_loss=losses_mod.make_vl_loss(model),
            params=params,
            victim_rank=jax.jit(
                lambda v, p, i, m: victim.apply(
                    v, p, i, m, a_ids, a_mask, min(128, len(answer_texts))
                )
            ),
            victim_params=vparams,
            image_size=size,
            max_text_len=s,
            suffix="",
            special=(tokenizer.mask_token_id, tokenizer.pad_token_id,
                     tokenizer.cls_token_id),
            mlm_probability=cfg.albef.mlm_probability,
            vocab_size=cfg.albef.bert.vocab_size,
            hidden=cfg.albef.bert.hidden_size,
        )

        def make_aux(ids, mask, tgt_img, tgt_txt, token_mask):
            return {
                "variables": out["params"], "text_ids": ids, "text_mask": mask,
                "tgt_txt": tgt_txt, "tgt_img": tgt_img,
                "txt_token_mask": token_mask,
                "special_ids": out["special"],
            }

        def clean_targets(px_, ids, mask, key):
            from vqattack_tpu.models.albef import mlm_random_mask

            masked, _ = mlm_random_mask(
                key, ids, vocab_size=out["vocab_size"],
                mask_token_id=out["special"][0],
                pad_token_id=out["special"][1],
                cls_token_id=out["special"][2],
                mlm_probability=out["mlm_probability"],
            )
            img_f, txt_f, _ = out["gen_feats"](out["params"], px_, masked, mask)
            return {"tgt_img": img_f, "tgt_txt": txt_f}

        out["make_aux"] = make_aux
        out["clean_targets"] = clean_targets
    else:
        from vqattack_tpu.attacks import vlmo as losses_mod
        from vqattack_tpu.config import vlmo_attack_config
        from vqattack_tpu.models.vlmo import VLMo

        cfg = vlmo_attack_config()
        cfg = dataclasses.replace(
            cfg, vlmo=dataclasses.replace(cfg.vlmo, remat=True))
        model = VLMo(cfg.vlmo, dtype=jnp.float32)
        size = cfg.vlmo.image_size
        s = cfg.vlmo.max_text_len
        px = jnp.zeros((1, size, size, 3))
        ids = jnp.ones((1, s), jnp.int32)
        mask = jnp.ones_like(ids)
        params = jax.jit(
            lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
        )(jax.random.key(0))
        # the victim is the same trunk with its own params + classifier
        vparams = jax.jit(
            lambda k: model.init(k, ids, mask, px, method=VLMo.init_all)
        )(jax.random.key(2))
        rel_biases = jax.jit(
            lambda v: model.apply(v, method=VLMo.precompute_joint_biases)
        )(params)
        out.update(
            cfg=cfg,
            attack_feats=jax.jit(
                lambda v, p, i, m: model.apply(
                    v, p, i, m, method=VLMo.attack_feats)
            ),
            mlm_fwd=jax.jit(
                lambda v, p, i, m: model.apply(
                    v, p, i, m, method=VLMo.attack_mlm)
            ),
            vqa_logits=jax.jit(
                lambda v, p, i, m: model.apply(
                    v, p, i, m, method=VLMo.vqa_logits)
            ),
            feature_loss=losses_mod.make_feature_loss(model),
            mlm_loss=losses_mod.make_mlm_loss(model),
            vl_loss=losses_mod.make_vl_loss(model),
            params=params,
            victim_params=vparams,
            rel_biases=rel_biases,
            image_size=size,
            max_text_len=s,
            suffix="?",
            special=(tokenizer.mask_token_id, tokenizer.pad_token_id,
                     tokenizer.cls_token_id),
            vocab_size=cfg.vlmo.vocab_size,
            hidden=cfg.vlmo.hidden_size,
        )
        # host copies for the reload-churn emulation (the device-facing part
        # of reload_vqa/reload_pretrain: load_state_dict + .to(device))
        out["params_host"] = jax.tree.map(np.asarray, params)
        out["victim_params_host"] = jax.tree.map(np.asarray, vparams)

        def make_aux(ids, mask, tgt_layer_cls, tgt_tokens, tgt_token_mask):
            return {
                "variables": out["params"], "text_ids": ids, "text_mask": mask,
                "tgt_layer_cls": tgt_layer_cls, "tgt_tokens": tgt_tokens,
                "tgt_token_mask": tgt_token_mask,
                "rel_biases": out["rel_biases"],
            }

        def clean_targets(px_, ids, mask, key):
            del key
            _, layer_cls, tokens, token_mask = out["attack_feats"](
                out["params"], px_, ids, mask
            )
            return {
                "tgt_layer_cls": layer_cls, "tgt_tokens": tokens,
                "tgt_token_mask": token_mask.astype(jnp.float32),
            }

        out["make_aux"] = make_aux
        out["clean_targets"] = clean_targets
    return out


# ------------------------------------------------- reference text machinery


def reference_update_adv_text(
    adv_text: str,
    ori_text: str,
    text_grad,                 # [P, D] harvested rows at attack positions
    cands,
    ori_emb,                   # [S, D] CPU-embedded original question
    tokenizer,
    cpu_embed,
    cpu_use_sim,
    use_seq: int,
    phases: Phases,
    suffix: str = "",
    sim_threshold: float = 0.95,
    max_length: int = 25,
):
    """``update_adv_text`` (``adv_attack.py:265-324``) at the reference's
    cost model: one tokenize + one tiny embedding forward PER CANDIDATE,
    one gate call PER TRIAL, serially."""
    import numpy as np

    text = adv_text.strip(suffix) if suffix else adv_text
    adv_words = [w for w in text.replace("\n", "").lower().split(" ") if w]
    ori_words = list(adv_words)

    def _finish(words):
        return " ".join(words) + suffix

    # --- per-candidate scoring (adv_attack.py:278-298) ---------------------
    entries: List = []
    dir_sims: List[float] = []
    max_pos = min(max_length, ori_emb.shape[0]) - 1
    for p, (wi, pos) in enumerate(
        zip(cands.attack_word_indices, cands.attack_positions)
    ):
        if wi >= len(adv_words):  # 'onebug' drift guard (adv_attack.py:280)
            return _finish(ori_words), []
        if pos >= max_pos:
            continue
        for ci, cand in enumerate(cands.candidate_lists[wi]):
            trial = list(adv_words)
            trial[wi] = cand
            sent = _finish(trial)
            with phases.phase("cand_embed"):
                ids, _ = tokenizer.encode(sent, max_length)
                emb = cpu_embed(ids[None])[0]        # ONE forward per candidate
            d = emb[pos] - ori_emb[pos]
            g = np.asarray(text_grad[p])
            denom = max(np.linalg.norm(d) * np.linalg.norm(g), 1e-6)
            dir_sims.append(float(np.dot(d, g) / denom))
            entries.append((wi, ci))

    if not entries:
        return _finish(adv_words), []
    order = list(np.argsort(-np.asarray(dir_sims)))

    # --- greedy walk, ONE gate call per trial (adv_attack.py:300-324) ------
    threshold = sim_threshold
    occupied = set()
    current = list(adv_words)
    ops = []
    for n in order:
        wi, ci = entries[int(n)]
        if wi in occupied:
            continue
        trial = list(current)
        trial[wi] = cands.candidate_lists[wi][ci]
        temp_text = _finish(trial)
        with phases.phase("gate"):
            # the USE call embeds [ori, trial] fresh each time
            ids2, mask2 = tokenizer.encode_batch([ori_text, temp_text], use_seq)
            sim = cpu_use_sim(ids2, mask2)
        if sim > threshold:
            threshold = sim  # ratchet (adv_attack.py:319-320)
            occupied.add(wi)
            current = trial
            ops.append((ori_words[wi], cands.candidate_lists[wi][ci]))
    return _finish(current), ops


# ------------------------------------------------------------ per-sample loop


def attack_one_sample(
    m, sample, tokenizer, filter_words, cpu_embed, cpu_use_sim, use_seq,
    phases: Phases, out_dir: str,
):
    """The reference's per-sample body (``adv_attack.py:415-715``) at its
    dispatch granularity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqattack_tpu.attacks.mar_labels import MarLabels, build_mar_labels
    from vqattack_tpu.attacks.pgd import pgd_alternating, pgd_feature, pgd_vl_step
    from vqattack_tpu.attacks.text_attack import (
        apply_substitutions_to_paraphrase,
        generate_candidates,
    )

    qid, question, answer, paraphrase, pixels = sample
    atk = m["cfg"].attack
    s_len = m["max_text_len"]
    suffix = m["suffix"]
    rng = jax.random.fold_in(jax.random.key(0), int(qid))
    r_tgt, r_pgd = jax.random.split(rng)

    ori_px = jnp.asarray(pixels)
    ori_text = question
    adv_text = question

    with phases.phase("prepare"):
        mar = build_mar_labels(
            paraphrase, answer, [answer], tokenizer, s_len, atk.max_answers,
            sentence_suffix="." if suffix else "",
        )
        old_alg = mar.old_alg
        ori_ids_np, ori_mask_np = tokenizer.encode(question, s_len)
        ori_ids = jnp.asarray(ori_ids_np[None])
        ori_mask = jnp.asarray(ori_mask_np[None])
        # ori_emb on the CPU text path (the reference computes it once)
        ori_emb = cpu_embed(ori_ids_np[None])[0]

    with phases.phase("clean_targets"):
        tgt = m["clean_targets"](ori_px, ori_ids, ori_mask, r_tgt)
        jax.block_until_ready(list(tgt.values()))

    with phases.phase("cand_mlm"):
        # ONE bert-MLM forward (cal_text_attack_list); dispatched on the TPU
        # like the reference's GPU forward, with the top-5 reduced on device
        # exactly as the reference's torch.topk (adv_attack.py:244) — only
        # [S,K] transfers, not the [S,vocab] logits
        def mlm_topk_fn(ids, mask):
            s, i = m["cand_topk"](m["cand_mlm_params"], jnp.asarray(ids),
                                  jnp.asarray(mask))
            return np.asarray(s), np.asarray(i)

        cands = generate_candidates(
            question.strip("?") if suffix else question,
            tokenizer, None, filter_words,
            total_iters=atk.num_iters, top_k=atk.mlm_top_k,
            score_threshold=atk.mlm_score_threshold,
            mlm_topk_fn=mlm_topk_fn,
        )
        iter_list = cands.iter_list if cands.iter_list else [atk.num_iters]

    mar_words = list(mar.paraphrase_words)
    adv_px = ori_px
    first = True
    P_PAD = 8  # fixed VL gather width: one compiled program for every k

    for block_idx, block_iters in enumerate(iter_list):
        with phases.phase("block_prep"):
            ids_np, mask_np = tokenizer.encode(adv_text, s_len)
            ids = jnp.asarray(ids_np[None])
            mask = jnp.asarray(mask_np[None])
            if suffix:
                aux = m["make_aux"](ids, mask, tgt["tgt_layer_cls"],
                                    tgt["tgt_tokens"], tgt["tgt_token_mask"])
            else:
                n = min(int(mask_np.sum()), int(ori_mask_np.sum()))
                token_mask = (np.arange(s_len) < n).astype(np.float32)[None]
                aux = m["make_aux"](ids, mask, tgt["tgt_img"], tgt["tgt_txt"],
                                    jnp.asarray(token_mask))
            if old_alg == 0:
                cur_ids, cur_mask = tokenizer.encode(
                    " ".join(mar_words) + ("." if suffix else ""), s_len
                )
                aligned = int(cur_mask.sum()) == mar.true_len
                aux["mlm_ids"] = jnp.asarray(cur_ids[None])
                aux["mlm_mask"] = jnp.asarray(cur_mask[None])
                aux["mlm_labels"] = jnp.asarray(mar.labels[None])

        r_pgd, r_block = jax.random.split(r_pgd)
        rand_init = first and atk.rand_init
        first = False

        with phases.phase("pgd"):
            if old_alg == 1:
                # one dispatch per FGM step + per-iteration host loss sync
                # (projected_gradient_descent.py:129-152)
                keys = jax.random.split(r_block, block_iters)
                for i in range(block_iters):
                    adv_px, losses = pgd_feature(
                        m["feature_loss"], adv_px, ori_px, keys[i], aux,
                        eps=atk.eps, eps_iter=atk.step_size, nb_iter=1,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        rand_init=rand_init and i == 0, unroll=1,
                    )
                    float(np.asarray(losses)[0, 0])   # float(loss.cpu())
            else:
                second = m["mlm_loss"] if aligned else m["feature_loss"]
                trips = block_iters // 2
                keys = jax.random.split(r_block, max(trips, 1))
                for i in range(trips):
                    adv_px, fl, ml = pgd_alternating(
                        m["feature_loss"], second, adv_px, ori_px, keys[i],
                        aux, eps=atk.eps, eps_iter=atk.step_size, nb_iter=1,
                        clip_min=atk.clip_min, clip_max=atk.clip_max,
                        rand_init=rand_init and i == 0, unroll=1,
                    )
                    # the reference syncs BOTH losses of the pair
                    float(np.asarray(fl)[0, 0])
                    float(np.asarray(ml)[0, 0])

        if block_idx == len(iter_list) - 1 or not cands.attack_word_indices:
            break

        with phases.phase("vl_step"):
            # adv text embeds via the surrogate's table — part of the VL
            # dispatch cost in the reference (fgm_vl input prep)
            pos = np.zeros((1, P_PAD), np.int32)
            ap = cands.attack_positions
            pos[0, : len(ap)] = ap
            r_pgd, r_vl = jax.random.split(r_pgd)
            adv_embeds = m["embed_text"](m["params"], ids)
            adv_px, text_grad = pgd_vl_step(
                m["vl_loss"], adv_px, adv_embeds, ori_px, jnp.asarray(pos),
                r_vl, aux, eps=atk.eps, eps_iter=atk.step_size,
                clip_min=atk.clip_min, clip_max=atk.clip_max,
            )
            tg = np.asarray(text_grad)[0][: len(ap)]

        adv_text, ops = reference_update_adv_text(
            adv_text, ori_text, tg, cands, ori_emb, tokenizer,
            cpu_embed, cpu_use_sim, use_seq, phases, suffix=suffix,
            sim_threshold=atk.sim_threshold, max_length=s_len,
        )
        if old_alg == 0:
            if ops:
                mar_words = apply_substitutions_to_paraphrase(mar_words, ops)
            with phases.phase("mar_decode"):
                # answer-recovery probe: one full MLM forward + argmax decode
                # per non-final block (adv_attack.py:700-712)
                if suffix:
                    logits = m["mlm_fwd"](
                        m["params"], adv_px, aux["mlm_ids"], aux["mlm_mask"]
                    )[0]
                else:
                    logits = m["mlm_logits"](
                        m["params"], adv_px, aux["mlm_ids"], aux["mlm_mask"]
                    )
                pred = np.asarray(jnp.argmax(logits[0], axis=-1))
                out_ids = np.asarray(aux["mlm_ids"][0]).copy()
                mask_pos = np.where(out_ids == tokenizer.mask_token_id)[0]
                out_ids[mask_pos] = pred[mask_pos]
                tokenizer.decode(out_ids[1:])

    with phases.phase("artifact"):
        img = np.asarray(adv_px)
        try:
            import torch

            torch.save(torch.tensor(img.transpose(0, 3, 1, 2)),
                       os.path.join(out_dir, f"{qid}.pt"))
        except ImportError:
            np.save(os.path.join(out_dir, f"{qid}.npy"), img)
    return img, adv_text, old_alg


def victim_eval_flush(m, stored, tokenizer, phases: Phases):
    """Black-box eval of the stored 10 pairs, one batch-1 dispatch per pair
    (``adv_attack.py:717-733``); VLMo pays the reload churn around it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    s_len = m["max_text_len"]
    if m["suffix"]:  # VLMo: reload_vqa -> eval -> reload_pretrain
        with phases.phase("reload"):
            vp = jax.device_put(m["victim_params_host"])
            jax.block_until_ready(vp)
        with phases.phase("victim_eval"):
            for img, txt in stored:
                ids, mask = tokenizer.encode(txt, s_len)
                logits = m["vqa_logits"](
                    vp, jnp.asarray(img), jnp.asarray(ids[None]),
                    jnp.asarray(mask[None]),
                )
                int(np.asarray(jnp.argmax(logits, -1))[0])
        with phases.phase("reload"):
            sp = jax.device_put(m["params_host"])
            jax.block_until_ready(sp)
    else:
        with phases.phase("victim_eval"):
            for img, txt in stored:
                ids, mask = tokenizer.encode(txt, s_len)
                topk_ids, topk_probs = m["victim_rank"](
                    m["victim_params"], jnp.asarray(img),
                    jnp.asarray(ids[None]), jnp.asarray(mask[None]),
                )
                np.asarray(topk_ids)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", choices=("albef", "vlmo"), default="albef")
    ap.add_argument("--samples", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_synth_assets import make_vocab, realistic_samples

    from vqattack_tpu.models.bert import FusionBert
    from vqattack_tpu.text.filter_words import default_filter_words
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer
    from vqattack_tpu.utils.cache import enable_compile_cache
    from vqattack_tpu.utils.retry import with_retries

    enable_compile_cache()
    tmp = tempfile.mkdtemp(prefix="refe2e_")
    vocab_path = os.path.join(tmp, "vocab.txt")
    make_vocab(vocab_path)
    tokenizer = WordPieceTokenizer.from_file(vocab_path)
    filter_words = default_filter_words()

    # same stream + seed as the production 256-sample sweeps
    stream = realistic_samples(256, seed=0)[: args.samples]
    rng = np.random.default_rng(0)
    answers = ["red", "blue", "green", "frisbee", "ball", "dog", "cat",
               "hat", "two", "yes"]

    m = build_models(args.model, tokenizer, answers)
    size = m["image_size"]
    pixels = np.asarray(rng.uniform(-1, 1, (1, size, size, 3)), np.float32)
    samples = [
        (qid, q + ("?" if m["suffix"] else ""), ans, paras[1], pixels)
        for qid, q, ans, paras in stream
    ]

    # candidate-generation MLM (bert-base shaped), random init — one TPU
    # forward per sample like the reference's GPU-resident mlm_model
    if args.model == "albef":
        bert_cfg = m["cfg"].albef.bert
    else:
        from vqattack_tpu.config import albef_attack_config

        bert_cfg = albef_attack_config().albef.bert
    mlm_cfg = dataclasses.replace(bert_cfg, fusion_layer=bert_cfg.num_layers)
    cand_model = FusionBert(mlm_cfg, with_mlm_head=True)
    ids0 = jnp.ones((1, m["max_text_len"]), jnp.int32)
    m["cand_mlm_params"] = jax.jit(
        lambda k: cand_model.init(k, ids0, jnp.ones_like(ids0))
    )(jax.random.key(3))
    m["cand_mlm"] = jax.jit(
        lambda v, i, mk: cand_model.apply(v, i, mk, mode="text")[2]
    )
    topk = 5
    m["cand_topk"] = jax.jit(
        lambda v, i, mk: jax.lax.top_k(
            cand_model.apply(v, i, mk, mode="text")[2], topk
        )
    )
    if args.model == "albef":
        from vqattack_tpu.models.albef import AlbefPretrain

        m["embed_text"] = jax.jit(
            lambda v, i: AlbefPretrain(
                m["cfg"].albef, dtype=jnp.float32
            ).apply(v, i, method=AlbefPretrain.embed_text)
        )
    else:
        from vqattack_tpu.models.vlmo import VLMo

        m["embed_text"] = jax.jit(
            lambda v, i: VLMo(m["cfg"].vlmo, dtype=jnp.float32).apply(
                v, i, method=VLMo.embed_text
            )
        )

    cpu_embed, cpu_use_sim, use_seq = build_cpu_text_ops(
        m["vocab_size"], m["hidden"], m["max_text_len"]
    )

    phases = Phases()
    out_dir = os.path.join(tmp, "out")
    os.makedirs(out_dir, exist_ok=True)

    def full_pass():
        stored = []
        for sample in samples:
            img, txt, _ = with_retries(lambda s=sample: attack_one_sample(
                m, s, tokenizer, filter_words, cpu_embed, cpu_use_sim,
                use_seq, phases, out_dir,
            ))
            stored.append((img, txt))
            if len(stored) == 10:
                victim_eval_flush(m, stored, tokenizer, phases)
                stored = []
        if stored:
            victim_eval_flush(m, stored, tokenizer, phases)

    print(f"warm pass ({args.samples} samples, compiles)...", file=sys.stderr)
    t0 = time.perf_counter()
    full_pass()
    print(f"warm pass done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    walls = []
    for rep in range(args.reps):
        phases.reset()
        t0 = time.perf_counter()
        full_pass()
        walls.append(time.perf_counter() - t0)
        print(f"rep {rep}: {walls[-1]:.1f}s "
              f"({walls[-1] / args.samples:.3f} s/pair)", file=sys.stderr)

    wall = float(np.median(walls))
    n = args.samples
    gate_s = phases.acc.get("gate", 0.0)
    row = {
        "model": args.model,
        "samples": n,
        "reps": args.reps,
        "s_per_pair": round(wall / n, 4),
        "s_per_pair_all_reps": [round(w / n, 4) for w in walls],
        "s_per_pair_gate_free": round((wall - gate_s) / n, 4),
        # reload-free floor (VLMo): the reload emulation pays this runtime's
        # tunneled host->device upload where the reference pays local disk +
        # PCIe — subtracting it bounds the baseline from below
        "s_per_pair_reload_free": round(
            (wall - phases.acc.get("reload", 0.0)) / n, 4),
        # the strictest floor: both environment-sensitive terms subtracted
        # (gate cost architecture-emulated; reload cost tunnel-dependent)
        "s_per_pair_floor": round(
            (wall - gate_s - phases.acc.get("reload", 0.0)) / n, 4),
        "phase_s_per_pair": {
            k: round(v / n, 4)
            for k, v in sorted(phases.acc.items(), key=lambda kv: -kv[1])
        },
        "calls_per_pair": {
            k: round(c / n, 2) for k, c in phases.calls.items()
        },
        "gate_s_per_call": round(gate_s / max(phases.calls.get("gate", 1), 1), 5),
        "device": jax.devices()[0].device_kind,
        "sample_stream": "make_synth_assets.realistic_samples(256, seed=0) "
                         f"prefix — same k distribution as SWEEP256",
        "protocol": (
            "full reference per-sample loop shape (adv_attack.py:385-715 / "
            "vlmo_module.py:1725-2093): one dispatch per FGM step with host "
            "loss sync, VL dispatch per block, per-candidate tiny embedding "
            "forward + per-trial USE-shaped CPU gate call, MAR decode "
            "forward per block, per-sample torch.save, batch-1 victim eval "
            "every 10 samples" + (
                ", full param-tree reupload around each eval flush "
                "(reload_vqa/reload_pretrain churn)" if args.model == "vlmo"
                else ""
            ) + "; f32, remat on (the faster b=1 f32 config — conservative); "
            "tiny text ops on the host CPU backend, not the ~40 ms dispatch "
            "relay (conservative)"
        ),
    }
    print(json.dumps(row, indent=1))

    if not args.no_write:
        data = {}
        if os.path.exists(ARTIFACT):
            with open(ARTIFACT) as f:
                data = json.load(f)
        data[args.model] = row
        with open(ARTIFACT, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote {ARTIFACT}", file=sys.stderr)


if __name__ == "__main__":
    main()
