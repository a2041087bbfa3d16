"""Top-level attack driver (the L5 entry point).

Replaces both reference drivers — ``ALBEF_attack/VQA.py`` (argparse + yaml)
and ``VLMO_VQAttack/run.py`` (sacred + Lightning) — with one CLI::

    python -m vqattack_tpu.run --pipeline albef \
        --config run.json --vocab vocab.txt \
        --surrogate-ckpt albef_pretrain.pth --victim-ckpt albef_vqa.pth \
        --ann vqa_val.json --image-root /data/val2014 --answer-list answers.json \
        --right-part right_part.txt --output attack_out

Flow per sample (``adv_attack.py:385-735`` semantics): subset + alignment
guards -> per-sample attack (PGD blocks + word substitution) -> artifact
persistence -> black-box victim eval every ``eval_every`` samples with the
running flip-rate printed every 50.

Sharding: with multiple hosts/devices the qid list shards round-robin by
``jax.process_index()`` and artifacts merge by directory (SURVEY §5.8).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native VQAttack sweep")
    p.add_argument("--pipeline", choices=["albef", "vlmo"], default="albef")
    p.add_argument("--config", default=None, help="RunConfig json/yaml")
    p.add_argument("--named-config", nargs="*", default=[],
                   help="sacred named-config presets composed left-to-right "
                        "(the reference's `run.py with <names>` line, e.g. "
                        "task_finetune_vqa_base_image480); sets the VLMo "
                        "geometry via vqattack_tpu.named_configs")
    p.add_argument("--vocab", required=False, help="WordPiece vocab.txt")
    p.add_argument("--surrogate-ckpt", default=None)
    p.add_argument("--victim-ckpt", default=None)
    p.add_argument("--bert-mlm", default=None, help="HF dir for candidate MLM")
    p.add_argument("--use-path", default=None, help="TF-hub USE dir (similarity gate)")
    p.add_argument("--ann", nargs="*", default=[], help="VQA annotation json(s)")
    p.add_argument("--image-root", default="")
    p.add_argument("--answer-list", default=None)
    p.add_argument("--arrow", nargs="*", default=[], help="VLMo arrow tables")
    p.add_argument("--id2answer", default=None)
    p.add_argument("--right-part", nargs="*", default=[])
    p.add_argument("--surrogate-ans", nargs="*", default=[])
    p.add_argument("--target-ans", nargs="*", default=[])
    p.add_argument("--paraphrases", nargs="*", default=[])
    p.add_argument("--all-correct", nargs="*", default=[])
    p.add_argument("--output", default="attack_out")
    p.add_argument("--answer-max-len", type=int, default=16,
                   help="token budget for answer-list tokenization (the "
                        "reference pads to the longest answer)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--no-pallas", action="store_true",
        help="(kept for compatibility; the Pallas update kernel is now "
             "off by default — see --pallas-update)",
    )
    p.add_argument(
        "--pallas-update", action="store_true",
        help="run the PGD update as the fused Pallas kernel instead of "
             "letting XLA fuse it. Measured SLOWER at every production "
             "config (the kernel's (rows,128) operand layout forces "
             "per-iteration copies of the [B,480,480,3] gradient out of "
             "its producing fusion: -8%% at b=16 bf16 — PERF.md profile "
             "section); kept for A/B and for chips where the trade flips",
    )
    p.add_argument(
        "--no-remat", action="store_true",
        help="disable trunk rematerialization: faster at --batch-size >= 8 "
             "in f32 (+15%% measured), slower at batch 1 (PERF.md remat A/B)",
    )
    p.add_argument(
        "--remat-scores", action="store_true",
        help="selective rematerialization: store every O(S*D) activation but "
             "recompute the [B,H,S,S] attention scores/probs in backward — "
             "the middle point between full remat and --no-remat (PERF.md); "
             "implies --no-remat for the trunk blocks",
    )
    p.add_argument(
        "--softmax-dtype", choices=["float32", "bfloat16"], default=None,
        help="dtype of the softmax pipeline over the attention scores "
             "(default float32 = reference bit parity; bfloat16 halves the "
             "score-tensor bytes, ~1/3 of the attack program — "
             "trajectory-drift validated, PERF.md round 3)",
    )
    p.add_argument(
        "--tap-dtype", choices=["float32", "bfloat16"], default=None,
        help="storage dtype of the clean feature-target stacks the loss "
             "reads every iteration (default float32 = reference parity; "
             "bfloat16 halves that HBM stream — the config.py tap_dtype "
             "byte-reduction lever, trajectory-drift gated)",
    )
    pgd_mode = p.add_mutually_exclusive_group()
    pgd_mode.add_argument(
        "--dynamic-pgd", action="store_true",
        help="trace the PGD trip count + rand-init flag: one compiled "
             "program per (algorithm, batch shape) serves every block "
             "schedule instead of one per distinct block length — collapses "
             "the sweep's compile lattice on a realistic k-distribution; "
             "PRODUCTION DEFAULT since round 4 (measured steady-state "
             "parity, PERF.md round 4); trajectories bit-match "
             "scan_unroll=1.  Kept as an explicit flag for configs whose "
             "presets set dynamic_pgd=False",
    )
    pgd_mode.add_argument(
        "--static-pgd", action="store_true",
        help="opt back into the static-scan program lattice (the "
             "pre-round-4 execution shape; wins ~5%% steady-state at "
             "batch 1 only — PERF.md round 4)",
    )
    fuse_mode = p.add_mutually_exclusive_group()
    fuse_mode.add_argument(
        "--fused-block", action="store_true",
        help="fuse each per-block device program (clean targets inside "
             "block 0, VL joint step at block end) — one dispatch per "
             "block instead of 3-4; default ON under --dynamic-pgd "
             "(config fused_block)",
    )
    fuse_mode.add_argument(
        "--no-fused-block", action="store_true",
        help="opt back into the separate clean-targets / PGD / embed / "
             "VL-step dispatches (the round-4 execution shape) for A/B",
    )
    p.add_argument(
        "--dtype", choices=["float32", "bfloat16"], default=None,
        help="surrogate trunk compute dtype (default: config compute_dtype, "
             "float32). bfloat16 + --no-remat + --batch-size 8 is the fastest "
             "measured sweep configuration (0.36 s/pair, PERF.md); losses and "
             "the perturbation update stay f32 either way",
    )
    p.add_argument(
        "--attn", choices=["xla", "flash"], default="xla",
        help="attention backend for every model forward/backward: XLA einsum "
             "or the Pallas flash kernel (ops/attention.py; PERF.md A/Bs)",
    )
    p.add_argument(
        "--batch-size", type=int, default=1,
        help=">1 runs same-schedule samples in lockstep batches "
             "(attacks/batched.py) instead of the reference's one-at-a-time loop",
    )
    p.add_argument(
        "--mesh-devices", type=int, default=0,
        help="shard lockstep batches over a data mesh of this many devices "
             "(0 = no mesh; requires --batch-size divisible by it)",
    )
    p.add_argument(
        "--buffer-factor", type=int, default=16,
        help="buffer this many batches of samples before bucketing+flushing "
             "to the lockstep engine. Samples bucket by (old_alg, k) — with "
             "~10 distinct bucket keys in real VQA questions, a small buffer "
             "leaves buckets mostly padding (a 4x buffer averaged ~3 real "
             "samples per batch-8 bucket, >2x chip-time waste); 16x fills "
             "them. Costs host RAM (~2.8 MB/sample at 480px) and delays the "
             "first result; lower it for small --limit smoke runs",
    )
    p.add_argument(
        "--pipeline-depth", type=int, default=4,
        help="overlap this many independent buckets: one bucket's host-side "
             "text work runs while the next bucket's PGD scans occupy the "
             "chip (attacks/batched.py::run). Results are order- and "
             "bit-identical to depth 1; set 1 to serialize.  Default chosen "
             "from the round-5 A/B on the 256-sample realistic sweep "
             "(process wall 898/752/705 s at depth 1/2/4 — PERF.md)",
    )
    p.add_argument(
        "--resume", action="store_true",
        help="skip qids whose adversarial artifact already exists in --output "
             "(the qid-keyed layout makes the sweep trivially resumable, "
             "SURVEY §5.4)",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize(); each process attacks "
             "its round-robin shard of the qid stream and writes its own "
             "artifacts (host-0 merge is a directory union — SURVEY §5.8)",
    )
    p.add_argument(
        "--bert-threshold", type=float, default=None,
        help="operating point for the default BertMeanPoolGate (its own "
             "score space; default text/similarity.py::BERT_SPACE_DEFAULT). "
             "Calibrate with --calibrate-gate, then pass the suggested value "
             "here (docs/GATES.md)",
    )
    p.add_argument(
        "--calibrate-gate", action="store_true",
        help="before the sweep, print the similarity gate's score profile "
             "over the dataset questions and a suggested threshold "
             "(docs/GATES.md; vqattack_tpu.text.calibrate)",
    )
    return p


def resolve_config(args):
    """Pick the run config: explicit --config wins, otherwise the pipeline's
    attack preset (vlmo remat differs from albef's); apply the seed/output
    and --no-remat overrides (remat-on wins at batch 1, remat-off at
    batch>=8 f32 — PERF.md's genuine A/B)."""
    import dataclasses

    from vqattack_tpu import config as cfg_mod

    if args.config:
        cfg = cfg_mod.load_config(args.config)
    elif args.pipeline == "vlmo":
        cfg = cfg_mod.vlmo_attack_config()
    else:
        cfg = cfg_mod.albef_attack_config()
    if args.named_config:
        if args.pipeline != "vlmo":
            raise SystemExit(
                "--named-config presets are the VLMo pipeline's sacred "
                "surface; use --config for the ALBEF pipeline")
        from vqattack_tpu.named_configs import (
            vlmo_config_from_named,
            vlmo_named_config,
        )

        named = vlmo_named_config(*args.named_config)
        vlmo = dataclasses.replace(
            vlmo_config_from_named(named),
            remat=cfg.vlmo.remat,
            remat_scores=cfg.vlmo.remat_scores,
        )
        cfg = dataclasses.replace(
            cfg,
            vlmo=vlmo,
            data=dataclasses.replace(
                cfg.data, image_size=vlmo.image_size
            ),
        )
    cfg = dataclasses.replace(cfg, output_dir=args.output)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if getattr(args, "no_remat", False) or getattr(args, "remat_scores", False):
        scores = bool(getattr(args, "remat_scores", False))
        cfg = dataclasses.replace(
            cfg,
            albef=dataclasses.replace(
                cfg.albef,
                vit=dataclasses.replace(
                    cfg.albef.vit, remat=False, remat_scores=scores
                ),
                bert=dataclasses.replace(
                    cfg.albef.bert, remat=False, remat_scores=scores
                ),
            ),
            vlmo=dataclasses.replace(
                cfg.vlmo, remat=False, remat_scores=scores
            ),
        )
    if getattr(args, "dtype", None):
        cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    if getattr(args, "softmax_dtype", None):
        sm = args.softmax_dtype
        cfg = dataclasses.replace(
            cfg,
            albef=dataclasses.replace(
                cfg.albef,
                vit=dataclasses.replace(cfg.albef.vit, softmax_dtype=sm),
                bert=dataclasses.replace(cfg.albef.bert, softmax_dtype=sm),
            ),
            vlmo=dataclasses.replace(cfg.vlmo, softmax_dtype=sm),
        )
    if getattr(args, "dynamic_pgd", False):
        cfg = dataclasses.replace(
            cfg, attack=dataclasses.replace(cfg.attack, dynamic_pgd=True)
        )
    if getattr(args, "static_pgd", False):
        # opt back into the static-scan lattice (reproduces the pre-round-4
        # execution shape; the kernels are bit-identical at scan_unroll=1)
        cfg = dataclasses.replace(
            cfg, attack=dataclasses.replace(cfg.attack, dynamic_pgd=False)
        )
    if getattr(args, "fused_block", False):
        cfg = dataclasses.replace(
            cfg, attack=dataclasses.replace(cfg.attack, fused_block=True)
        )
    if getattr(args, "no_fused_block", False):
        cfg = dataclasses.replace(
            cfg, attack=dataclasses.replace(cfg.attack, fused_block=False)
        )
    if getattr(args, "tap_dtype", None):
        cfg = dataclasses.replace(
            cfg, attack=dataclasses.replace(cfg.attack,
                                            tap_dtype=args.tap_dtype)
        )
    return cfg


def main(argv: Optional[list] = None) -> None:
    args = build_argparser().parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    from vqattack_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    if args.distributed:
        jax.distributed.initialize()
    import jax.numpy as jnp

    from vqattack_tpu import config as cfg_mod
    from vqattack_tpu.attacks.orchestrator import save_artifacts
    from vqattack_tpu.data.side_tables import SideTables
    from vqattack_tpu.data.transforms import test_transform
    from vqattack_tpu.data.vqa import VQADataset
    from vqattack_tpu.eval.metrics import AttackAccuracy
    from vqattack_tpu.text.similarity import make_gate
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer
    from vqattack_tpu.utils.meters import MetricLogger

    cfg = resolve_config(args)

    tokenizer = WordPieceTokenizer.from_file(args.vocab) if args.vocab else None
    assert tokenizer is not None, "--vocab is required for a real run"

    side: Optional[SideTables] = None
    if args.right_part:
        side = SideTables.load(
            args.right_part, args.surrogate_ans, args.target_ans,
            args.paraphrases, args.all_correct,
        )

    use_pallas = (
        getattr(args, "pallas_update", False)
        and not args.no_pallas
        and jax.default_backend() != "cpu"
    )
    if args.attn != "xla":
        from vqattack_tpu.ops.attention import set_impl

        set_impl(args.attn)
    pipeline = _build_pipeline(args, cfg, tokenizer, use_pallas)

    # dataset
    if args.pipeline == "vlmo" and args.arrow:
        from vqattack_tpu.data.arrow import VQAv2ArrowDataset

        dataset = VQAv2ArrowDataset(args.arrow, test_transform(cfg.data.image_size))
        answer_list = []
    else:
        dataset = VQADataset(
            args.ann, args.image_root, test_transform(cfg.data.image_size),
            split="test", answer_list=args.answer_list,
        )
        answer_list = dataset.answer_list

    if args.calibrate_gate:
        from vqattack_tpu.text.calibrate import gate_score_profile, suggest_threshold

        questions = [dataset[i]["question"] for i in range(min(len(dataset), 64))]
        profile = gate_score_profile(pipeline.gate, questions)
        print(profile.table())
        try:
            print(f"suggested threshold: {suggest_threshold(profile):.4f}")
        except (KeyError, IndexError, ValueError):
            print("suggested threshold: n/a (not enough probe data)")

    answer_ids = answer_mask = None
    if args.pipeline == "albef":
        if not answer_list:
            raise SystemExit(
                "--answer-list is required for --pipeline albef: the ALBEF "
                "victim ranks a fixed candidate-answer list (rank_answer, "
                "model_vqa.py:149); without it the black-box eval loop has "
                "nothing to score"
            )
        ids, mask = tokenizer.encode_batch(
            [a + "[SEP]" for a in answer_list], max_length=args.answer_max_len
        )
        answer_ids, answer_mask = jnp.asarray(ids), jnp.asarray(mask)

    flip = AttackAccuracy(print_every=50)
    logger = MetricLogger()
    results, pending = [], []
    rng = jax.random.key(cfg.seed)
    n_done = 0

    batched = None
    sample_buffer: list = []
    if args.batch_size > 1:
        mesh = None
        if args.mesh_devices:
            from vqattack_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(args.mesh_devices)
        if args.pipeline == "albef":
            from vqattack_tpu.attacks.batched import BatchedAlbefAttack

            batched = BatchedAlbefAttack(pipeline, mesh=mesh)
        else:
            from vqattack_tpu.attacks.batched import BatchedVlmoAttack

            batched = BatchedVlmoAttack(pipeline, mesh=mesh)

    def eval_pending():
        nonlocal pending
        # ONE batched victim decode for the whole pending window (the
        # reference — and the per-sample evaluate_victim — pays a batch-1
        # forward per sample at the eval cadence)
        todo = [(r, inf["surrogate_answer"]) for r, inf in pending
                if inf.get("surrogate_answer") is not None]
        # chunk cap 16 (same as transfer_eval): ALBEF rank_answer's second
        # pass materializes batch*k decoder rows, so an unbounded window
        # (eval_every + a whole flushed bucket) could OOM the chip
        for start in range(0, len(todo), 16):
            chunk = todo[start : start + 16]
            images = [r.adv_image for r, _ in chunk]
            texts = [r.adv_text for r, _ in chunk]
            if args.pipeline == "albef" and answer_ids is not None:
                topk_ids, _ = pipeline.evaluate_victim_batch(
                    images, texts, answer_ids, answer_mask
                )
                preds = [answer_list[int(row[0])] for row in np.asarray(topk_ids)]
            else:
                preds = [a for _, a in pipeline.evaluate_victim_batch(images, texts)]
            for (_, clean_answer), pred in zip(chunk, preds):
                flip.update(pred, clean_answer)
                flip.maybe_log()
        pending = []

    def flush_buffer():
        nonlocal n_done
        if not sample_buffer:
            return
        t0 = time.time()
        from vqattack_tpu.utils.retry import with_retries

        out = with_retries(
            lambda: batched.run(
                sample_buffer, batch_size=args.batch_size, rng=rng,
                pipeline_depth=args.pipeline_depth,
            )
        )
        dt = (time.time() - t0) / max(1, len(out))
        by_qid = {s["qid"]: s["_info"] for s in sample_buffer}
        logger.update(bucket_occupancy=batched.last_occupancy)
        for r in out:
            logger.update(attack_s=dt, blocks=r.num_blocks)
            results.append(r)
            pending.append((r, by_qid[r.qid]))
            n_done += 1
        sample_buffer.clear()
        if len(pending) >= cfg.eval_every:
            eval_pending()

    n_seen = 0
    for item in logger.log_every(dataset.iter_batches(), 50, "attack:"):
        qid = item["qid"]
        n_seen += 1
        # multi-host: round-robin shard of the sample stream per process
        if jax.process_count() > 1 and (n_seen - 1) % jax.process_count() != jax.process_index():
            continue
        info = side.attack_inputs(qid) if side else {
            "paraphrase": None, "target_answer": None,
            "all_correct_answers": [], "surrogate_answer": None,
        }
        if info is None:
            continue  # not in the attack subset
        # reference alignment guard (adv_attack.py:416-427; the VLMo
        # test_step's identical vqa_scores check, vlmo_module.py:1735-1741):
        # the stored surrogate answer must be a max-weight ground-truth
        # answer for this question, else the sample is skipped, not attacked
        if side and item.get("answers"):
            answers = item["answers"]
            # ALBEF json items carry weights, VLMo arrow items carry
            # answer_scores; without either, uniform weights degrade the
            # guard to the membership check (never silently skipped)
            w = (item.get("weights") or item.get("answer_scores")
                 or [1.0] * len(answers))
            if not side.alignment_ok(qid, answers, w):
                logger.update(not_aligned=1)
                continue
        if args.resume and os.path.exists(os.path.join(args.output, f"{qid}.npy")):
            continue  # already attacked in a previous run
        if batched is not None:
            sample_buffer.append({
                "qid": str(qid), "pixels": item["pixels"],
                "question": item["question"],
                "paraphrase": info["paraphrase"],
                "target_answer": info["target_answer"],
                "all_correct_answers": info["all_correct_answers"],
                "_info": info,
            })
            if len(sample_buffer) >= args.buffer_factor * args.batch_size:
                flush_buffer()
            if args.limit and n_done + len(sample_buffer) >= args.limit:
                flush_buffer()
                break
            continue
        t0 = time.time()
        from vqattack_tpu.utils.retry import with_retries

        res = with_retries(lambda: pipeline.attack_sample(
            item["pixels"], item["question"], str(qid),
            info["paraphrase"], info["target_answer"],
            info["all_correct_answers"], rng=rng,
        ))
        logger.update(attack_s=time.time() - t0, blocks=res.num_blocks)
        results.append(res)
        pending.append((res, info))
        n_done += 1

        if len(pending) >= cfg.eval_every:
            eval_pending()

        if args.limit and n_done >= args.limit:
            break

    if batched is not None:
        flush_buffer()
    eval_pending()
    save_artifacts(results, args.output)
    summary = {
        "samples": n_done,
        "attack_accuracy": flip.value,
    }
    if not args.victim_ckpt:
        # guard against a synthetic flip rate being quoted as ASR evidence
        # (VERDICT r4 missing #4): a random-weight victim flips on ~every
        # sample, so the number above is meaningless as attack evidence
        summary["attack_accuracy_note"] = (
            "synthetic random-weight victim (no --victim-ckpt): flips are "
            "meaningless as ASR evidence — this run is perf/occupancy "
            "evidence only; ASR parity stays asset-gated (pytest -m assets)"
        )
    summary.update({
        "mean_attack_s": logger.meters["attack_s"].global_avg if n_done else 0,
        # windowed tail mean (last 20 samples): the MARGINAL steady-state
        # s/pair once the per-process program lattice is resident — the
        # number a long sweep converges to (VERDICT r3 weak #2)
        "tail_mean_attack_s": logger.meters["attack_s"].avg if n_done else 0,
        "output": args.output,
    })
    if batched is not None and "bucket_occupancy" in logger.meters:
        # realized rows/padded-rows across all dispatched buckets — the
        # steady-state padding tax on a real question/k distribution
        summary["bucket_occupancy"] = logger.meters["bucket_occupancy"].global_avg
    if batched is not None and batched._timer.enabled and batched._timer.acc:
        summary["phase_s"] = {
            k: round(v, 2) for k, v in sorted(
                batched._timer.acc.items(), key=lambda kv: -kv[1])
        }
    print(json.dumps(summary))


def _build_pipeline(args, cfg, tokenizer, use_pallas):
    import jax
    import jax.numpy as jnp

    from vqattack_tpu.checkpoint import io as ckpt_io
    from vqattack_tpu.models.bert import FusionBert
    from vqattack_tpu.text.similarity import make_gate
    import dataclasses

    # candidate-generation MLM (bert-base); random init if no weights given
    mlm_cfg = dataclasses.replace(
        cfg.albef.bert, fusion_layer=cfg.albef.bert.num_layers
    )
    mlm_model = FusionBert(mlm_cfg, with_mlm_head=True)
    if args.bert_mlm:
        mlm_params = ckpt_io.load_hf_bert_mlm(args.bert_mlm)
    else:
        ids = jnp.ones((1, 8), jnp.int32)
        mlm_params = jax.jit(lambda k: mlm_model.init(k, ids, jnp.ones_like(ids)))(
            jax.random.key(1)
        )

    # surrogate trunk dtype (cfg.compute_dtype / --dtype); the victim and
    # every loss/softmax/update stay f32 — the validated mixed policy
    # (tests/test_remat.py, PERF.md "bf16 trunk")
    sdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    if args.pipeline == "albef":
        from vqattack_tpu.attacks.orchestrator import AlbefAttackPipeline
        from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA

        surrogate = AlbefPretrain(cfg.albef, dtype=sdtype)
        victim = AlbefVQA(cfg.albef)
        size = cfg.albef.vit.image_size
        if args.surrogate_ckpt:
            sparams = ckpt_io.load_albef_pretrain(args.surrogate_ckpt, size)
        else:
            px = jnp.zeros((1, size, size, 3))
            ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
            sparams = jax.jit(
                lambda k: surrogate.init(
                    k, px, ids, jnp.ones_like(ids), method=AlbefPretrain.init_all
                )
            )(jax.random.key(0))
        if args.victim_ckpt:
            vparams = ckpt_io.load_albef_vqa(args.victim_ckpt, size)
        else:
            # random-init victim keeps the black-box eval loop exercisable in
            # smoke runs; real sweeps pass --victim-ckpt
            px = jnp.zeros((1, size, size, 3))
            ids = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
            a_ids = jnp.ones((2, 4), jnp.int32)
            vparams = jax.jit(
                lambda k: victim.init(
                    k, px, ids, jnp.ones_like(ids), a_ids, jnp.ones_like(a_ids), 2
                )
            )(jax.random.key(3))
        gate = _make_gate_from_args(args, surrogate, sparams, tokenizer, cfg)
        return AlbefAttackPipeline(
            cfg, surrogate, sparams, tokenizer, gate,
            victim=victim, victim_params=vparams,
            mlm_model=mlm_model, mlm_params=mlm_params, use_pallas=use_pallas,
        )

    from vqattack_tpu.attacks.vlmo_orchestrator import (
        VlmoAttackPipeline,
        load_id2answer,
    )
    from vqattack_tpu.models.vlmo import VLMo

    model = VLMo(cfg.vlmo, dtype=sdtype)
    size = cfg.vlmo.image_size
    if args.surrogate_ckpt:
        sparams = ckpt_io.load_vlmo(args.surrogate_ckpt, size, src_image_size=224)
    else:
        px = jnp.zeros((1, size, size, 3))
        ids = jnp.ones((1, cfg.vlmo.max_text_len), jnp.int32)
        sparams = jax.jit(
            lambda k: model.init(k, ids, jnp.ones_like(ids), px, method=VLMo.init_all)
        )(jax.random.key(0))
    vparams = ckpt_io.load_vlmo(args.victim_ckpt, size) if args.victim_ckpt else sparams
    id2answer = load_id2answer(args.id2answer) if args.id2answer else {}
    gate = _make_gate_from_args(args, model, sparams, tokenizer, cfg, vlmo=True)
    return VlmoAttackPipeline(
        cfg, model, sparams, vparams, tokenizer, gate,
        mlm_model=mlm_model, mlm_params=mlm_params,
        id2answer=id2answer, use_pallas=use_pallas,
    )


def _make_gate_from_args(args, model, params, tokenizer, cfg, vlmo=False):
    import jax

    from vqattack_tpu.text.similarity import make_gate

    if args.use_path:
        return make_gate("use", use_path=args.use_path)
    # NB: params must travel as a jit ARGUMENT, not a closure capture — a
    # captured param tree gets baked into the executable as constants
    # (~700 MB serialized for the full surrogate), bloating the compile
    # cache and stalling every warm process start on executable upload.
    if vlmo:
        from vqattack_tpu.models.vlmo import VLMo

        _embed = jax.jit(
            lambda v, ids, mask: model.apply(
                v, ids, mask, method=VLMo.infer_text
            )["text_feats"]
        )
        max_len = cfg.vlmo.max_text_len
    else:
        _embed = jax.jit(
            lambda v, ids, mask: model.apply(v, ids, mask, method=_albef_text_tower)
        )
        max_len = cfg.attack.max_text_len
    embed_fn = lambda ids, mask: _embed(params, ids, mask)
    kw = {}
    if getattr(args, "bert_threshold", None) is not None:
        kw["bert_threshold"] = args.bert_threshold
    return make_gate("bert", embed_fn=embed_fn, tokenizer=tokenizer,
                     max_length=max_len, **kw)


def _albef_text_tower(module, ids, mask):
    """Text-only tower of the ALBEF surrogate (for the similarity gate):
    last hidden states of the BERT text layers."""
    last, _, _ = module.text_encoder(ids, attention_mask=mask, mode="text")
    return last


if __name__ == "__main__":
    main()
