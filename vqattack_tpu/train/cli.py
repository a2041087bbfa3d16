"""Training driver CLI — the reference's task scripts
(``Pretrain.py``/``VQA.py::train``/``Retrieval.py``/``VE.py``/``NLVR.py`` and
VLMo's ``run.py`` fit path) as one SPMD loop::

    python -m vqattack_tpu.train.cli --task albef_pretrain \
        --config configs/albef_attack.json --vocab vocab.txt \
        --ann train.json --image-root images/ \
        --steps 1000 --batch-size 32 --ckpt-dir ckpts

Tasks: ``albef_pretrain`` (ITA+ITM+MLM, optional EMA distillation),
``albef_vqa`` (weighted answer NLL), ``retrieval`` (identity-aware ITA +
hard-neg ITM), ``ve`` / ``nlvr2`` (classifier CE), ``vlmo_vqa`` (BCE over the
3,129-label space).  The loop: threaded host data pipeline -> jitted train
step (GSPMD over the data mesh) -> metric meters -> periodic orbax
checkpoints with latest-restore resume.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native training loop")
    p.add_argument("--task", required=True,
                   choices=["albef_pretrain", "albef_vqa", "retrieval",
                            "ve", "nlvr2", "vlmo_vqa", "vlmo_irtr",
                            "vlmo_textmlm", "vlmo_pretrain", "vlmo_nlvr2"])
    p.add_argument("--preset", nargs="*", default=[],
                   help="sacred named-config presets composed left-to-right "
                        "(vqattack_tpu.named_configs, e.g. "
                        "task_finetune_vqa_base_image480 step200k); supplies "
                        "VLMo geometry + lr/weight-decay/warmup/mlm-prob/"
                        "image-size defaults, explicit flags win")
    p.add_argument("--config", default=None)
    p.add_argument("--vocab", required=True)
    p.add_argument("--ann", nargs="+", default=[])
    p.add_argument("--image-root", default="")
    p.add_argument("--arrow-root", default=None,
                   help="pretraining arrow directory (data/pretrain_writers "
                        "outputs or the reference's make_arrow outputs)")
    p.add_argument("--arrow-datasets", nargs="+", default=None,
                   help="corpora to concat from --arrow-root: coco f30k gcc "
                        "sbu vg wikibk nlvr2 (default picked per task)")
    p.add_argument("--answer-list", default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--weight-decay", type=float, default=0.02)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--schedule", default="cosine")
    p.add_argument("--opt", default="adamw")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--init-ckpt", default=None, help="torch ckpt to start from")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-answers", type=int, default=4)
    p.add_argument("--mlm-prob", type=float, default=0.15)
    p.add_argument("--image-size", type=int, default=None,
                   help="override config image size (e.g. 224 for pretrain)")
    return p


def _batches(dataset, batch_size: int, seed: int) -> Iterator[list]:
    if len(dataset) < batch_size:
        # the drop-last epoch loop below would yield nothing and spin forever
        raise ValueError(
            f"dataset has {len(dataset)} items < batch size {batch_size}; "
            "lower --batch-size"
        )
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            yield [dataset[int(j)] for j in order[i : i + batch_size]]


def apply_preset(parser: argparse.ArgumentParser, args) -> dict | None:
    """Resolve ``--preset`` named configs and fill in hyperparameter
    defaults (explicit flags win); returns the resolved named-config dict
    (None without --preset)."""
    if not args.preset:
        return None
    from vqattack_tpu.named_configs import (
        train_settings_from_named,
        vlmo_named_config,
    )

    preset = vlmo_named_config(*args.preset)
    s = train_settings_from_named(preset)

    def _default(name, val):
        if getattr(args, name) == parser.get_default(name):
            setattr(args, name, val)

    _default("lr", s["learning_rate"])
    _default("weight_decay", s["weight_decay"])
    _default("mlm_prob", s["mlm_prob"])
    _default("image_size", int(preset["image_size"]))
    warm = s["warmup_steps"]
    if isinstance(warm, float) and warm < 1:  # sacred fraction-of-steps
        warm = int(warm * (s["max_steps"] or args.steps))
    _default("warmup_steps", int(warm))
    if args.arrow_root:
        _default("arrow_datasets", list(s["datasets"]))
    return preset


def pretrain_loss_weights(preset: dict) -> dict:
    """loss_names -> vlmo_pretrain_loss weights for --task vlmo_pretrain.

    Zero weights are kept (not dropped): ``vlmo_pretrain_loss``'s ``w > 0``
    guards skip the disabled terms, whereas dropping them would let the 1.0
    defaults silently re-enable them — a different objective than the preset
    specifies.  Raises ``SystemExit`` when the preset enables none of
    mlm/itc/itm."""
    weights = {
        k: float(v) for k, v in preset["loss_names"].items()
        if k in ("mlm", "itc", "itm")
    }
    if not any(weights.values()):
        raise SystemExit(
            "preset enables none of mlm/itc/itm "
            f"(loss_names={preset['loss_names']}); pick one of the "
            "mlm_itm_itc presets for --task vlmo_pretrain")
    return weights


def main(argv=None) -> None:
    parser = build_argparser()
    args = parser.parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    preset = apply_preset(parser, args)

    import dataclasses

    from vqattack_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from vqattack_tpu import config as cfg_mod
    from vqattack_tpu.checkpoint.io import (
        restore_latest_train_state,
        save_train_state,
    )
    from vqattack_tpu.data.collators import mlm_collate
    from vqattack_tpu.data.transforms import train_transform
    from vqattack_tpu.data.vqa import VQADataset
    from vqattack_tpu.models.albef import AlbefPretrain, AlbefVQA
    from vqattack_tpu.models.albef_tasks import AlbefNLVR, AlbefRetrieval, AlbefVE
    from vqattack_tpu.models.vlmo import VLMo
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer
    from vqattack_tpu.train import objectives as obj
    from vqattack_tpu.train.optim import create_optimizer, create_schedule
    from vqattack_tpu.train.trainer import create_train_state, make_train_step
    from vqattack_tpu.utils.meters import MetricLogger

    cfg = cfg_mod.load_config(args.config) if args.config else cfg_mod.albef_attack_config()
    if preset is not None:
        from vqattack_tpu.named_configs import vlmo_config_from_named

        cfg = dataclasses.replace(cfg, vlmo=vlmo_config_from_named(preset))
    if args.image_size:
        albef = cfg.albef
        albef = dataclasses.replace(
            albef, vit=dataclasses.replace(albef.vit, image_size=args.image_size)
        )
        cfg = dataclasses.replace(
            cfg, albef=albef,
            vlmo=dataclasses.replace(cfg.vlmo, image_size=args.image_size),
            data=dataclasses.replace(cfg.data, image_size=args.image_size),
        )
    tok = WordPieceTokenizer.from_file(args.vocab)
    size = cfg.data.image_size
    max_len = cfg.attack.max_text_len

    split = "train"
    if args.arrow_root:
        # the VLMo pretraining data family (SURVEY §2.2 datasets/writers)
        from vqattack_tpu.data.pretrain_datasets import (
            ConcatDataset,
            make_pretrain_dataset,
        )

        default_corpora = {
            "vlmo_textmlm": ["wikibk"],
            "nlvr2": ["nlvr2"],
            "vlmo_nlvr2": ["nlvr2"],
        }.get(args.task, ["coco", "f30k", "gcc", "sbu", "vg"])
        names = args.arrow_datasets or default_corpora
        parts = []
        for n in names:
            try:
                parts.append(
                    make_pretrain_dataset(n, args.arrow_root,
                                          train_transform(size), split=split)
                )
            except FileNotFoundError:
                pass  # corpora not materialized in this arrow dir are skipped
        assert parts, f"no arrow corpora from {names} under {args.arrow_root}"
        dataset = ConcatDataset(parts) if len(parts) > 1 else parts[0]
    else:
        assert args.ann and args.image_root, "--ann/--image-root or --arrow-root"
        dataset = VQADataset(
            args.ann, args.image_root, train_transform(size), split=split,
            answer_list=args.answer_list,
        )

    # ----------------------------------------------------------- model/loss
    rng_np = np.random.default_rng(args.seed)
    px0 = jnp.zeros((args.batch_size, size, size, 3))
    ids0 = jnp.ones((args.batch_size, max_len), jnp.int32)
    m0 = jnp.ones_like(ids0)

    if args.task == "albef_pretrain":
        model = AlbefPretrain(cfg.albef)
        params = jax.jit(
            lambda k: model.init(k, px0, ids0, m0, method=AlbefPretrain.init_all)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            return obj.albef_pretrain_loss(model, p, batch, key)

        def collate(items):
            texts = [i.get("question", "") for i in items]
            c = mlm_collate(texts, tok, max_len, args.mlm_prob, rng=rng_np)
            return {
                "pixels": jnp.asarray(np.concatenate([i["pixels"] for i in items])),
                "text_ids": jnp.asarray(c["text_ids"]),
                "text_mask": jnp.asarray(c["text_masks"]),
                "mlm_ids": jnp.asarray(c["text_ids_mlm"]),
                "mlm_labels": jnp.asarray(c["text_labels_mlm"]),
            }

    elif args.task == "albef_vqa":
        model = AlbefVQA(cfg.albef)
        a0 = jnp.ones((2, 4), jnp.int32)
        params = jax.jit(
            lambda k: model.init(k, px0, ids0, m0, a0, jnp.ones_like(a0), 2)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            del key
            return obj.albef_vqa_train_loss(model, p, batch)

        def collate(items):
            texts = [i.get("question", "") for i in items]
            ids, mask = tok.encode_batch(texts, max_len)
            a = args.max_answers
            ans_ids = np.zeros((len(items), a, 8), np.int32)
            ans_mask = np.zeros((len(items), a, 8), np.int32)
            weights = np.zeros((len(items), a), np.float32)
            for b, item in enumerate(items):
                for j, (ans, w) in enumerate(
                    zip(item.get("answers", []), item.get("weights", []))
                ):
                    if j >= a:
                        break
                    ai, am = tok.encode(ans, 8)
                    ans_ids[b, j], ans_mask[b, j] = ai, am
                    weights[b, j] = w
            return {
                "pixels": jnp.asarray(np.concatenate([i["pixels"] for i in items])),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
                "answer_ids": jnp.asarray(ans_ids),
                "answer_mask": jnp.asarray(ans_mask),
                "answer_weights": jnp.asarray(weights),
            }

    elif args.task == "retrieval":
        model = AlbefRetrieval(cfg.albef)
        params = jax.jit(model.init)(jax.random.key(args.seed), px0, ids0, m0)

        def loss_fn(p, batch, key):
            return obj.retrieval_train_loss(model, p, batch, key)

        def collate(items):
            texts = [i.get("question", "") for i in items]
            ids, mask = tok.encode_batch(texts, max_len)
            # image-identity indices: same-image rows are positives for the
            # ITA loss (grounding_dataset.py:17-24 / model_retrieval idx);
            # positional fallback for sources without an image-id notion
            idx = np.asarray(
                [i.get("img_idx", n) for n, i in enumerate(items)]
            )
            return {
                "pixels": jnp.asarray(np.concatenate([i["pixels"] for i in items])),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
                "idx": jnp.asarray(idx),
            }

    elif args.task in ("ve", "nlvr2"):
        n_cls = 3 if args.task == "ve" else 2
        if args.task == "ve":
            model = AlbefVE(cfg.albef)
            params = jax.jit(model.init)(jax.random.key(args.seed), px0, ids0, m0)
        else:
            model = AlbefNLVR(cfg.albef)
            params = jax.jit(model.init)(
                jax.random.key(args.seed),
                jnp.concatenate([px0, px0]), ids0, m0,
            )

        def loss_fn(p, batch, key):
            del key
            logits = model.apply(p, batch["pixels"], batch["text_ids"], batch["text_mask"])
            loss = obj.nlvr2_loss(logits, batch["labels"])
            return loss, {"loss": loss}

        def collate(items):
            texts = [i.get("question", "") for i in items]
            ids, mask = tok.encode_batch(texts, max_len)
            if args.task == "nlvr2" and "pixels0" in items[0]:
                # real paired streams (NLVR2Dataset over nlvr2_*.arrow)
                px = np.concatenate(
                    [np.concatenate([i["pixels0"] for i in items]),
                     np.concatenate([i["pixels1"] for i in items])]
                )
            else:
                px = np.concatenate([i["pixels"] for i in items])
                if args.task == "nlvr2":
                    px = np.concatenate([px, px])  # second image stream
            labels = np.asarray([int(i.get("label", 0)) % n_cls for i in items])
            return {
                "pixels": jnp.asarray(px),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
                "labels": jnp.asarray(labels),
            }

    elif args.task == "vlmo_nlvr2":
        # VLMo NLVR2 fine-tuning (the reference's task_finetune_nlvr2_*
        # presets: objectives.compute_nlvr2:416-475 — the statement encoded
        # with each image at token types 1/2, pooled pair concatenated into
        # the 2-way head)
        vcfg = dataclasses.replace(
            cfg.vlmo, type_vocab_size=max(3, cfg.vlmo.type_vocab_size))
        model = VLMo(vcfg, with_nlvr2_head=True)
        ids0v = jnp.ones((args.batch_size, vcfg.max_text_len), jnp.int32)
        params = jax.jit(
            lambda k: model.init(k, ids0v, jnp.ones_like(ids0v), px0, method=VLMo.init_all)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            del key
            logits = model.apply(
                p, batch["pixels1"], batch["pixels2"],
                batch["text_ids"], batch["text_mask"],
                method=VLMo.nlvr2_logits,
            )
            loss = obj.nlvr2_loss(logits, batch["labels"])
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32))
            return loss, {"loss": loss, "nlvr2_acc": acc}

        def collate(items):
            texts = [i.get("question", "") for i in items]
            ids, mask = tok.encode_batch(texts, vcfg.max_text_len)
            if "pixels0" in items[0]:
                # real paired streams (NLVR2Dataset over nlvr2_*.arrow)
                p1 = np.concatenate([i["pixels0"] for i in items])
                p2 = np.concatenate([i["pixels1"] for i in items])
            else:
                p1 = p2 = np.concatenate([i["pixels"] for i in items])
            labels = np.asarray([int(i.get("label", 0)) % 2 for i in items])
            return {
                "pixels1": jnp.asarray(p1), "pixels2": jnp.asarray(p2),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
                "labels": jnp.asarray(labels),
            }

    elif args.task == "vlmo_textmlm":
        # text-only MLM stage (the reference's textmlm loss_names preset:
        # vlffn disabled, text expert trained — objectives.compute_textonly_mlm)
        model = VLMo(cfg.vlmo)
        ids0v = jnp.ones((args.batch_size, cfg.vlmo.max_text_len), jnp.int32)
        params = jax.jit(
            lambda k: model.init(k, ids0v, jnp.ones_like(ids0v), px0, method=VLMo.init_all)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            del key
            out = model.apply(
                p, batch["mlm_ids"], batch["text_mask"], method=VLMo.infer_text
            )
            loss = obj.masked_lm_loss(out["mlm_logits"], batch["mlm_labels"])
            return loss, {"loss": loss}

        def collate(items):
            texts = [i.get("question", "") for i in items]
            c = mlm_collate(texts, tok, cfg.vlmo.max_text_len, args.mlm_prob,
                            whole_word=True, rng=rng_np)
            return {
                "text_mask": jnp.asarray(c["text_masks"]),
                "mlm_ids": jnp.asarray(c["text_ids_mlm"]),
                "mlm_labels": jnp.asarray(c["text_labels_mlm"]),
            }

    elif args.task == "vlmo_pretrain":
        # multi-loss VL pretraining stage (the reference's mlm_itm_itc
        # presets: objectives compute_mlm + compute_itc incl. the vlffn
        # branch + compute_itm_hardneg)
        loss_weights = None
        whole_word = False
        if preset is not None:
            loss_weights = pretrain_loss_weights(preset)
            whole_word = bool(preset["whole_word_masking"])

        model = VLMo(cfg.vlmo)
        ids0v = jnp.ones((args.batch_size, cfg.vlmo.max_text_len), jnp.int32)
        params = jax.jit(
            lambda k: model.init(k, ids0v, jnp.ones_like(ids0v), px0, method=VLMo.init_all)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            return obj.vlmo_pretrain_loss(model, p, batch, key,
                                          weights=loss_weights)

        def collate(items):
            texts = [i.get("question", "") for i in items]
            c = mlm_collate(texts, tok, cfg.vlmo.max_text_len, args.mlm_prob,
                            whole_word=whole_word, rng=rng_np)
            return {
                "pixels": jnp.asarray(
                    np.concatenate([i["pixels"] for i in items])),
                "text_ids": jnp.asarray(c["text_ids"]),
                "text_mask": jnp.asarray(c["text_masks"]),
                "mlm_ids": jnp.asarray(c["text_ids_mlm"]),
                "mlm_labels": jnp.asarray(c["text_labels_mlm"]),
            }

    elif args.task == "vlmo_irtr":
        model = VLMo(cfg.vlmo)
        ids0v = jnp.ones((args.batch_size, cfg.vlmo.max_text_len), jnp.int32)
        params = jax.jit(
            lambda k: model.init(k, ids0v, jnp.ones_like(ids0v), px0, method=VLMo.init_all)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            return obj.vlmo_irtr_train_loss(model, p, batch, key, num_negs=2)

        def collate(items):
            texts = [i.get("question", "") for i in items]
            ids, mask = tok.encode_batch(texts, cfg.vlmo.max_text_len)
            return {
                "pixels": jnp.asarray(np.concatenate([i["pixels"] for i in items])),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
            }

    else:  # vlmo_vqa
        model = VLMo(cfg.vlmo)
        ids0v = jnp.ones((args.batch_size, cfg.vlmo.max_text_len), jnp.int32)
        params = jax.jit(
            lambda k: model.init(k, ids0v, jnp.ones_like(ids0v), px0, method=VLMo.init_all)
        )(jax.random.key(args.seed))

        def loss_fn(p, batch, key):
            del key
            logits = model.apply(
                p, batch["pixels"], batch["text_ids"], batch["text_mask"],
                method=VLMo.vqa_logits,
            )
            loss = obj.vqa_bce_loss(logits, batch["targets"])
            return loss, {"loss": loss}

        def collate(items):
            texts = [i.get("question", "") for i in items]
            ids, mask = tok.encode_batch(texts, cfg.vlmo.max_text_len)
            targets = np.zeros((len(items), cfg.vlmo.vqa_label_size), np.float32)
            for b, item in enumerate(items):
                for l, s in zip(item.get("answer_labels", []),
                                item.get("answer_scores", [])):
                    targets[b, int(l)] = float(s)
            return {
                "pixels": jnp.asarray(np.concatenate([i["pixels"] for i in items])),
                "text_ids": jnp.asarray(ids), "text_mask": jnp.asarray(mask),
                "targets": jnp.asarray(targets),
            }

    if args.init_ckpt:
        from vqattack_tpu.checkpoint import io as ckpt_io

        if args.task.startswith("albef") or args.task in ("retrieval", "ve", "nlvr2"):
            loaded = ckpt_io.load_albef_pretrain(args.init_ckpt, size)
        else:
            loaded = ckpt_io.load_vlmo(args.init_ckpt, size)
        # graft shared trunks; task heads stay at init
        def merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
                    merge(dst[k], v)
                elif k in dst:
                    dst[k] = v
        merge(params["params"], loaded["params"])

    # ------------------------------------------------------------ optimizer
    sched = create_schedule(args.schedule, args.lr, total_steps=args.steps,
                            warmup_steps=args.warmup_steps)
    tx = create_optimizer(params, args.opt, sched, weight_decay=args.weight_decay)
    state = create_train_state(params, tx)
    resumed_at = None
    if args.ckpt_dir:
        restored = restore_latest_train_state(args.ckpt_dir, state)
        if restored is not None:
            state = restored
            resumed_at = int(state.step)
            print(f"resumed at step {resumed_at}")
    step_fn = make_train_step(loss_fn, tx, donate=False,
                              needs_hessian=(args.opt == "adahessian"))

    logger = MetricLogger()
    key = jax.random.key(args.seed + 1)
    data = _batches(dataset, args.batch_size, args.seed)
    start = int(state.step)
    pending = []  # (step, metrics) awaiting host transfer
    last_saved = None

    def drain():
        # pull metric scalars one step late so the float() device sync never
        # blocks the next batch's host-side collate from overlapping compute
        for s_, m_ in pending:
            logger.update(loss=float(m_["loss"]),
                          grad_norm=float(m_["grad_norm"]),
                          lr=float(sched(s_)))
        pending.clear()

    for step in range(start, args.steps):
        batch = collate(next(data))
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        pending.append((step, metrics))
        if step % args.log_every == 0:
            drain()
            print(f"step {step}: {logger}")
        if args.ckpt_dir and (step + 1) % args.ckpt_every == 0:
            save_train_state(state, args.ckpt_dir, step + 1)
            last_saved = step + 1
    drain()
    # final save — skip when this step is already on disk (the last periodic
    # save, or a resume of an already-finished run: orbax refuses to
    # overwrite an existing step directory)
    if args.ckpt_dir and int(state.step) not in (last_saved, resumed_at):
        save_train_state(state, args.ckpt_dir, int(state.step))
    print(f"done at step {int(state.step)}; final {logger}")


if __name__ == "__main__":
    main()
