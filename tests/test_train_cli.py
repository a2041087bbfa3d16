"""Training CLI smoke tests on a synthetic miniature dataset."""

import dataclasses
import json

import numpy as np
import pytest

from vqattack_tpu import config as cfg_mod
from vqattack_tpu.text.tokenizer import SPECIAL_TOKENS


def _setup(tmp_path, n_images=4):
    pytest.importorskip("PIL")
    from PIL import Image

    words = ["what", "color", "is", "the", "dog", "red", "blue"]
    toks = list(SPECIAL_TOKENS) + words
    for c in "abcdefghijklmnopqrstuvwxyz":
        toks += [c, f"##{c}"]
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(toks) + "\n")

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(n_images):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        ann.append({
            "image": f"{i}.jpg", "question": "what color is the dog",
            "question_id": i, "answer": ["red", "red", "blue"],
            "label": i % 2,
            "answer_labels": [i % 4], "answer_scores": [1.0],
        })
    (tmp_path / "ann.json").write_text(json.dumps(ann))

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=len(toks))
    albef = dataclasses.replace(base.albef, bert=bert)
    vlmo = dataclasses.replace(base.vlmo, vocab_size=len(toks))
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, vlmo=vlmo, data=data)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))
    return vocab, img_dir, cfg_path


@pytest.mark.parametrize("task", ["albef_pretrain", "albef_vqa", "vlmo_vqa"])
def test_train_cli_tasks(tmp_path, task):
    from vqattack_tpu.train.cli import main

    vocab, img_dir, cfg_path = _setup(tmp_path)
    ckpt_dir = tmp_path / "ckpts"
    main([
        "--task", task,
        "--config", str(cfg_path),
        "--vocab", str(vocab),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--steps", "3",
        "--batch-size", "2",
        "--lr", "1e-4",
        "--ckpt-dir", str(ckpt_dir),
        "--ckpt-every", "2",
        "--log-every", "1",
    ])
    from vqattack_tpu.checkpoint.io import find_train_steps

    assert find_train_steps(str(ckpt_dir))

    # resume path: continue to 4 steps from the saved state
    main([
        "--task", task,
        "--config", str(cfg_path),
        "--vocab", str(vocab),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--steps", "4",
        "--batch-size", "2",
        "--ckpt-dir", str(ckpt_dir),
        "--log-every", "1",
    ])
    assert max(find_train_steps(str(ckpt_dir))) >= 4


@pytest.mark.parametrize("task", ["retrieval", "ve", "nlvr2", "vlmo_irtr",
                                  "vlmo_textmlm", "vlmo_pretrain",
                                  "vlmo_nlvr2"])
def test_train_cli_aux_tasks(tmp_path, task):
    from vqattack_tpu.train.cli import main

    vocab, img_dir, cfg_path = _setup(tmp_path)
    main([
        "--task", task,
        "--config", str(cfg_path),
        "--vocab", str(vocab),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--steps", "2",
        "--batch-size", "2",
        "--log-every", "1",
    ])


def test_preset_fills_defaults_but_flags_win():
    """--preset supplies the reference named-config hyperparameters as
    defaults; explicit flags and the geometry bridge still win."""
    from vqattack_tpu.named_configs import vlmo_config_from_named
    from vqattack_tpu.train.cli import apply_preset, build_argparser

    parser = build_argparser()
    args = parser.parse_args([
        "--task", "vlmo_vqa", "--vocab", "v.txt",
        "--preset", "task_finetune_vqa_base_image480",
    ])
    preset = apply_preset(parser, args)
    assert args.lr == 3e-5 and args.weight_decay == 0.01
    assert args.image_size == 480
    assert args.mlm_prob == 0.15
    cfg = vlmo_config_from_named(preset)
    assert (cfg.image_size, cfg.hidden_size, cfg.depth) == (480, 768, 12)

    # explicit flags beat the preset; step presets compose on the right
    args2 = parser.parse_args([
        "--task", "vlmo_vqa", "--vocab", "v.txt",
        "--preset", "task_finetune_vqa_large_image480", "step3k",
        "--lr", "1e-6", "--image-size", "224",
    ])
    preset2 = apply_preset(parser, args2)
    assert args2.lr == 1e-6 and args2.image_size == 224
    assert preset2["max_steps"] == 3000
    # warmup fraction resolves against the composed max_steps
    assert args2.warmup_steps == 300
    assert vlmo_config_from_named(preset2).hidden_size == 1024

    import pytest as _pytest

    args3 = parser.parse_args(
        ["--task", "vlmo_vqa", "--vocab", "v.txt", "--preset", "nope"])
    with _pytest.raises(KeyError):
        apply_preset(parser, args3)


def test_pretrain_loss_weights_keep_zeros():
    """Preset zero weights must pass through (not be dropped) so the
    objective's w>0 guards skip them — dropping them would re-enable the
    disabled losses at the 1.0 default, a different objective than the
    preset specifies (task_mlm_itm_itc_base/large: itc=0, itm=0)."""
    from vqattack_tpu.named_configs import vlmo_named_config
    from vqattack_tpu.train.cli import pretrain_loss_weights

    preset = vlmo_named_config("task_mlm_itm_itc_base")
    w = pretrain_loss_weights(preset)
    assert w == {"mlm": 1.0, "itc": 0.0, "itm": 0.0}

    with pytest.raises(SystemExit):
        pretrain_loss_weights(vlmo_named_config("task_finetune_nlvr2_base"))


def test_vlmo_pretrain_rejects_presets_without_pretrain_losses(tmp_path):
    """A preset enabling none of mlm/itc/itm must fail fast, not silently
    re-enable all three at weight 1."""
    from vqattack_tpu.train.cli import main

    vocab, img_dir, cfg_path = _setup(tmp_path)
    with pytest.raises(SystemExit):
        main([
            "--task", "vlmo_pretrain",
            "--config", str(cfg_path),
            "--vocab", str(vocab),
            "--ann", str(tmp_path / "ann.json"),
            "--image-root", str(img_dir),
            "--preset", "task_finetune_nlvr2_base",
            "--steps", "1", "--batch-size", "2",
        ])
