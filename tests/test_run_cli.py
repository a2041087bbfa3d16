"""Smoke test of the top-level CLI driver on a synthetic miniature dataset."""

import dataclasses
import json

import numpy as np
import pytest

from vqattack_tpu import config as cfg_mod
from vqattack_tpu.text.tokenizer import SPECIAL_TOKENS


def _write_vocab(path, words):
    toks = list(SPECIAL_TOKENS) + words
    for c in "abcdefghijklmnopqrstuvwxyz":
        toks += [c, f"##{c}"]
    path.write_text("\n".join(toks) + "\n")
    return len(toks)


@pytest.mark.parametrize("pipeline", ["albef", "vlmo"])
def test_cli_smoke(tmp_path, pipeline):
    pytest.importorskip("PIL")
    from PIL import Image

    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
        img_dir / "a.jpg"
    )
    ann = [{"image": "a.jpg", "question": "what color is the dog",
            "question_id": 100}]
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))

    (tmp_path / "right.txt").write_text("100\n")
    (tmp_path / "sur.json").write_text(json.dumps({"100": "red"}))
    (tmp_path / "tgt.json").write_text(json.dumps({"100": "red"}))
    (tmp_path / "para.json").write_text(json.dumps({"100": ["red", "the dog is red."]}))
    (tmp_path / "allc.json").write_text(json.dumps({"100": ["red"]}))

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    vlmo = dataclasses.replace(base.vlmo, vocab_size=vocab_size)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(
        base, albef=albef, vlmo=vlmo, data=data, eval_every=1, k_test=2
    )
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--pipeline", pipeline,
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--answer-list", str(tmp_path / "answers.json"),
        "--right-part", str(tmp_path / "right.txt"),
        "--surrogate-ans", str(tmp_path / "sur.json"),
        "--target-ans", str(tmp_path / "tgt.json"),
        "--paraphrases", str(tmp_path / "para.json"),
        "--all-correct", str(tmp_path / "allc.json"),
        "--output", str(out_dir),
        "--limit", "1",
        "--no-pallas",
    ])
    assert (out_dir / "100.npy").exists()
    adv = np.load(out_dir / "100.npy")
    assert adv.shape == (1, 32, 32, 3)
    assert (out_dir / "adv_txt_dict.json").exists()


def test_transfer_eval_smoke(tmp_path):
    """Offline transfer eval over artifacts produced by the attack CLI."""
    pytest.importorskip("PIL")
    import numpy as np

    from vqattack_tpu.transfer_eval import main as te_main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    base = cfg_mod.tiny_test_config()
    import dataclasses

    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    cfg = dataclasses.replace(base, albef=albef, k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    art = tmp_path / "artifacts"
    art.mkdir()
    np.save(art / "100.npy", np.zeros((1, 32, 32, 3), np.float32))
    (art / "adv_txt_dict.json").write_text(json.dumps({"100": "what color is the cat"}))
    (tmp_path / "sur.json").write_text(json.dumps({"100": "red"}))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))
    (tmp_path / "gt.json").write_text(json.dumps({"100": ["red"] * 5}))

    te_main([
        "--pipeline", "albef",
        "--artifacts", str(art),
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--answer-list", str(tmp_path / "answers.json"),
        "--surrogate-ans", str(tmp_path / "sur.json"),
        "--gt-answers", str(tmp_path / "gt.json"),
    ])


def test_cli_batched_mode(tmp_path):
    """--batch-size >1 routes through the lockstep batched attack."""
    pytest.importorskip("PIL")
    from PIL import Image

    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        ann.append({"image": f"{i}.jpg", "question": "what color is the dog",
                    "question_id": 200 + i})
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))

    base = cfg_mod.tiny_test_config()
    import dataclasses

    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, data=data, eval_every=2, k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--pipeline", "albef",
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--answer-list", str(tmp_path / "answers.json"),
        "--output", str(out_dir),
        "--batch-size", "2",
        "--no-pallas",
    ])
    for qid in (200, 201, 202):
        assert (out_dir / f"{qid}.npy").exists()


def test_cli_batched_dynamic_pgd(tmp_path):
    """--dynamic-pgd routes the batched sweep through the traced-trip-count
    kernels (attacks/pgd.py dynamic variants) end to end."""
    pytest.importorskip("PIL")
    from PIL import Image

    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    ann = []
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        ann.append({"image": f"{i}.jpg", "question": "what color is the dog",
                    "question_id": 300 + i})
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))

    base = cfg_mod.tiny_test_config()
    import dataclasses

    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, data=data, eval_every=2,
                              k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--pipeline", "albef",
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--answer-list", str(tmp_path / "answers.json"),
        "--output", str(out_dir),
        "--batch-size", "2",
        "--dynamic-pgd",
        "--no-pallas",
    ])
    for qid in (300, 301):
        assert (out_dir / f"{qid}.npy").exists()


def test_cli_vlmo_arrow_path(tmp_path):
    """VLMo pipeline over pyarrow tables (--arrow), end to end."""
    pytest.importorskip("PIL")
    pytest.importorskip("pyarrow")
    from PIL import Image

    from vqattack_tpu.data.arrow_writer import write_vqa_arrow
    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "val2014"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
        img_dir / "COCO_val2014_000000000001.jpg"
    )
    (tmp_path / "q.json").write_text(json.dumps({"questions": [
        {"question": "what color is the dog", "question_id": 500, "image_id": 1},
    ]}))
    (tmp_path / "a.json").write_text(json.dumps({"annotations": [
        {"question_id": 500, "answers": [{"answer": "red"}] * 10},
    ]}))
    arrow_path = tmp_path / "vqa.arrow"
    write_vqa_arrow(str(tmp_path / "q.json"), str(tmp_path / "a.json"),
                    str(img_dir), str(arrow_path))

    import dataclasses

    base = cfg_mod.tiny_test_config()
    vlmo = dataclasses.replace(base.vlmo, vocab_size=vocab_size)
    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, vlmo=vlmo, albef=albef, data=data, eval_every=1)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    # full side-table surface: the alignment guard must read the arrow
    # items' answer_scores (the reference's vqa_scores check,
    # vlmo_module.py:1735-1741), not the ALBEF json path's weights key
    (tmp_path / "right.txt").write_text("500\n")
    (tmp_path / "sur.json").write_text(json.dumps({"500": "red"}))
    (tmp_path / "tgt.json").write_text(json.dumps({"500": "red"}))
    (tmp_path / "para.json").write_text(
        json.dumps({"500": ["red", "the dog is red"]}))
    (tmp_path / "allc.json").write_text(json.dumps({"500": ["red"]}))

    out_dir = tmp_path / "out"
    main([
        "--pipeline", "vlmo",
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--arrow", str(arrow_path),
        "--right-part", str(tmp_path / "right.txt"),
        "--surrogate-ans", str(tmp_path / "sur.json"),
        "--target-ans", str(tmp_path / "tgt.json"),
        "--paraphrases", str(tmp_path / "para.json"),
        "--all-correct", str(tmp_path / "allc.json"),
        "--output", str(out_dir),
        "--limit", "1",
        "--no-pallas",
    ])
    assert (out_dir / "500.npy").exists()


def test_predict_cli(tmp_path, capsys):
    """Inference CLI (the reference's predict.py surface)."""
    pytest.importorskip("PIL")
    import dataclasses

    from PIL import Image

    from vqattack_tpu.predict import main as predict_main

    words = ["what", "color", "is", "the", "dog", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_path = tmp_path / "img.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), np.uint8)
    ).save(img_path)
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue", "dog"]))

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, data=data, k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    predict_main([
        "--pipeline", "albef",
        "--image", str(img_path),
        "--question", "what color is the dog",
        "--vocab", str(vocab_file),
        "--config", str(cfg_path),
        "--answer-list", str(tmp_path / "answers.json"),
        "--topk", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert len(parsed["answers"]) == 2
    assert parsed["answers"][0][0] in ("red", "blue", "dog")


def test_cli_mesh_sharded_batched_mode(tmp_path):
    """--batch-size + --mesh-devices: the BASELINE config-#5 surface — the
    lockstep bucket shards over the virtual 8-device data mesh from the CLI."""
    pytest.importorskip("PIL")
    from PIL import Image

    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    ann = []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        ann.append({"image": f"{i}.jpg", "question": "what color is the cat",
                    "question_id": 300 + i})
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, data=data, eval_every=4, k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--pipeline", "albef",
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--answer-list", str(tmp_path / "answers.json"),
        "--output", str(out_dir),
        "--batch-size", "8",
        "--mesh-devices", "8",
        "--no-pallas",
    ])
    for qid in range(300, 308):
        assert (out_dir / f"{qid}.npy").exists()


def test_cli_resume_skips_existing_artifacts(tmp_path):
    """--resume: qids with an artifact already in --output are not
    re-attacked (SURVEY §5.4's trivially-resumable sweep)."""
    pytest.importorskip("PIL")
    from PIL import Image

    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    ann = []
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            img_dir / f"{i}.jpg"
        )
        ann.append({"image": f"{i}.jpg", "question": "what color is the dog",
                    "question_id": 400 + i})
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, data=data, eval_every=8, k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    common = [
        "--pipeline", "albef",
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--answer-list", str(tmp_path / "answers.json"),
        "--output", str(out_dir),
        "--no-pallas",
    ]
    main(common + ["--limit", "2"])
    assert (out_dir / "400.npy").exists() and (out_dir / "401.npy").exists()
    assert not (out_dir / "402.npy").exists()
    mtimes = {q: (out_dir / f"{q}.npy").stat().st_mtime_ns for q in (400, 401)}

    main(common + ["--resume"])
    assert (out_dir / "402.npy").exists()
    for q in (400, 401):  # untouched — not re-attacked
        assert (out_dir / f"{q}.npy").stat().st_mtime_ns == mtimes[q]


def test_resolve_config_defaults_and_no_remat():
    """--pipeline vlmo without --config must use the VLMo attack preset
    (vlmo remat on), and --no-remat must strip remat everywhere."""
    from vqattack_tpu.run import build_argparser, resolve_config

    ap = build_argparser()
    a = ap.parse_args(["--pipeline", "vlmo"])
    cfg = resolve_config(a)
    assert cfg.vlmo.remat is True

    a = ap.parse_args(["--pipeline", "albef"])
    cfg = resolve_config(a)
    assert cfg.albef.vit.remat is True and cfg.albef.bert.remat is True

    a = ap.parse_args(["--pipeline", "albef", "--no-remat"])
    cfg = resolve_config(a)
    assert not cfg.albef.vit.remat and not cfg.albef.bert.remat
    assert not cfg.vlmo.remat


def test_resolve_config_dynamic_default_and_overrides():
    """dynamic_pgd is the production default for BOTH pipeline presets
    (PERF.md round 4); --static-pgd opts back out, --dynamic-pgd
    re-enables over a static preset, --tap-dtype threads through."""
    from vqattack_tpu.run import build_argparser, resolve_config

    ap = build_argparser()
    for pipe in ("albef", "vlmo"):
        cfg = resolve_config(ap.parse_args(["--pipeline", pipe]))
        assert cfg.attack.dynamic_pgd is True, pipe

    cfg = resolve_config(ap.parse_args(["--pipeline", "albef", "--static-pgd"]))
    assert cfg.attack.dynamic_pgd is False
    assert cfg.attack.tap_dtype == "float32"  # reference-parity default

    cfg = resolve_config(
        ap.parse_args(["--pipeline", "albef", "--tap-dtype", "bfloat16"]))
    assert cfg.attack.tap_dtype == "bfloat16"


def test_cli_bfloat16_trunk(tmp_path):
    """--dtype bfloat16 runs the sweep with the mixed-precision surrogate
    (PERF.md's fastest measured configuration)."""
    pytest.importorskip("PIL")
    from PIL import Image

    from vqattack_tpu.run import main

    words = ["what", "color", "is", "the", "dog", "cat", "red", "blue"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_size = _write_vocab(vocab_file, words)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(4)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
        img_dir / "0.jpg"
    )
    (tmp_path / "ann.json").write_text(json.dumps([
        {"image": "0.jpg", "question": "what color is the dog",
         "question_id": 600}
    ]))
    (tmp_path / "answers.json").write_text(json.dumps(["red", "blue"]))

    base = cfg_mod.tiny_test_config()
    bert = dataclasses.replace(base.albef.bert, vocab_size=vocab_size)
    albef = dataclasses.replace(base.albef, bert=bert)
    data = dataclasses.replace(base.data, image_size=32)
    cfg = dataclasses.replace(base, albef=albef, data=data, eval_every=2, k_test=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_mod.save_config(cfg, str(cfg_path))

    out_dir = tmp_path / "out"
    main([
        "--pipeline", "albef",
        "--config", str(cfg_path),
        "--vocab", str(vocab_file),
        "--ann", str(tmp_path / "ann.json"),
        "--image-root", str(img_dir),
        "--answer-list", str(tmp_path / "answers.json"),
        "--output", str(out_dir),
        "--dtype", "bfloat16",
        "--no-remat",
        "--no-pallas",
    ])
    adv = np.load(out_dir / "600.npy")
    assert adv.dtype == np.float32  # the perturbed image stays f32
    assert np.isfinite(adv).all()


def test_named_config_resolves_vlmo_geometry():
    """--named-config maps the sacred preset into the VLMo geometry and is
    rejected on the ALBEF pipeline."""
    import dataclasses

    from vqattack_tpu.run import build_argparser

    ap = build_argparser()
    args = ap.parse_args([
        "--pipeline", "vlmo",
        "--named-config", "task_finetune_vqa_base_image480",
    ])
    assert args.named_config == ["task_finetune_vqa_base_image480"]

    from vqattack_tpu.named_configs import (
        vlmo_config_from_named,
        vlmo_named_config,
    )

    cfg = vlmo_config_from_named(vlmo_named_config(*args.named_config))
    assert (cfg.image_size, cfg.hidden_size, cfg.depth) == (480, 768, 12)

    from vqattack_tpu.run import main

    with pytest.raises(SystemExit):
        main(["--pipeline", "albef",
              "--named-config", "task_finetune_vqa_base_image480"])
