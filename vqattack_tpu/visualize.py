"""Grad-CAM visualization CLI (the reference's ``visualization.ipynb``
capability as a command)::

    python -m vqattack_tpu.visualize --image img.jpg --question "what color..." \
        --vocab vocab.txt [--surrogate-ckpt ALBEF.pth] [--layer 8] --out cam.png

Renders where the fusion encoder attends over image patches when encoding
the question (``utils/gradcam.py`` attention probe) as a heat-map overlay.
"""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="fusion cross-attention Grad-CAM")
    p.add_argument("--image", required=True)
    p.add_argument("--question", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--surrogate-ckpt", default=None)
    p.add_argument("--layer", type=int, default=8)
    p.add_argument("--out", default="gradcam.png")
    p.add_argument("--alpha", type=float, default=0.5, help="overlay opacity")
    return p


def overlay_heatmap(pixels_uint8, cam, alpha: float = 0.5):
    """[H,W,3] uint8 + [gh,gw] cam -> PIL Image with a red heat overlay."""
    import numpy as np
    from PIL import Image

    h, w = pixels_uint8.shape[:2]
    cam = cam / max(cam.max(), 1e-9)
    cam_img = Image.fromarray((cam * 255).astype(np.uint8)).resize(
        (w, h), Image.BILINEAR
    )
    cam_arr = np.asarray(cam_img).astype(np.float32) / 255.0
    heat = np.zeros_like(pixels_uint8, dtype=np.float32)
    heat[..., 0] = cam_arr * 255  # red channel
    out = (1 - alpha * cam_arr[..., None]) * pixels_uint8 + alpha * cam_arr[
        ..., None
    ] * heat
    return Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from vqattack_tpu import config as cfg_mod
    from vqattack_tpu.data.transforms import test_transform
    from vqattack_tpu.models.albef import AlbefPretrain
    from vqattack_tpu.text.tokenizer import WordPieceTokenizer
    from vqattack_tpu.utils.cache import enable_compile_cache
    from vqattack_tpu.utils.gradcam import albef_question_gradcam

    enable_compile_cache()
    cfg = cfg_mod.load_config(args.config) if args.config else cfg_mod.albef_attack_config()
    tok = WordPieceTokenizer.from_file(args.vocab)
    size = cfg.albef.vit.image_size

    with Image.open(args.image) as img:
        img = img.convert("RGB")
        raw = np.asarray(img.resize((size, size)))
        pixels = test_transform(size)(img)[None]

    model = AlbefPretrain(cfg.albef)
    if args.surrogate_ckpt:
        from vqattack_tpu.checkpoint import io as ckpt_io

        variables = ckpt_io.load_albef_pretrain(args.surrogate_ckpt, size)
    else:
        ids0 = jnp.ones((1, cfg.attack.max_text_len), jnp.int32)
        variables = jax.jit(
            lambda k: model.init(
                k, jnp.asarray(pixels), ids0, jnp.ones_like(ids0),
                method=AlbefPretrain.init_all,
            )
        )(jax.random.key(0))

    ids, mask = tok.encode(args.question, cfg.attack.max_text_len)
    cam = albef_question_gradcam(
        model, variables, jnp.asarray(pixels), jnp.asarray(ids[None]),
        jnp.asarray(mask[None]), layer=args.layer,
    )[0]
    overlay_heatmap(raw, cam, args.alpha).save(args.out)
    print(f"wrote {args.out} (grid {cam.shape}, max {float(cam.max()):.4f})")


if __name__ == "__main__":
    main()
