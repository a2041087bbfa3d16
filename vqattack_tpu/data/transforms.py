"""Image transforms: decode -> resize -> normalize, NHWC numpy out.

The reference test transform is Resize((480,480), bicubic) + ToTensor +
Normalize(mean=std=0.5) -> pixels in [-1, 1]
(``ALBEF_attack/dataset/__init__.py:35-39``; VLMo ``square_transform.py:11-18``
with the same ``inception_normalize``).  The train path adds
RandomResizedCrop + horizontal flip + RandAugment
(``dataset/__init__.py:18-34``, ``dataset/randaugment.py``).

TPU-first: host-side PIL decode/resize (CPU workers), normalization folded in
as a numpy op producing NHWC float32 — the layout the conv expects; no
channel-first tensors anywhere.
"""

from __future__ import annotations

import random
from typing import Callable, Optional

import numpy as np

try:
    from PIL import Image, ImageEnhance, ImageOps

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False

MEAN = 0.5
STD = 0.5


def inception_normalize(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] HWC -> float32 [-1, 1] (mean=std=0.5)."""
    return (x.astype(np.float32) / 255.0 - MEAN) / STD


def denormalize(x: np.ndarray) -> np.ndarray:
    return np.clip((x * STD + MEAN) * 255.0, 0, 255).astype(np.uint8)


def _resize(img, size: int):
    return img.resize((size, size), Image.BICUBIC)


def test_transform(size: int = 480) -> Callable:
    """Deterministic eval/attack transform (reference test path)."""

    def fn(img) -> np.ndarray:
        img = img.convert("RGB")
        return inception_normalize(np.asarray(_resize(img, size)))

    return fn


# ---------------------------------------------------------------------------
# RandAugment (train path; compact re-derivation of the vendored 339-LoC
# ``dataset/randaugment.py`` — same op inventory, PIL-backed)
# ---------------------------------------------------------------------------


def _identity(img, _):
    return img


def _auto_contrast(img, _):
    return ImageOps.autocontrast(img)


def _equalize(img, _):
    return ImageOps.equalize(img)


# Magnitude semantics are the vendored randaugment.py level_to_args
# formulas at MAX_LEVEL=10 verbatim: enhance factor (m/10)*1.8+0.1
# (:208-211, no sign randomization), shear (m/10)*0.3 (:214-220),
# translate (m/10)*translate_const=10 PIXELS (:223-229, absolute — not a
# fraction of image size), rotate (m/10)*30 degrees (:258-265),
# solarize threshold int((m/10)*256) (:240-244), posterize bits
# int((m/10)*4) (:251-255).  Geometric signs are drawn by the caller.


def _rotate(img, v):
    return img.rotate(v * 30)


def _solarize(img, v):
    return ImageOps.solarize(img, int(abs(v) * 256))


def _posterize(img, v):
    return ImageOps.posterize(img, max(1, int(abs(v) * 4)))


def _contrast(img, v):
    return ImageEnhance.Contrast(img).enhance(abs(v) * 1.8 + 0.1)


def _color(img, v):
    return ImageEnhance.Color(img).enhance(abs(v) * 1.8 + 0.1)


def _brightness(img, v):
    return ImageEnhance.Brightness(img).enhance(abs(v) * 1.8 + 0.1)


def _sharpness(img, v):
    return ImageEnhance.Sharpness(img).enhance(abs(v) * 1.8 + 0.1)


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v * 0.3, 0, 0, 1, 0))


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v * 0.3, 1, 0))


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, v * 10.0, 0, 1, 0))


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * 10.0))


_RA_OP_TABLE = {
    "Identity": _identity,
    "AutoContrast": _auto_contrast,
    "Equalize": _equalize,
    "Rotate": _rotate,
    "Solarize": _solarize,
    "Posterize": _posterize,
    "Contrast": _contrast,
    "Color": _color,
    "Brightness": _brightness,
    "Sharpness": _sharpness,
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
}

# the reference train/pretrain transforms deliberately exclude the
# color-destroying ops (Solarize/Posterize/Contrast/Color would corrupt
# color-type VQA answers) — dataset/__init__.py:22,30,78
_RA_REFERENCE_TRAIN_AUGS = (
    "Identity", "AutoContrast", "Equalize", "Brightness", "Sharpness",
    "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
)

# geometric ops whose magnitude the vendored level_to_args negates half the
# time (randaugment.py:217,226,261); enhance/solarize/posterize never flip
_RA_SIGNED = {"Rotate", "ShearX", "ShearY", "TranslateX", "TranslateY"}


class RandomAugment:
    """Pick ``n`` ops at magnitude ``m/10`` with the vendored augmenter's
    sampling distribution (``randaugment.py:310-334``): ops drawn WITH
    replacement (np.random.choice semantics — the same op can repeat), each
    applied with probability 0.5, and geometric magnitudes randomly
    negated.  ``augs`` defaults to the reference train transforms' 10-op
    subset; pass ``list(_RA_OP_TABLE)`` for the full 14-op inventory."""

    def __init__(self, n: int = 2, m: int = 7,
                 rng: Optional[random.Random] = None, augs=None):
        self.n, self.m = n, m
        self.rng = rng or random.Random()
        self.augs = tuple(augs) if augs else _RA_REFERENCE_TRAIN_AUGS

    def __call__(self, img):
        for name in self.rng.choices(self.augs, k=self.n):
            if self.rng.random() > 0.5:  # per-op apply gate (ref :330)
                continue
            v = self.m / 10.0
            if name in _RA_SIGNED and self.rng.random() > 0.5:
                v = -v
            img = _RA_OP_TABLE[name](img, v)
        return img


def train_transform(size: int = 480, rng: Optional[random.Random] = None) -> Callable:
    """RandomResizedCrop(0.5-1.0) + hflip + RandAugment + normalize
    (reference train path, ``dataset/__init__.py:18-34``)."""
    rng = rng or random.Random()
    ra = RandomAugment(2, 7, rng)

    def fn(img) -> np.ndarray:
        img = img.convert("RGB")
        w, h = img.size
        scale = rng.uniform(0.5, 1.0)
        cw, ch = int(w * scale ** 0.5), int(h * scale ** 0.5)
        x0 = rng.randint(0, max(0, w - cw))
        y0 = rng.randint(0, max(0, h - ch))
        img = img.crop((x0, y0, x0 + cw, y0 + ch)).resize((size, size), Image.BICUBIC)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img = ra(img)
        return inception_normalize(np.asarray(img))

    return fn
