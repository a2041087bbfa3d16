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


# ---------------------------------------------------------------------------
# VLMo pixelbert family (``vlmo/transforms/{pixelbert,randaug,utils}.py``):
# aspect-preserving MinMax resize + the UDA/efficientnet 14-op RandAugment
# pool with linear m/30 magnitude mapping.
# ---------------------------------------------------------------------------


def min_max_resize(img, shorter: int = 800, longer: int = 1333):
    """Aspect-preserving bicubic resize: shorter side -> ``shorter``, capped
    so the longer side <= ``longer``, both rounded down to multiples of 32
    (``vlmo/transforms/utils.py::MinMaxResize:5-26`` math, verbatim)."""
    w, h = img.size
    scale = shorter / min(w, h)
    if h < w:
        newh, neww = shorter, scale * w
    else:
        newh, neww = scale * h, shorter
    if max(newh, neww) > longer:
        scale = longer / max(newh, neww)
        newh, neww = newh * scale, neww * scale
    newh, neww = int(newh + 0.5), int(neww + 0.5)
    newh, neww = newh // 32 * 32, neww // 32 * 32
    return img.resize((neww, newh), Image.BICUBIC)


def _solarize_add(img, v, threshold: int = 128):
    """``randaug.py::SolarizeAdd:83-90``: add ``v`` (float, truncated on the
    uint8 cast like the reference's astype) then solarize at 128."""
    arr = np.clip(np.asarray(img).astype(np.float64) + v, 0, 255).astype(np.uint8)
    return ImageOps.solarize(Image.fromarray(arr), threshold)


def _signed(rng, v):
    """Geometric ops negate with p=0.5 (``randaug.py:13,20,35,51,58``)."""
    return -v if rng.random() > 0.5 else v


# (op, minval, maxval) — ``randaug.py::augment_list:181-200`` (the
# tensorflow/tpu efficientnet pool).  Magnitude v = m/30*(max-min)+min is
# passed RAW (degrees / pixels / enhance factors / thresholds), unlike the
# ALBEF table above whose helpers take normalized m/10.
_UDA_POOL = (
    ("AutoContrast", lambda img, v, rng: ImageOps.autocontrast(img), 0, 1),
    ("Equalize", lambda img, v, rng: ImageOps.equalize(img), 0, 1),
    ("Rotate", lambda img, v, rng: img.rotate(_signed(rng, v)), 0, 30),
    ("Posterize",
     lambda img, v, rng: ImageOps.posterize(img, max(1, int(v))), 0, 4),
    ("Solarize", lambda img, v, rng: ImageOps.solarize(img, v), 0, 256),
    ("SolarizeAdd", lambda img, v, rng: _solarize_add(img, v), 0, 110),
    ("Color",
     lambda img, v, rng: ImageEnhance.Color(img).enhance(v), 0.1, 1.9),
    ("Contrast",
     lambda img, v, rng: ImageEnhance.Contrast(img).enhance(v), 0.1, 1.9),
    ("Brightness",
     lambda img, v, rng: ImageEnhance.Brightness(img).enhance(v), 0.1, 1.9),
    ("Sharpness",
     lambda img, v, rng: ImageEnhance.Sharpness(img).enhance(v), 0.1, 1.9),
    ("ShearX", lambda img, v, rng: img.transform(
        img.size, Image.AFFINE, (1, _signed(rng, v), 0, 0, 1, 0)), 0.0, 0.3),
    ("ShearY", lambda img, v, rng: img.transform(
        img.size, Image.AFFINE, (1, 0, 0, _signed(rng, v), 1, 0)), 0.0, 0.3),
    ("TranslateXabs", lambda img, v, rng: img.transform(
        img.size, Image.AFFINE, (1, 0, _signed(rng, v), 0, 1, 0)), 0.0, 100),
    ("TranslateYabs", lambda img, v, rng: img.transform(
        img.size, Image.AFFINE, (1, 0, 0, 0, 1, _signed(rng, v))), 0.0, 100),
)


class RandAugmentUDA:
    """The pixelbert-family augmenter (``randaug.py::RandAugment:257-268``):
    ``n`` ops drawn WITH replacement from the 14-op pool, every drawn op
    applied (no skip gate), magnitude ``v = m/30*(max-min)+min``."""

    def __init__(self, n: int = 2, m: int = 9,
                 rng: Optional[random.Random] = None):
        self.n, self.m = n, m
        self.rng = rng or random.Random()

    def __call__(self, img):
        for _, op, lo, hi in self.rng.choices(_UDA_POOL, k=self.n):
            img = op(img, (float(self.m) / 30) * float(hi - lo) + lo, self.rng)
        return img


def pixelbert_transform(size: int = 800) -> Callable:
    """MinMaxResize(size, 1333/800*size) + normalize
    (``vlmo/transforms/pixelbert.py:9-17``); output H,W vary per image."""
    longer = int((1333 / 800) * size)

    def fn(img) -> np.ndarray:
        img = img.convert("RGB")
        return inception_normalize(np.asarray(min_max_resize(img, size, longer)))

    return fn


def pixelbert_transform_randaug(
    size: int = 800, rng: Optional[random.Random] = None
) -> Callable:
    """RandAugment(2, 9) BEFORE the resize (``pixelbert.py:20-29`` inserts it
    at index 0)."""
    longer = int((1333 / 800) * size)
    ra = RandAugmentUDA(2, 9, rng)

    def fn(img) -> np.ndarray:
        img = ra(img.convert("RGB"))
        return inception_normalize(np.asarray(min_max_resize(img, size, longer)))

    return fn


def square_transform(size: int = 224) -> Callable:
    """VLMo registry name for the ALBEF-style test path
    (``square_transform.py:11-18``)."""
    return test_transform(size)


def square_transform_randaug(
    size: int = 224, rng: Optional[random.Random] = None
) -> Callable:
    """RandomResizedCrop(0.5-1.0) + hflip + ALBEF RandomAugment(2,7)
    (``square_transform.py:21-31`` — same pipeline as the ALBEF train
    path)."""
    return train_transform(size, rng)


_TRANSFORMS = {
    "pixelbert": pixelbert_transform,
    "pixelbert_randaug": pixelbert_transform_randaug,
    "square_transform": square_transform,
    "square_transform_randaug": square_transform_randaug,
}


def keys_to_transforms(keys, size: int = 224):
    """Registry lookup (``vlmo/transforms/__init__.py:10-19``): the config's
    ``train/val_transform_keys`` lists resolve through this."""
    return [_TRANSFORMS[key](size=size) for key in keys]


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
