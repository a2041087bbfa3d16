"""Checkpoint geometry adaptation: position-embedding resizing.

The reference adapts 224px checkpoints to 480px models by bicubic
interpolation of the patch position grid (``models/vit.py:181-205``,
``vlmo_module.py:88-112``) and by geometric-progression resampling of
relative-position-bias tables (``vlmo_module.py:741-804``).  Re-derived here
on top of ``jax.image.resize``.
"""

from __future__ import annotations

import math

import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution kernel with a=-0.75 (the torch/OpenCV choice —
    jax.image.resize uses Keys a=-0.5, which drifts ~1e-1 on upsampling)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
        np.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


def _bicubic_resize_axis(x: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    """torch ``F.interpolate(mode='bicubic', align_corners=False)`` semantics
    along one axis: half-pixel-centered sampling, 4 taps, edge-clamped."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = in_size / out_size
    coords = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    t = coords - base
    idx = np.stack([base - 1, base, base + 1, base + 2], axis=0)
    idx = np.clip(idx, 0, in_size - 1)
    w = _cubic_kernel(np.stack([1 + t, t, 1 - t, 2 - t], axis=0))
    x = np.moveaxis(x, axis, 0)
    out = np.einsum("ko,ko...->o...", w, x[idx])
    return np.moveaxis(out, 0, axis)


def bicubic_resize_2d(grid: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """[..., H, W]-trailing bicubic resize, torch-parity (a=-0.75)."""
    out = _bicubic_resize_axis(grid, grid.ndim - 2, new_h)
    return _bicubic_resize_axis(out, grid.ndim - 1, new_w)


def interpolate_pos_embed(
    pos_embed: np.ndarray, new_num_patches: int, num_extra_tokens: int = 1
) -> np.ndarray:
    """Bicubic-resize the patch grid of an absolute position embedding.

    ``pos_embed``: [1, old_patches + extra, D] (extra tokens, e.g. [CLS],
    lead and are kept unchanged — ``vit.py:191-203``).  Matches torch
    ``F.interpolate(..., mode='bicubic', align_corners=False)`` numerics.
    """
    pos_embed = np.asarray(pos_embed)
    dim = pos_embed.shape[-1]
    old_num_patches = pos_embed.shape[-2] - num_extra_tokens
    orig_size = int(round(math.sqrt(old_num_patches)))
    new_size = int(round(math.sqrt(new_num_patches)))
    if orig_size == new_size:
        return pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(1, orig_size, orig_size, dim)
    grid = np.moveaxis(grid, 3, 1)  # [1, D, H, W]
    resized = bicubic_resize_2d(grid, new_size, new_size)
    resized = np.moveaxis(resized, 1, 3).reshape(1, new_size * new_size, dim)
    return np.concatenate([extra, resized], axis=1)


def _geometric_points(n: int, length: int) -> np.ndarray:
    """The BEiT/VLMo geometric-progression coordinate layout for rel-pos
    interpolation (``vlmo_module.py:763-787``): sample points accumulate with
    ratio ``r`` so that ``sum(r^i) = length/2``."""
    # solve q: 1 + q + ... + q^(n//2-1) = length // 2  via bisection
    half = n // 2
    target = length // 2

    def total(q):
        return sum(q ** i for i in range(1, half + 1))

    lo, hi = 1.0, 1.5
    for _ in range(100):
        mid = (lo + hi) / 2
        if total(mid) > target:
            hi = mid
        else:
            lo = mid
    q = (lo + hi) / 2
    dis, cur = [], 1.0
    for i in range(half):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-d for d in reversed(dis)]
    pts = r_ids + [0] + dis
    return np.array(pts)


def interpolate_rel_pos_bias(
    table: np.ndarray, src_size: int, dst_size: int
) -> np.ndarray:
    """Resize a relative-position-bias table from a (2*src-1)^2 grid to a
    (2*dst-1)^2 grid per head via geometric-coordinate cubic interpolation
    (``vlmo_module.py:741-804``).  ``table``: [(2*src-1)^2 + extra, H] where
    the 3 trailing extra rows (cls-to-token biases) pass through unchanged.
    """
    from scipy import interpolate as sinterp  # lazy; scipy ships with jax stack

    table = np.asarray(table)
    num_extra = table.shape[0] - (2 * src_size - 1) ** 2
    if src_size == dst_size:
        return table
    extra = table[-num_extra:] if num_extra > 0 else table[:0]
    body = table[: table.shape[0] - num_extra]
    n_heads = body.shape[1]

    x = _geometric_points(2 * src_size - 1, src_size * 2)
    y = x
    tx = np.arange(-(dst_size - 1), dst_size, 1.0) * (x[-1] / (dst_size - 1))
    ty = tx

    out = []
    for h in range(n_heads):
        z = body[:, h].reshape(2 * src_size - 1, 2 * src_size - 1)
        f = sinterp.RectBivariateSpline(x, y, z, kx=3, ky=3)
        out.append(f(tx, ty).reshape(-1))
    new_body = np.stack(out, axis=1)
    if num_extra > 0:
        return np.concatenate([new_body, extra], axis=0)
    return new_body
