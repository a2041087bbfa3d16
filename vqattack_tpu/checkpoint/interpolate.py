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


def _geometric_points(src_size: int, dst_size: int) -> np.ndarray:
    """The BEiT/VLMo geometric-progression source-coordinate layout
    (``vlmo_module.py:764-783``): find ratio ``q`` in [1.01, 1.5] such that
    the geometric sum ``1 + q + ... + q^(src//2 - 1)`` reaches ``dst//2``,
    then lay source samples at cumulative-geometric distances around 0."""
    n = src_size // 2
    target = dst_size // 2

    def gp(r):
        return (1.0 - r ** n) / (1.0 - r)  # a=1

    # NB: the ratio used is the midpoint tested in the FINAL bisection
    # iteration (the loop variable q), not a post-loop (left+right)/2 —
    # recomputing shifts q by ~5e-7 and every source coordinate with it
    # (measured 2e-4 drift on the 27->59 table vs the reference's own code)
    left, right = 1.01, 1.5
    q = (left + right) / 2.0
    while right - left > 1e-6:
        q = (left + right) / 2.0
        if gp(q) > target:
            right = q
        else:
            left = q
    dis, cur = [], 1.0
    for i in range(n):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-d for d in reversed(dis)]
    return np.array(r_ids + [0] + dis, dtype=np.float64)


def interpolate_rel_pos_bias(
    table: np.ndarray, src_size: int, dst_size: int
) -> np.ndarray:
    """Resize a relative-position-bias grid from ``(2*src_window-1)^2`` rows
    to ``(2*dst_window-1)^2`` rows per column via geometric-coordinate cubic
    interpolation (``vlmo_module.py:741-804``).

    ``src_size``/``dst_size`` here are the *grid* sizes ``2*window - 1``
    (odd), matching the reference's ``src_size``/``dst_size``.  ``table``:
    ``[src_size^2 (+ extra trailing rows), H]``; extra rows pass through.
    """
    from scipy.interpolate import RectBivariateSpline

    table = np.asarray(table)
    num_extra = table.shape[0] - src_size ** 2
    if src_size == dst_size:
        return table
    extra = table[table.shape[0] - num_extra:] if num_extra > 0 else table[:0]
    body = table[: src_size ** 2]
    n_cols = body.shape[1]

    x = _geometric_points(src_size, dst_size)
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)  # dst_size integer positions

    k = min(3, src_size - 1)  # cubic when the grid allows (the real 27-grid case)
    out = []
    for h in range(n_cols):
        z = body[:, h].reshape(src_size, src_size).astype(np.float64)
        f = RectBivariateSpline(x, x, z, kx=k, ky=k)
        out.append(f(dx, dx).reshape(-1))
    new_body = np.stack(out, axis=1).astype(table.dtype)
    if num_extra > 0:
        return np.concatenate([new_body, extra], axis=0)
    return new_body
