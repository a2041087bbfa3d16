"""Input-transformation defenses (and the DI attack transform).

The reference vendors one defense — stochastic input resampling
(``cleverhans/defenses``) — plus an unused ``input_diversity``
random-resize-pad transform in its FGM kernels
(``fast_gradient_method.py:9-29``).  Both re-derived as jittable jax
programs (static output shapes; randomness keyed):

- :func:`random_resize_pad` — the DI/defense transform: downscale by a random
  factor, place at a random offset on a zero canvas of the original size;
- :func:`spatial_smoothing` — median-filter defense (classic cleverhans);
- :func:`bit_depth_reduction` — quantization defense.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("min_scale",))
def random_resize_pad(
    x: jnp.ndarray, rng: jax.Array, min_scale: float = None
) -> jnp.ndarray:
    """Randomly downscale (bilinear) and pad back to the original size at a
    random offset (``input_diversity``, ``fast_gradient_method.py:9-29``).
    x: [B, H, W, C].

    ``min_scale`` defaults to the reference's range: it draws the resized
    height from ``uniform(H - 32, H)``, i.e. scale in ``[(H-32)/H, 1)`` —
    0.9333 at 480px, 0.857 at 224px — so the floor tracks the image size
    instead of a fixed constant."""
    b, h, w, c = x.shape
    if min_scale is None:
        min_scale = (h - 32) / h
    k_s, k_t, k_l = jax.random.split(rng, 3)
    # a genuinely random scale with STATIC shapes: scale_and_translate
    # resamples at an arbitrary float scale onto the fixed [h, w] canvas
    # (out-of-image regions come back zero = the reference's pad), so the
    # randint-resize of the reference maps to a continuous uniform scale
    # without any dynamic intermediate shape
    s = jax.random.uniform(k_s, (), minval=min_scale, maxval=1.0)
    top = jax.random.uniform(k_t, (), minval=0.0, maxval=(1.0 - s) * h)
    left = jax.random.uniform(k_l, (), minval=0.0, maxval=(1.0 - s) * w)
    return jax.image.scale_and_translate(
        x, (b, h, w, c), (1, 2),
        jnp.stack([s, s]), jnp.stack([top, left]),
        method="linear",
    )


@partial(jax.jit, static_argnames=("window",))
def spatial_smoothing(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Median smoothing over a window x window neighborhood (edge-replicated)."""
    pad = window // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    patches = [
        xp[:, i : i + x.shape[1], j : j + x.shape[2], :]
        for i in range(window)
        for j in range(window)
    ]
    return jnp.median(jnp.stack(patches), axis=0)


@partial(jax.jit, static_argnames=("bits",))
def bit_depth_reduction(
    x: jnp.ndarray, bits: int = 4, lo: float = -1.0, hi: float = 1.0
) -> jnp.ndarray:
    """Quantize to 2^bits levels over [lo, hi]."""
    levels = 2 ** bits - 1
    unit = (x - lo) / (hi - lo)
    return jnp.round(unit * levels) / levels * (hi - lo) + lo
