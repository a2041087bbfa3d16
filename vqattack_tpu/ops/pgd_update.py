"""Fused Pallas TPU kernel for the PGD L-inf perturbation update.

One VPU pass over the pixel buffer computes the whole update chain that the
reference spreads over four torch ops with intermediate materialization
(``fast_gradient_method.py:151-160`` + ``projected_gradient_descent.py:146-151``)::

    stepped = clamp(adv + eps_iter * sign(grad), clip_min, clip_max)
    eta     = clamp(stepped - ori, -eps, +eps)        # L-inf ball projection
    out     = clamp(ori + eta, clip_min, clip_max)

This is bandwidth-bound (3 reads + 1 write, ~10 flops/elem), so the win is
doing it in a single pass with no intermediate HBM traffic.  Layout: the
pixel buffer is flattened and tiled to (rows, 128) lanes; a 480x480x3 image
is exactly 5400x128.  Off-TPU (tests) the kernel runs in interpreter mode.

Measured verdict (round 2, profile-driven — PERF.md): inside the scan XLA
fuses the identical jnp chain into the surrounding gradient/carry ops for
free, whereas this kernel's flat (rows, 128) operand layout forces XLA to
*copy* the [B,480,480,3] gradient out of its producing convolution fusion
and reshape the result back every iteration (~5% of device time at b=16;
the trace shows 4x 84 MiB copies + reshapes at 42 GiB/s per unrolled step).
End-to-end the kernel is SLOWER at every production config (b=16 bf16:
118.7 vs 129.5 aggregate sample-iters/s) — it is therefore opt-in
(``use_pallas=True`` / ``--pallas-update``), kept for A/B and as the
pattern for chips/geometries where an unfusable update would pay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 512  # 512*128*4B = 256 KiB per operand block; 4 operands -> 1 MiB VMEM


def _update_kernel(adv_ref, grad_ref, ori_ref, out_ref, *, eps, eps_iter, cmin, cmax):
    ori = ori_ref[:]
    stepped = adv_ref[:] + eps_iter * jnp.sign(grad_ref[:])
    stepped = jnp.clip(stepped, cmin, cmax)
    eta = jnp.clip(stepped - ori, -eps, eps)
    out_ref[:] = jnp.clip(ori + eta, cmin, cmax)


def _on_tpu() -> bool:
    # positive check: the Mosaic kernel (pltpu.VMEM) only lowers on TPU —
    # a denylist would route GPU/ROCm hosts into a compile crash.  The
    # tunneled-relay backend also reports "tpu" here.
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit, static_argnames=("eps", "eps_iter", "clip_min", "clip_max")
)
def pgd_linf_update(
    adv: jnp.ndarray,
    grad: jnp.ndarray,
    ori: jnp.ndarray,
    eps: float,
    eps_iter: float,
    clip_min: float,
    clip_max: float,
) -> jnp.ndarray:
    """Fused sign-step + clamp + L-inf-project + clamp; shape-preserving."""
    shape, dtype = adv.shape, adv.dtype
    n = adv.size
    rows = -(-n // _LANES)  # cdiv
    pad = rows * _LANES - n

    def flat(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(rows, _LANES)

    a, g, o = flat(adv), flat(grad), flat(ori)
    block_rows = min(_BLOCK_ROWS, rows)
    grid = (-(-rows // block_rows),)
    kernel = functools.partial(
        _update_kernel,
        eps=dtype.type(eps),
        eps_iter=dtype.type(eps_iter),
        cmin=dtype.type(clip_min),
        cmax=dtype.type(clip_max),
    )
    spec = pl.BlockSpec(
        (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=not _on_tpu(),
    )(a, g, o)
    out = out.reshape(-1)
    if pad:
        out = out[:n]
    return out.reshape(shape)
