"""Fused residual-add + LayerNorm as a Pallas TPU kernel (custom VJP).

Target: the measured hot spot in the 40-iter PGD scan — XLA compiles each
pre/post-LN site into an add fusion, a *separate* bf16->f32 convert+reduce
stat fusion, and a normalize consumer.  The round-2 op-level profile
(PERF.md "Post-fix confirmation A/Bs") attributes 11.2% of device time to
those convert+reduce fusions running at 184 GiB/s (latency-bound 768-lane
reduces, ~54 per iteration fwd+bwd) against a 692 GiB/s stream.  This kernel
computes the residual sum, the row statistics, and the normalized output in
ONE pass over VMEM-resident tiles, and the backward recomputes the row stats
from the (already loaded) sum instead of storing them — so neither direction
pays a standalone latency-bound reduce pass.

Forward:  ``s = x + delta``; ``h = (s - mean) * rstat * gamma + beta``
          returns ``(s, h)`` — ``s`` is the residual stream the trunk (and
          the attack's feature taps) consume, ``h`` feeds the next matmul.
Backward: standard LayerNorm VJP on ``h`` plus the pass-through on ``s``;
          ``dx = ddelta`` (shared), ``dgamma``/``dbeta`` accumulated across
          row-tiles in the output block (sequential TPU grid).

The reference computes the same math as separate torch ops
(``models/vit.py:77-94`` pre-LN residual blocks, ``models/xbert.py`` post-LN
``LayerNorm(hidden + input)``); this is the TPU re-design, not a port.

Numerics: stats in f32 regardless of the stream dtype (matching the jnp
path's ``LayerNorm(dtype=...)`` promotion); outputs cast back to the input
dtype.  The pure-jnp twin (``residual_layernorm_reference``) is the CPU /
small-width fallback and the exactness oracle in ``tests/test_fused_ln.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# set True (tests) to run the kernels in the Pallas interpreter on CPU
INTERPRET = False

# a row-tile: rows are independent, lanes span the feature dim.  256 rows
# x 768 lanes x (2 in + 2 out) bf16 tiles ~= 1.6 MB VMEM — far under the
# ~16 MB budget even with double buffering.
_BLOCK_ROWS = 256


def _supported(d: int) -> bool:
    # lane dim must tile to 128; everything in production is 768
    return d % 128 == 0


# ---------------------------------------------------------------------------
# pure-jnp twin (fallback + oracle)
# ---------------------------------------------------------------------------


def residual_layernorm_reference(
    x: jnp.ndarray,
    delta: Optional[jnp.ndarray],
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x [+ delta], LayerNorm(x [+ delta])) with f32 statistics."""
    s = x if delta is None else x + delta
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(sf - mean), axis=-1, keepdims=True)
    h = (sf - mean) * jax.lax.rsqrt(var + eps)
    h = h * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return s, h.astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, d_ref, g_ref, b_ref, s_ref, h_ref, *, eps):
    # the add happens in the stream dtype (the jnp path materializes the
    # bf16 sum before LayerNorm's f32 promotion — bit parity matters for
    # the attack trajectory tests); only the statistics run in f32
    s = x_ref[:] + d_ref[:]
    s_ref[:] = s
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    xc = sf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps)
    h = h * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    h_ref[:] = h.astype(h_ref.dtype)


def _bwd_kernel(s_ref, gs_ref, gh_ref, g_ref, dx_ref, dg_ref, db_ref,
                *, eps, n_rows):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    sf = s_ref[:].astype(jnp.float32)
    gh = gh_ref[:].astype(jnp.float32)
    gamma = g_ref[:].astype(jnp.float32)

    d = sf.shape[-1]
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    xc = sf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd

    dxhat = gh * gamma
    c1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dh_s = rstd * (dxhat - c1 - xhat * c2)
    dx = gs_ref[:].astype(jnp.float32) + dh_s
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # rows past n_rows in the ragged final tile are garbage — mask them out
    # of the per-feature accumulators (dx rows there are sliced off upstream)
    rows = sf.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 0)
    valid = (step * rows + row_ids) < n_rows
    gh_m = jnp.where(valid, gh, 0.0)
    xhat_m = jnp.where(valid, xhat, 0.0)

    @pl.when(step == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dg_ref[:] = dg_ref[:] + jnp.sum(gh_m * xhat_m, axis=0, keepdims=True)
    db_ref[:] = db_ref[:] + jnp.sum(gh_m, axis=0, keepdims=True)


def _pallas_fwd(x2, d2, gamma, beta, eps):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, d = x2.shape
    grid = (pl.cdiv(r, _BLOCK_ROWS),)
    row_spec = pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    s, h = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((r, d), x2.dtype),
        ),
        interpret=INTERPRET,
    )(x2, d2, gamma.reshape(1, d), beta.reshape(1, d))
    return s, h


def _pallas_bwd(s2, gs2, gh2, gamma, eps):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, d = s2.shape
    grid = (pl.cdiv(r, _BLOCK_ROWS),)
    row_spec = pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n_rows=r),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, vec_spec],
        out_specs=(row_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), s2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=INTERPRET,
    )(s2, gs2, gh2, gamma.reshape(1, d))
    return dx, dg.reshape(d), db.reshape(d)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_residual_layernorm(x, delta, gamma, beta, eps):
    s, h, _ = _fused_fwd_impl(x, delta, gamma, beta, eps)
    return s, h


def _fused_fwd_impl(x, delta, gamma, beta, eps):
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    d2 = delta.reshape(-1, d)
    s2, h2 = _pallas_fwd(x2, d2, gamma, beta, eps)
    return s2.reshape(shape), h2.reshape(shape), s2


def _fused_vjp_fwd(x, delta, gamma, beta, eps):
    s, h, s2 = _fused_fwd_impl(x, delta, gamma, beta, eps)
    return (s, h), (s2, gamma, x.shape)


def _fused_vjp_bwd(eps, res, grads):
    s2, gamma, shape = res
    gs, gh = grads
    d = s2.shape[-1]
    dx2, dg, db = _pallas_bwd(
        s2, gs.reshape(-1, d), gh.reshape(-1, d), gamma, eps)
    dx = dx2.reshape(shape)
    return dx, dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_fused_residual_layernorm.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def residual_layernorm(
    x: jnp.ndarray,
    delta: Optional[jnp.ndarray],
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-6,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``(x + delta, LayerNorm(x + delta))``.

    Falls back to the jnp twin off-TPU, for feature widths that don't tile
    to 128 lanes (toy test geometries), or when ``use_pallas=False``.
    ``delta=None`` is always the jnp path (a plain LayerNorm has no add to
    fuse; XLA's consumer fusion is already optimal there).
    """
    d = x.shape[-1]
    on_tpu = jax.default_backend() not in ("cpu", "gpu") or INTERPRET
    if not use_pallas or delta is None or not _supported(d) or not on_tpu:
        return residual_layernorm_reference(x, delta, gamma, beta, eps)
    return _fused_residual_layernorm(x, delta, gamma, beta, eps)
