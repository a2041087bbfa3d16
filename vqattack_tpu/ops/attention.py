"""Attention backend selection: XLA einsum vs Pallas flash attention.

At the reference's sequence lengths (25-40 text, 901 image tokens @480px,
941 joint) XLA's fused attention is close to roofline (SURVEY §5.7), but the
Pallas flash kernel avoids materializing the [B, H, S, S] score tensor in the
backward pass — the main HBM saving for the 941-token joint attention inside
the PGD gradient.  Backend choice is a trace-time global:

    with attention_impl("flash"):
        model.apply(...)

The flash path wraps ``jax.experimental.pallas.ops.tpu.flash_attention``
(differentiable, additive-bias ``ab`` support), padding sequence lengths to
the 128-lane block size and masking padded keys with the bias.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = "xla"


def get_impl() -> str:
    return _IMPL


@contextlib.contextmanager
def attention_impl(kind: str):
    """kind: "xla" | "flash"."""
    global _IMPL
    assert kind in ("xla", "flash"), kind
    prev = _IMPL
    _IMPL = kind
    try:
        yield
    finally:
        _IMPL = prev


def _pad_to(x: jnp.ndarray, axis: int, size: int) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],  # [B or 1, H, Sq, Sk] additive
    scale: float,
) -> jnp.ndarray:
    """Pallas flash attention with sequence padding; returns [B, S, H, Dh]."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as _fa,
    )

    b, sq, h, d = q.shape
    sk = k.shape[1]
    blk = 128
    sq_p = -(-sq // blk) * blk
    sk_p = -(-sk // blk) * blk

    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), 2, sq_p)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), 2, sk_p)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), 2, sk_p)

    if bias is None:
        bias = jnp.zeros((1, 1, sq, sk), q.dtype)
    # the kernel computes softmax((q@k + ab) * sm_scale): pre-divide so our
    # additive bias lands post-scale like the einsum path
    ab = jnp.broadcast_to(bias, (b, bias.shape[1], sq, sk)).astype(jnp.float32) / scale
    ab = _pad_to(_pad_to(ab, 2, sq_p), 3, sk_p)
    if sk_p > sk:
        # padded keys must not receive weight
        key_pad = (jnp.arange(sk_p) >= sk).astype(jnp.float32) * -1e9
        ab = ab + key_pad[None, None, None, :]
    if ab.shape[1] == 1:
        ab = jnp.broadcast_to(ab, (b, h, sq_p, sk_p))

    sizes = BlockSizes(
        block_q=min(blk, sq_p), block_k_major=min(blk, sk_p), block_k=min(blk, sk_p),
        block_b=1,
        block_q_major_dkv=min(blk, sq_p), block_k_major_dkv=min(blk, sk_p),
        block_k_dkv=min(blk, sk_p), block_q_dkv=min(blk, sq_p),
        block_k_major_dq=min(blk, sk_p), block_k_dq=min(blk, sk_p),
        block_q_dq=min(blk, sq_p),
    )
    out = _fa(qt, kt, vt, ab=ab, sm_scale=scale, block_sizes=sizes)
    out = out[:, :, :sq, :]
    return jnp.transpose(out, (0, 2, 1, 3))
