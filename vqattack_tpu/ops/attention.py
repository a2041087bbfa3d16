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


def set_impl(kind: str) -> None:
    """Process-wide backend choice (the CLI ``--attn`` flag); prefer the
    :func:`attention_impl` context in library code."""
    global _IMPL
    assert kind in ("xla", "flash"), kind
    _IMPL = kind


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


def _prepare(q, k, v, bias, scale):
    """Padding / masking prep for the kernel call (pure, CPU-testable).

    Returns ``(qt, kt, vt, ab, segment_ids, sq)`` with q/k/v transposed to
    the kernel's [B, H, S, Dh] layout and sequence lengths padded to the
    128-lane block size.  ``segment_ids`` is a ``(q_ids, kv_ids)`` int32
    pair or None; ``ab`` is the padded post-pad additive bias or None —
    never both.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    blk = 128
    sq_p = -(-sq // blk) * blk
    sk_p = -(-sk // blk) * blk

    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), 2, sq_p)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), 2, sk_p)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), 2, sk_p)

    segment_ids = None
    ab = None
    if bias is None:
        # No additive bias (the ViT joint-image case — the hot attention of
        # the headline attack): handle the 901->1024 sequence padding with
        # segment ids instead of a materialized [B, H, S, S] bias, which
        # would reintroduce exactly the HBM score-tensor traffic flash
        # attention exists to avoid.  Real tokens are segment 0; padded
        # rows/keys are segment 1, so padded q rows still attend to the
        # padded keys (finite garbage, sliced off below) while real rows
        # never see them.
        if sq_p > sq or sk_p > sk:
            q_seg = (jnp.arange(sq_p) >= sq).astype(jnp.int32)
            kv_seg = (jnp.arange(sk_p) >= sk).astype(jnp.int32)
            segment_ids = (
                jnp.broadcast_to(q_seg, (b, sq_p)),
                jnp.broadcast_to(kv_seg, (b, sk_p)),
            )
    else:
        # the kernel computes softmax((q@k + ab) * sm_scale): pre-divide so
        # our additive bias lands post-scale like the einsum path.
        # KNOWN COST: this materializes a [B, H, Sq_p, Sk_p] f32 bias (plus
        # its dab in backward) — for a genuinely dense bias (VLMo rel-pos)
        # there is no smaller exact representation the kernel accepts, and
        # it's one reason the flash path measures slower than XLA's fused
        # attention at this geometry (PERF.md); a pure key-mask bias could
        # in principle ride segment_ids instead, but every bias-carrying
        # caller here fuses the dense rel-pos component anyway
        ab = jnp.broadcast_to(bias, (b, bias.shape[1], sq, sk)).astype(jnp.float32) / scale
        ab = _pad_to(_pad_to(ab, 2, sq_p), 3, sk_p)
        if sk_p > sk:
            # padded keys must not receive weight
            key_pad = (jnp.arange(sk_p) >= sk).astype(jnp.float32) * -1e9
            ab = ab + key_pad[None, None, None, :]
        if ab.shape[1] == 1:
            ab = jnp.broadcast_to(ab, (b, h, sq_p, sk_p))

    return qt, kt, vt, ab, segment_ids, sq


def _block_size(req: int, padded: int) -> int:
    """Largest block <= ``req`` that divides ``padded``.

    The pallas kernel requires block | padded length; ``padded`` is a
    multiple of 128 (see :func:`_prepare`), so stepping down in 128s always
    terminates at a valid divisor (worst case 128 itself — e.g.
    S_p=1408=128*11, where neither 1024 nor any larger multiple of 128
    divides)."""
    blk = min(req, padded)
    while padded % blk:
        blk -= 128
    return blk

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
        SegmentIds,
        flash_attention as _fa,
    )

    qt, kt, vt, ab, seg, sq = _prepare(q, k, v, bias, scale)
    sq_p, sk_p = qt.shape[2], kt.shape[2]
    # Grid granularity: the 128-lane minimum makes a (b, h, sq/128) grid of
    # tiny programs whose launch/pipeline overhead dominated the round-1/2
    # A/Bs; the on-chip retune (scripts/flash_blocks.py, PERF.md) found
    # whole-sequence 1024 blocks fastest at S~1k — big enough to beat XLA's
    # fused attention at b>=8.  Env-tunable for new geometries; _block_size
    # reduces to the largest request that divides the padded lengths.
    import os as _os

    bq = _block_size(int(_os.environ.get("VQATTACK_FLASH_BLOCK_Q", "1024")), sq_p)
    bk = _block_size(int(_os.environ.get("VQATTACK_FLASH_BLOCK_K", "1024")), sk_p)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk,
        block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk,
        block_q_dq=bq,
    )
    segment_ids = SegmentIds(q=seg[0], kv=seg[1]) if seg is not None else None
    out = _fa(qt, kt, vt, ab=ab, segment_ids=segment_ids, sm_scale=scale,
              block_sizes=sizes)
    out = out[:, :, :sq, :]
    return jnp.transpose(out, (0, 2, 1, 3))
