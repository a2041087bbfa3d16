"""Shared transformer building blocks (flax.linen), TPU-first.

Design stance: parameters are float32; compute dtype is configurable
(``float32`` for attack-gradient parity, ``bfloat16`` for throughput).
Attention is plain batched einsum — at the reference's sequence lengths
(25-40 text / 901 image tokens, SURVEY §5.7) XLA's fused attention is already
near roofline; a Pallas flash-attention path lives in ``ops/`` as an option.

Reference parity targets: ``models/vit.py:32-94`` (timm attention/MLP),
``models/xbert.py:219-520`` (HF BERT attention stack),
``vlmo/modules/multiway_transformer.py:59-201`` (decomposed-bias attention,
layer-scale MoME block).  Re-derived, not translated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

NEG_INF = -1e9  # additive-mask fill; large-negative beats -inf under bf16


def resolve_dtype(d):
    """Config-string or jnp dtype -> jnp dtype (configs store strings)."""
    if isinstance(d, str):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[d]
    return d


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch ``nn.GELU`` default and HF ``"gelu"``."""
    return jax.nn.gelu(x, approximate=False)


def mask_to_bias(mask: jnp.ndarray, dtype: Dtype) -> jnp.ndarray:
    """[B, K] {0,1} key mask -> [B, 1, 1, K] additive attention bias."""
    bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(dtype)
    return bias[:, None, None, :]


def causal_bias(seq_len: int, dtype: Dtype) -> jnp.ndarray:
    """[1, 1, Q, K] additive causal bias (answer-decoder self-attention)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    bias = jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)
    return bias[None, None, :, :]


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference ``vit.py:11-29``)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class MultiHeadAttention(nn.Module):
    """Batched multi-head attention with separate q/k/v projections.

    Supports self- and cross-attention (``kv`` input), additive attention
    bias (VLMo relative-position bias), key masks, decomposed qkv-bias
    (VLMo: q and v biased, k un-biased — ``multiway_transformer.py:75-93``),
    and causal masking via the ``bias`` argument.

    Checkpoint conversion splits torch fused-qkv weights into the three
    separate kernels; numerics are identical.
    """

    num_heads: int
    head_dim: int
    out_dim: int
    q_bias: bool = True
    k_bias: bool = True
    v_bias: bool = True
    # when False, returns the merged head context without the output
    # projection — the HF BERT layout keeps that dense in its own
    # "attention output" block (post-LN residual)
    use_out_proj: bool = True
    # checkpoint ONLY the [B, H, Sq, Sk] score/prob tensors: the attack
    # backward recomputes them from (q, k, v) instead of keeping them live
    # across forward->backward.  Unlike full block remat this stores every
    # O(S*D) activation and recomputes only the O(S^2) ones — the selective
    # point between the remat on/off extremes A/B'd in PERF.md.
    remat_scores: bool = False
    # dtype of the softmax pipeline over the [B,H,Sq,Sk] scores.  float32
    # (default) matches the reference bit-for-bit; under a bf16 trunk the
    # f32 max/exp/sum passes over the score tensor are ~1/3 of all program
    # bytes — softmax_dtype=bfloat16 halves them (byte-reduction lever,
    # trajectory-drift validated like the bf16 trunk; A/B in PERF.md r3)
    softmax_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        attn_scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        kv = x if kv is None else kv
        d = self.num_heads * self.head_dim

        q = nn.Dense(d, use_bias=self.q_bias, dtype=self.dtype, name="query")(x)
        k = nn.Dense(d, use_bias=self.k_bias, dtype=self.dtype, name="key")(kv)
        v = nn.Dense(d, use_bias=self.v_bias, dtype=self.dtype, name="value")(kv)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, self.head_dim)

        q, k, v = split(q), split(k), split(v)
        scale = self.head_dim ** -0.5

        from vqattack_tpu.ops import attention as attn_backend

        # the Grad-CAM probe needs the materialized attention matrix, which
        # flash never forms — fall back to einsum whenever a probe is passed
        # (a flash branch would silently return zero probe gradients)
        if (attn_backend.get_impl() == "flash" and q.shape[1] >= 128
                and attn_scale is None):
            out = attn_backend.flash_attention(q, k, v, bias, scale)
        else:
            def _attn_out(q, k, v, bias, attn_scale):
                attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
                if bias is not None:
                    attn = attn + bias.astype(attn.dtype)
                attn = jax.nn.softmax(
                    attn.astype(self.softmax_dtype), axis=-1
                ).astype(self.dtype)
                if attn_scale is not None:
                    # differentiable probe: d(score)/d(attn_scale) at ones
                    # equals grad x attention — the Grad-CAM product
                    # (utils/gradcam.py)
                    attn = attn * attn_scale
                return jnp.einsum("bhqk,bkhd->bqhd", attn, v)

            if self.remat_scores:
                # residuals = (q, k, v, bias) only; the O(S^2) scores, probs
                # and softmax internals are rebuilt in the backward pass —
                # one extra QK^T + softmax per layer instead of keeping
                # [B, H, S, S] live across the whole trunk backward
                _attn_out = jax.checkpoint(
                    _attn_out, policy=jax.checkpoint_policies.nothing_saveable
                )
            out = _attn_out(q, k, v, bias, attn_scale)
        out = out.reshape(out.shape[0], out.shape[1], d)
        if not self.use_out_proj:
            return out
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(out)


class ResidualLayerNorm(nn.Module):
    """``(x + delta, LayerNorm(x + delta))`` with the parameter tree of a
    plain ``nn.LayerNorm`` (``scale``/``bias``) so checkpoint conversion is
    untouched.  On TPU with 128-multiple widths this runs the fused Pallas
    kernel (``ops/fused_ln.py``) — one pass instead of XLA's separate
    add fusion + latency-bound convert+reduce stat fusion; elsewhere it
    falls back to the numerically-equivalent jnp twin."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, delta):
        from vqattack_tpu.ops.fused_ln import residual_layernorm

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        x = x.astype(self.dtype)
        if delta is not None:
            delta = delta.astype(self.dtype)
        return residual_layernorm(x, delta, scale, bias, self.epsilon)


class ViTBlock(nn.Module):
    """Pre-LN transformer block (reference ``vit.py:77-94``).

    With ``fused_ln`` the block takes and returns a *pending-residual* pair
    — ``__call__(x, delta)`` first materializes ``x + delta`` (the previous
    block's un-added MLP output) through the fused residual+LayerNorm
    kernel, and returns its own MLP output un-added — so every LayerNorm in
    the trunk fuses with the residual add that produces its input.  The
    trunk closes the last pending pair with the final norm (see
    ``VisionTransformer``).  Same math; A/B'd in PERF.md round 3.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    remat_scores: bool = False
    fused_ln: bool = False
    softmax_dtype: Dtype = jnp.float32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, delta: Optional[jnp.ndarray] = None):
        dim = x.shape[-1]
        head_dim = dim // self.num_heads
        attn = MultiHeadAttention(
            num_heads=self.num_heads,
            head_dim=head_dim,
            out_dim=dim,
            remat_scores=self.remat_scores,
            softmax_dtype=resolve_dtype(self.softmax_dtype),
            dtype=self.dtype,
            name="attn",
        )
        mlp = Mlp(hidden_dim=int(dim * self.mlp_ratio), out_dim=dim,
                  dtype=self.dtype, name="mlp")
        if self.fused_ln:
            # returns (s, d_out, x_tap): x_tap = x + delta is this block's
            # INPUT stream (the previous block's feature tap); s + d_out is
            # its un-added output, summed by the next block / final norm
            x, h = ResidualLayerNorm(epsilon=self.layer_norm_eps,
                                     dtype=self.dtype, name="norm1")(x, delta)
            s, h2 = ResidualLayerNorm(epsilon=self.layer_norm_eps,
                                      dtype=self.dtype, name="norm2")(x, attn(h))
            return s, mlp(h2), x

        assert delta is None
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        x = x + attn(h)
        h = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + mlp(h)
        return x


class _PatchProj(nn.Module):
    """Parameter container matching ``nn.Conv``'s HWIO kernel layout, so
    checkpoints written for/by the conv formulation load unchanged."""

    patch_size: int
    in_chans: int
    hidden_size: int
    use_bias: bool

    @nn.compact
    def __call__(self) -> tuple:
        p = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, self.in_chans, self.hidden_size),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.hidden_size,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


class PatchEmbed(nn.Module):
    """Patchify + project (reference timm ``PatchEmbed`` /
    ``multiway_transformer.py:204-241``).

    A stride-p VALID pxp conv is a block-diagonal matmul; expressed as a
    conv, XLA:TPU ran it at 9-17 TFLOP/s / 23-44 GiB/s (round-5 profile:
    123 ms of roofline slack per 40-iter b=16 scan, fwd+bwd).  Expressed as
    space-to-depth + one [p*p*C, D] matmul it tiles onto the MXU like every
    other projection.  Same math, same HWIO param layout as ``nn.Conv``
    (checkpoint-compatible); exactness vs the conv pinned in
    tests/test_models_basic.py::test_patch_embed_matches_conv."""

    patch_size: int
    hidden_size: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        b, h, w, c = pixels.shape
        kernel, bias = _PatchProj(
            p, c, self.hidden_size, self.use_bias, name="proj"
        )()
        # [B, H, W, C] -> [B, nh, p, nw, p, C] -> [B, nh*nw, p*p*C]
        # (patch-row, patch-col, channel) flattening matches the HWIO
        # kernel's reduction order exactly
        x = pixels.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
        x = x.astype(self.dtype)
        out = x @ kernel.reshape(p * p * c, self.hidden_size).astype(self.dtype)
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out
