"""Fusion BERT: text encoder with optional per-layer cross-attention to image
states, plus MLM / LM heads.

Behavioral parity with the reference's modified HF fork
(``ALBEF_VQAttack/ALBEF_attack/models/xbert.py``):

- post-LN BERT layers; layers ``>= fusion_layer`` gain a cross-attention
  sub-block attending to image embeddings (``xbert.py:448-453``);
- three encoder modes (``xbert.py:549-559``): ``"text"`` runs layers
  ``[0, fusion_layer)``, ``"fusion"`` runs ``[fusion_layer, num_layers)`` on
  pre-embedded inputs, ``"multi_modal"`` runs the full stack;
- every forward threads a per-layer hidden-state list — embedding output plus
  each layer output (``xbert.py:561-562,609,638``) — returned here as one
  stacked array ``[B, L+1, S, D]``;
- the same module doubles as the causal answer decoder
  (``BertLMHeadModel``, ``xbert.py:1199``) via ``cfg.is_decoder`` +
  ``fusion_layer=0``;
- MLM prediction head: dense -> GELU -> LayerNorm -> vocab decoder
  (HF ``BertLMPredictionHead`` structure).

The mode is a static (trace-time) argument, so each mode compiles to its own
lean XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vqattack_tpu.config import BertConfig
from vqattack_tpu.models.layers import (  # noqa: I001
    resolve_dtype as _resolve_dtype,
    MultiHeadAttention,
    causal_bias,
    gelu,
    mask_to_bias,
)

Dtype = Any


def _sm(cfg):
    # config softmax dtype (string) -> jnp dtype; default f32
    return _resolve_dtype(getattr(cfg, 'softmax_dtype', 'float32'))


class BertEmbeddings(nn.Module):
    """word + position + token-type embeddings -> LayerNorm (HF layout)."""

    cfg: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        init = nn.initializers.normal(stddev=0.02)
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="word_embeddings",
        )(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="position_embeddings",
        )(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, embedding_init=init,
            dtype=self.dtype, name="token_type_embeddings",
        )(token_type_ids)
        x = word + pos + tok_type
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)


class _AttentionOutput(nn.Module):
    """HF BertSelfOutput: dense -> residual add -> LayerNorm (post-LN)."""

    cfg: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, residual: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="dense")(x)
        return nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, dtype=self.dtype, name="LayerNorm"
        )(x + residual)


class BertLayer(nn.Module):
    """One post-LN BERT layer with optional cross-attention (``xbert.py:442-520``)."""

    cfg: BertConfig
    has_cross_attention: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        self_bias: Optional[jnp.ndarray],
        encoder_states: Optional[jnp.ndarray] = None,
        cross_bias: Optional[jnp.ndarray] = None,
        cross_attn_scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        attn_out = MultiHeadAttention(
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            out_dim=cfg.num_heads * cfg.head_dim,
            use_out_proj=False,  # HF layout: proj lives in the output block
            remat_scores=cfg.remat_scores,
            softmax_dtype=_sm(cfg),
            dtype=self.dtype,
            name="attention_self",
        )(x, bias=self_bias)
        x = _AttentionOutput(cfg, dtype=self.dtype, name="attention_output")(attn_out, x)

        if self.has_cross_attention:
            assert encoder_states is not None, "cross-attention layer needs image states"
            cross_out = MultiHeadAttention(
                num_heads=cfg.num_heads,
                head_dim=cfg.head_dim,
                out_dim=cfg.num_heads * cfg.head_dim,
                use_out_proj=False,
                remat_scores=cfg.remat_scores,
                softmax_dtype=_sm(cfg),
                dtype=self.dtype,
                name="crossattention_self",
            )(x, kv=encoder_states, bias=cross_bias, attn_scale=cross_attn_scale)
            x = _AttentionOutput(cfg, dtype=self.dtype, name="crossattention_output")(
                cross_out, x
            )

        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        h = gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="output_LayerNorm")(
            h + x
        )
        return x


class BertPredictionHead(nn.Module):
    """MLM/LM head: dense -> GELU -> LayerNorm -> vocab decoder."""

    cfg: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform_dense")(x)
        x = gelu(x)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="transform_LayerNorm"
        )(x)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(x)


class FusionBert(nn.Module):
    """BERT encoder/decoder with fusion cross-attention and feature taps.

    ``mode`` (static): ``"text"`` | ``"fusion"`` | ``"multi_modal"``
    (``xbert.py:549-559``).  Inputs may be token ids (embedded internally) or
    pre-computed embeddings (``encoder_embeds`` path used by
    ``Gen_feats_from_embeds``, ``model_pretrain.py:85-104``).
    """

    cfg: BertConfig
    with_mlm_head: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embeddings = BertEmbeddings(cfg, dtype=self.dtype)
        layer_cls = nn.remat(BertLayer) if cfg.remat else BertLayer
        self.layers = [
            layer_cls(
                cfg,
                has_cross_attention=(i >= cfg.fusion_layer),
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(cfg.num_layers)
        ]
        if self.with_mlm_head:
            self.mlm_head = BertPredictionHead(cfg, dtype=self.dtype)

    def embed(
        self, input_ids: jnp.ndarray, token_type_ids: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.embeddings(input_ids, token_type_ids)

    def encode(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_mask: Optional[jnp.ndarray] = None,
        mode: str = "multi_modal",
        cross_attn_scale: Optional[jnp.ndarray] = None,
        cross_attn_scale_layer: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run the layer range selected by ``mode``.

        Returns ``(last_hidden, feats)`` where ``feats`` stacks the input plus
        every executed layer's output: ``[B, n_layers_run+1, S, D]``.

        ``cross_attn_scale``/``cross_attn_scale_layer``: multiplicative probe
        on one layer's cross-attention probabilities — differentiating a score
        w.r.t. the probe at ones yields grad x attention (Grad-CAM,
        ``utils/gradcam.py``).
        """
        cfg = self.cfg
        if mode == "text":
            start, stop = 0, cfg.fusion_layer
        elif mode == "fusion":
            start, stop = cfg.fusion_layer, cfg.num_layers
        elif mode == "multi_modal":
            start, stop = 0, cfg.num_layers
        else:
            raise ValueError(f"unknown mode: {mode}")

        self_bias = None
        if attention_mask is not None:
            self_bias = mask_to_bias(attention_mask, self.dtype)
        if cfg.is_decoder:
            cb = causal_bias(hidden_states.shape[1], self.dtype)
            self_bias = cb if self_bias is None else self_bias + cb

        # multi-stream cross-attention (NLVR: two images alternate per layer,
        # xbert BertLayer ``encoder_hidden_states[(layer - fusion) % n]``)
        multi_stream = isinstance(encoder_states, (tuple, list))
        if multi_stream:
            cross_biases = [
                mask_to_bias(m, self.dtype) if m is not None else None
                for m in (encoder_mask or [None] * len(encoder_states))
            ]
        else:
            cross_bias = (
                mask_to_bias(encoder_mask, self.dtype)
                if encoder_mask is not None
                else None
            )

        x = hidden_states
        feats = [x]
        for i in range(start, stop):
            if multi_stream and i >= cfg.fusion_layer:
                k = (i - cfg.fusion_layer) % len(encoder_states)
                enc, cb2 = encoder_states[k], cross_biases[k]
            else:
                enc = None if multi_stream else encoder_states
                cb2 = None if multi_stream else cross_bias
            probe = (
                cross_attn_scale
                if cross_attn_scale is not None and i == cross_attn_scale_layer
                else None
            )
            x = self.layers[i](x, self_bias, enc, cb2, cross_attn_scale=probe)
            feats.append(x)
        return x, jnp.stack(feats, axis=1)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_mask: Optional[jnp.ndarray] = None,
        mode: str = "multi_modal",
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """ids -> (last_hidden, feats, mlm_logits?)."""
        x = self.embeddings(input_ids, token_type_ids)
        last, feats = self.encode(
            x, attention_mask, encoder_states, encoder_mask, mode=mode
        )
        logits = self.mlm_head(last) if self.with_mlm_head else None
        return last, feats, logits

    def encode_embeds(
        self,
        embeds: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        encoder_mask: Optional[jnp.ndarray] = None,
        mode: str = "multi_modal",
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Pre-embedded inputs -> (last_hidden, feats, mlm_logits?)."""
        last, feats = self.encode(
            embeds, attention_mask, encoder_states, encoder_mask, mode=mode
        )
        logits = self.mlm_head(last) if self.with_mlm_head else None
        return last, feats, logits
