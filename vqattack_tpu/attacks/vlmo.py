"""VLMo attack-loss builders.

The VLMo feature loss differs from ALBEF's (VLMo cleverhans copy,
``fast_gradient_method.py:100-116``): per layer it combines a **cls-feature
cosine** (``out[1]`` = per-layer cls states) with the token-feature cosine sum
over the valid text tokens + all image tokens (``out[2]``)::

    loss = sum_layers( -cos(layer_cls, tgt_layer_cls)
                       + sum_tokens( -cos(token_feats, tgt_token_feats) ) )

The reference gathers valid text tokens (``vlmo_module.py:1441-1444``) and
truncates to the min length when adv/clean token counts differ; here both
sides stay ``[B, L+1, S, D]`` with an elementwise product of the two validity
masks — identical when the masks agree (always, for the 1:1 single-token
substitutions the schedule produces) and the static-shape analogue otherwise.

MAR loss: CE of ``mlm_score`` logits over the text half vs the stacked
answer-masked labels — same functional form as ALBEF
(:func:`vqattack_tpu.attacks.losses.mlm_loss`).

``aux`` schema: ``variables, text_ids, text_mask, mlm_ids, mlm_mask,
mlm_labels, tgt_layer_cls [B,L+1,D], tgt_tokens [B,L+1,S,D],
tgt_token_mask [B,S]``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from vqattack_tpu.attacks.losses import cosine_sim, per_sample_mlm_loss
from vqattack_tpu.models.vlmo import VLMo


def vlmo_per_sample_feature_loss(
    layer_cls, tokens, tgt_layer_cls, tgt_tokens, token_mask
) -> jnp.ndarray:
    """``tokens`` is the stacked [B, L+1, S, D] array or a tuple of per-layer
    [B, S, D] tensors (``VLMo(fused_feats=True)``) — the tuple form reduces
    each layer's cosine in place without materializing the stack."""
    cos_cls = cosine_sim(layer_cls, tgt_layer_cls)            # [B, L+1]
    ps = -jnp.sum(cos_cls, axis=1)
    if isinstance(tokens, (tuple, list)):
        tgt_of = (
            (lambda l: tgt_tokens[l])
            if isinstance(tgt_tokens, (tuple, list))
            else (lambda l: tgt_tokens[:, l])
        )
        for l, f in enumerate(tokens):
            c = cosine_sim(f, tgt_of(l)) * token_mask         # [B, S]
            ps = ps - jnp.sum(c, axis=1)
        return ps
    cos_tok = cosine_sim(tokens, tgt_tokens)                  # [B, L+1, S]
    cos_tok = cos_tok * token_mask[:, None, :]
    return ps - jnp.sum(cos_tok, axis=(1, 2))


@functools.lru_cache(maxsize=None)
def make_feature_loss(model: VLMo):
    """ls==1 loss over the MoME trunk (``pgd_attack`` closure)."""

    def loss_fn(adv_px, key, aux):
        del key  # VLMo's attack forward has no stochastic masking
        _, layer_cls, tokens, token_mask = model.apply(
            aux["variables"], adv_px, aux["text_ids"], aux["text_mask"],
            aux.get("rel_biases"), method=VLMo.attack_feats,
        )
        mask = token_mask.astype(jnp.float32) * aux["tgt_token_mask"]
        ps = vlmo_per_sample_feature_loss(
            layer_cls, tokens, aux["tgt_layer_cls"], aux["tgt_tokens"], mask
        )
        return jnp.sum(ps), ps

    return loss_fn


@functools.lru_cache(maxsize=None)
def make_mlm_loss(model: VLMo):
    """ls==0 MAR loss (``pgd_mlm_attack`` closure + fgm ls==0 branch)."""

    def loss_fn(adv_px, key, aux):
        del key
        mlm_logits, _, _, _ = model.apply(
            aux["variables"], adv_px, aux["mlm_ids"], aux["mlm_mask"],
            aux.get("rel_biases"), method=VLMo.attack_mlm,
        )
        ps = per_sample_mlm_loss(mlm_logits, aux["mlm_labels"])
        return jnp.sum(ps), ps

    return loss_fn


@functools.lru_cache(maxsize=None)
def make_vl_loss(model: VLMo):
    """Joint image+text-embedding loss (``pgd_attack_vl`` closure)."""

    def loss_fn(adv_px, text_embeds, key, aux):
        del key
        _, layer_cls, tokens, token_mask = model.apply(
            aux["variables"], adv_px, text_embeds, aux["text_mask"],
            aux.get("rel_biases"), method=VLMo.attack_feats_from_embeds,
        )
        mask = token_mask.astype(jnp.float32) * aux["tgt_token_mask"]
        ps = vlmo_per_sample_feature_loss(
            layer_cls, tokens, aux["tgt_layer_cls"], aux["tgt_tokens"], mask
        )
        return jnp.sum(ps), ps

    return loss_fn
