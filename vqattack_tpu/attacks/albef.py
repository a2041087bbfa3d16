"""ALBEF attack-loss builders: bind the surrogate to the PGD kernels.

The reference wires the attack through bound-method closures
(``Adv_attack.pgd_attack:119``, ``.pgd_mlm_attack:130``, ``.pgd_attack_vl:208``
reading the mutable ``self.batch``).  Here each closure becomes a pure,
cached, module-keyed loss function with the per-batch state in a traced
``aux`` pytree (see ``attacks/pgd.py`` loss-fn contract), so a new sample
batch re-uses the compiled program.

``aux`` schema (arrays; built by the orchestrator):

- ``variables``:      surrogate param tree
- ``text_ids``:       [B, S] current (adversarial) question ids
- ``text_mask``:      [B, S]
- ``tgt_txt``/``tgt_img``: clean per-layer feature stacks [B, L, S, D]
- ``txt_token_mask``: [B, S] min-length cosine mask (fgm:121-126 truncation)
- ``mlm_ids``/``mlm_mask``: [B, S] answer-masked paraphrase (MAR path)
- ``mlm_labels``:     [B, S] or [B, A, S] MAR labels (-100 = ignore)
- ``special_ids``:    (mask_token_id, pad_token_id, cls_token_id)
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from vqattack_tpu.attacks.losses import (
    per_sample_feature_loss,
    per_sample_mlm_loss,
)
from vqattack_tpu.models.albef import AlbefPretrain, mlm_random_mask


def _masked_ids(key, ids, model, special):
    mask_id, pad_id, cls_id = special
    out, _ = mlm_random_mask(
        key,
        ids,
        vocab_size=model.cfg.bert.vocab_size,
        mask_token_id=mask_id,
        pad_token_id=pad_id,
        cls_token_id=cls_id,
        mlm_probability=model.cfg.mlm_probability,
    )
    return out


@functools.lru_cache(maxsize=None)
def make_feature_loss(model: AlbefPretrain):
    """ls==1 latent-feature loss over the surrogate (``pgd_attack`` +
    ``fgm:120-127``)."""

    def loss_fn(adv_px, key, aux):
        ids = _masked_ids(key, aux["text_ids"], model, aux["special_ids"])
        img_f, txt_f, _ = model.apply(
            aux["variables"], adv_px, ids, aux["text_mask"],
            method=AlbefPretrain.gen_feats,
        )
        ps = per_sample_feature_loss(
            txt_f, img_f, aux["tgt_txt"], aux["tgt_img"],
            txt_token_mask=aux.get("txt_token_mask"),
        )
        return jnp.sum(ps), ps

    return loss_fn


@functools.lru_cache(maxsize=None)
def make_mlm_loss(model: AlbefPretrain):
    """ls==0 masked-answer-recovery loss (``pgd_mlm_attack`` +
    ``fgm:128-142``): CE of MLM logits on the answer-masked paraphrase."""

    def loss_fn(adv_px, key, aux):
        ids = _masked_ids(key, aux["mlm_ids"], model, aux["special_ids"])
        logits = model.apply(
            aux["variables"], adv_px, ids, aux["mlm_mask"],
            method=AlbefPretrain.get_mlm_logits,
        )
        ps = per_sample_mlm_loss(logits, aux["mlm_labels"])
        return jnp.sum(ps), ps

    return loss_fn


@functools.lru_cache(maxsize=None)
def make_vl_loss(model: AlbefPretrain):
    """Joint image+text-embedding feature loss (``pgd_attack_vl`` +
    ``fgm_vl:96-116``) — differentiable in both inputs."""

    def loss_fn(adv_px, text_embeds, key, aux):
        del key  # the from-embeds path bypasses id masking (model_pretrain.py:95-99)
        img_f, txt_f = model.apply(
            aux["variables"], adv_px, text_embeds, aux["text_mask"],
            method=AlbefPretrain.gen_feats_from_embeds,
        )
        ps = per_sample_feature_loss(
            txt_f, img_f, aux["tgt_txt"], aux["tgt_img"],
            txt_token_mask=aux.get("txt_token_mask"),
        )
        return jnp.sum(ps), ps

    return loss_fn
