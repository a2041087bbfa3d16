"""ALBEF downstream-task heads beyond VQA: visual entailment, NLVR2,
image-text retrieval.

Parity targets (upstream models kept by the reference, SURVEY §2.1
"Other ALBEF task models"):

- ``models/model_ve.py``      — 12-layer fusion encoder + 2-layer ReLU cls
  head (3 classes: entail/neutral/contradict);
- ``models/model_nlvr.py``    — 18-layer encoder whose cross-attention
  alternates between the two image streams per layer (``(layer - fusion) %
  2`` routing), 2-way head; the reference ties each pair of cross-attention
  layers (``share_cross_attention``) — converted checkpoints carry the tied
  weights, so plain loading reproduces it;
- ``models/model_retrieval.py`` — ITA projections + ITM head with the
  two-stage retrieval scoring (contrastive shortlist, ITM re-rank).

Momentum-distillation teacher copies are handled functionally
(:func:`vqattack_tpu.train.objectives.momentum_update`) rather than as
duplicate submodules.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqattack_tpu.config import ALBEFConfig
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.models.vit import VisionTransformer

Dtype = Any


class ClsHead(nn.Module):
    """dense -> ReLU -> dense (``model_ve.py:28-32``)."""

    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc1")(x)
        h = jax.nn.relu(h)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(h)


class AlbefVE(nn.Module):
    """Visual entailment (SNLI-VE): joint encode -> 3-way head."""

    cfg: ALBEFConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual_encoder = VisionTransformer(self.cfg.vit, dtype=self.dtype)
        self.text_encoder = FusionBert(self.cfg.bert, dtype=self.dtype)
        self.cls_head = ClsHead(3, dtype=self.dtype)

    def __call__(self, pixels, text_ids, text_mask) -> jnp.ndarray:
        image_embeds, _ = self.visual_encoder(pixels)
        image_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        last, _, _ = self.text_encoder(
            text_ids, attention_mask=text_mask,
            encoder_states=image_embeds, encoder_mask=image_mask,
            mode="multi_modal",
        )
        return self.cls_head(last[:, 0])


class AlbefNLVR(nn.Module):
    """NLVR2: one statement, two images, alternating cross-attention
    (``model_nlvr.py:58-75``).  ``pixels`` stacks both images:
    [2B, H, W, 3] with image0 first."""

    cfg: ALBEFConfig
    num_layers: int = 18  # model_nlvr.py:25 bert_config.num_hidden_layers=18
    dtype: Dtype = jnp.float32

    def setup(self):
        import dataclasses

        bert = dataclasses.replace(self.cfg.bert, num_layers=self.num_layers)
        self.visual_encoder = VisionTransformer(self.cfg.vit, dtype=self.dtype)
        self.text_encoder = FusionBert(bert, dtype=self.dtype)
        self.cls_head = ClsHead(2, dtype=self.dtype)

    def __call__(self, pixels, text_ids, text_mask) -> jnp.ndarray:
        b = text_ids.shape[0]
        image_embeds, _ = self.visual_encoder(pixels)
        img0, img1 = image_embeds[:b], image_embeds[b:]
        mask0 = jnp.ones(img0.shape[:2], jnp.int32)
        mask1 = jnp.ones(img1.shape[:2], jnp.int32)
        embeds = self.text_encoder.embed(text_ids)
        last, _ = self.text_encoder.encode(
            embeds, text_mask, (img0, img1), (mask0, mask1), mode="multi_modal"
        )
        return self.cls_head(last[:, 0])


class AlbefRetrieval(nn.Module):
    """Image-text retrieval: ITA projections for the contrastive shortlist +
    fusion ITM head for re-ranking (``model_retrieval.py``)."""

    cfg: ALBEFConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = VisionTransformer(cfg.vit, dtype=self.dtype)
        self.text_encoder = FusionBert(cfg.bert, dtype=self.dtype)
        self.vision_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype)
        self.text_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype)
        self.itm_head = nn.Dense(2, dtype=self.dtype)
        self.temp = self.param("temp", nn.initializers.constant(cfg.temp), ())

    def image_features(self, pixels) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(normalized ITA feature [B,E], full embeds [B,N,D])."""
        image_embeds, _ = self.visual_encoder(pixels)
        feat = self.vision_proj(image_embeds[:, 0])
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True), image_embeds

    def text_features(self, text_ids, text_mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
        last, _, _ = self.text_encoder(
            text_ids, attention_mask=text_mask, mode="text"
        )
        feat = self.text_proj(last[:, 0])
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True), last

    def itm_score(
        self, text_embeds, text_mask, image_embeds
    ) -> jnp.ndarray:
        """Fusion-layer match logits for re-ranking shortlisted pairs
        (``model_retrieval.py`` k_test re-rank; SURVEY §2.1)."""
        image_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        last, _ = self.text_encoder.encode(
            text_embeds, text_mask, image_embeds, image_mask, mode="fusion"
        )
        return self.itm_head(last[:, 0])

    def __call__(self, pixels, text_ids, text_mask):
        img_feat, image_embeds = self.image_features(pixels)
        txt_feat, text_embeds = self.text_features(text_ids, text_mask)
        sim = img_feat @ txt_feat.T / self.temp
        itm = self.itm_score(text_embeds, text_mask, image_embeds)
        return sim, itm
