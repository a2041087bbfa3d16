"""Grad-CAM over cross-attention: the reference's visualization capability
(``ALBEF_attack/visualization.ipynb`` + the attention-gradient hooks in
``models/vit.py:46-56``).

jax has no hooks; instead the fusion encoder exposes a *differentiable
attention probe*: a multiplicative scale on one layer's cross-attention
probabilities (``FusionBert.encode(cross_attn_scale=...,
cross_attn_scale_layer=...)``).  Differentiating a scalar score w.r.t. the
probe evaluated at ones yields exactly ``grad x attention`` — the Grad-CAM
product — with no extra forward cost (one ordinary VJP).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gradcam_map(
    score_fn,
    attn_shape: Tuple[int, int, int, int],
    grid: Tuple[int, int],
    query_index: int = 0,
) -> np.ndarray:
    """Compute a Grad-CAM heat map.

    ``score_fn(attn_scale) -> scalar`` must run the model with the probe
    injected (see :func:`albef_question_gradcam` for a concrete wiring);
    ``attn_shape`` is [B, H, Q, K].  Returns ``[B, grid_h, grid_w]``:
    ``relu(d score / d scale)`` at ones (= relu(grad * attention)), mean over
    heads, at the chosen query token, [CLS] key dropped.
    """
    ones = jnp.ones(attn_shape, jnp.float32)
    grads = jax.grad(score_fn)(ones)  # [B, H, Q, K] = grad * attn
    cam = jnp.mean(jnp.maximum(grads, 0.0), axis=1)  # [B, Q, K]
    cam = cam[:, query_index, 1:]  # drop the image [CLS] key column
    return np.asarray(cam.reshape(cam.shape[0], *grid))


def albef_question_gradcam(
    model,
    variables,
    pixels: jnp.ndarray,
    text_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    layer: int = 8,
    query_index: int = 0,
) -> np.ndarray:
    """Where does the fusion encoder look when encoding this question?

    Scores the summed [CLS] activation of the joint encoding and maps its
    attention-gradient over the image patches at ``layer`` (the reference
    notebook uses a late fusion layer).  Returns ``[B, grid, grid]``.
    """
    from vqattack_tpu.models.bert import FusionBert

    b = pixels.shape[0]
    cfg = model.cfg
    heads = cfg.bert.num_heads
    q_len = text_ids.shape[1]
    n_img = (cfg.vit.image_size // cfg.vit.patch_size) ** 2 + 1
    grid = (cfg.vit.image_size // cfg.vit.patch_size,) * 2

    def score_fn(attn_scale):
        bound = model.bind(variables)
        image_embeds, _ = bound.visual_encoder(pixels)
        image_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        embeds = bound.text_encoder.embed(text_ids)
        last, _ = bound.text_encoder.encode(
            embeds, text_mask, image_embeds, image_mask, mode="multi_modal",
            cross_attn_scale=attn_scale, cross_attn_scale_layer=layer,
        )
        return jnp.sum(last[:, 0])

    return gradcam_map(score_fn, (b, heads, q_len, n_img), grid, query_index)
