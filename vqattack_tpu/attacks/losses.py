"""The VQAttack loss surface.

Two losses drive the image PGD (SURVEY §0):

- **latent-feature loss** (``ls==1``): summed negative cosine similarity
  between adversarial and clean per-layer hidden states, over every layer and
  token of both modalities
  (``cleverhans/.../fast_gradient_method.py:120-127``);
- **masked-answer (MAR) loss** (``ls==0``): cross-entropy of the surrogate's
  MLM logits against the answer-masked paraphrase, maximized to push the model
  away from recovering the answer; multi-answer variants stack along a label
  axis and their CE terms add (``fast_gradient_method.py:128-142``).

Batched formulation: the reference runs batch=1 with features laid out
``[layers, seq, dim]``; here everything is ``[B, L, S, D]`` and reductions are
per-sample (summed over the batch for the scalar the gradient needs — per-
sample gradients are unaffected because samples don't interact).

The reference's ragged min-seq-length truncation (``fgm:121-126``) — needed
because adversarial re-tokenization changes text length — becomes a static-
shape token *mask* here: positions beyond either sequence's true length simply
contribute zero cosine.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100
_COS_EPS = 1e-6


def cosine_sim(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """torch ``nn.CosineSimilarity(eps=1e-6)`` semantics: each vector's norm
    is floored at eps before the division."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), _COS_EPS)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), _COS_EPS)
    return jnp.sum(a * b, axis=axis) / (na * nb)


def _neg_cos_sum(adv, tgt, token_mask=None) -> jnp.ndarray:
    """Per-sample ``-sum(cos)`` over layers+tokens -> [B].

    ``adv`` is either a stacked ``[B, L, S, D]`` array or a tuple of per-layer
    ``[B, S, D]`` tensors (``stack_feats=False`` fused path); ``tgt`` is
    always the stacked clean target.  The tuple form lets XLA reduce each
    layer's cosine in place without materializing the adversarial stack.
    """
    if isinstance(adv, (tuple, list)):
        tgt_of = (
            (lambda l: tgt[l])
            if isinstance(tgt, (tuple, list))
            else (lambda l: tgt[:, l])
        )
        ps = 0.0
        for l, f in enumerate(adv):
            c = cosine_sim(f, tgt_of(l))  # [B, S]
            if token_mask is not None:
                c = c * token_mask
            ps = ps - jnp.sum(c, axis=1)
        return ps
    c = cosine_sim(adv, tgt)  # [B, L, S]
    if token_mask is not None:
        c = c * token_mask[:, None, :]
    return -jnp.sum(c, axis=(1, 2))


def feature_loss(
    adv_txt: jnp.ndarray,
    adv_img: jnp.ndarray,
    tgt_txt: jnp.ndarray,
    tgt_img: jnp.ndarray,
    txt_token_mask: Optional[jnp.ndarray] = None,
    img_token_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum over layers+tokens of -cos(adv, clean), text + image stacks.

    Feature stacks: ``[B, L, S, D]``.  ``*_token_mask``: ``[B, S]`` with 1 on
    positions that should contribute (the reference's min-length truncation).
    Returns the scalar loss (summed over the batch).
    """
    return jnp.sum(
        per_sample_feature_loss(
            adv_txt, adv_img, tgt_txt, tgt_img, txt_token_mask, img_token_mask
        )
    )


def per_sample_feature_loss(
    adv_txt, adv_img, tgt_txt, tgt_img, txt_token_mask=None, img_token_mask=None
) -> jnp.ndarray:
    """[B]-shaped variant (for loss trajectories).  Either feature argument
    may be a per-layer tuple (see :func:`_neg_cos_sum`)."""
    return _neg_cos_sum(adv_txt, tgt_txt, txt_token_mask) + _neg_cos_sum(
        adv_img, tgt_img, img_token_mask
    )


def _ce_per_sample(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean CE with ignore_index=-100.  logits [B,S,V], labels
    [B,S] -> [B].  Samples with zero valid labels contribute 0."""
    valid = (labels != IGNORE_INDEX).astype(jnp.float32)
    safe_labels = jnp.where(labels == IGNORE_INDEX, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    count = jnp.sum(valid, axis=-1)
    return jnp.sum(nll * valid, axis=-1) / jnp.maximum(count, 1.0)


def mlm_loss(
    mlm_logits: jnp.ndarray,
    mlm_labels: jnp.ndarray,
) -> jnp.ndarray:
    """Masked-answer CE, scalar.

    ``mlm_labels``: ``[B, S]`` (single answer) or ``[B, A, S]`` (stacked
    multi-answer variants, ``adv_attack.py:555-558``) — variant CE terms add
    (``fast_gradient_method.py:136-139``).  Padded variants (all -100)
    contribute zero.  Per-sample normalization then batch sum: identical to
    the reference at batch=1, per-sample-correct at batch>1.
    """
    if mlm_labels.ndim == 2:
        return jnp.sum(_ce_per_sample(mlm_logits, mlm_labels))
    # [B, A, S]: vmap CE over the answer-variant axis
    per_variant = jax.vmap(lambda lab: _ce_per_sample(mlm_logits, lab), in_axes=1, out_axes=1)(
        mlm_labels
    )  # [B, A]
    return jnp.sum(per_variant)


def per_sample_mlm_loss(mlm_logits: jnp.ndarray, mlm_labels: jnp.ndarray) -> jnp.ndarray:
    if mlm_labels.ndim == 2:
        return _ce_per_sample(mlm_logits, mlm_labels)
    per_variant = jax.vmap(lambda lab: _ce_per_sample(mlm_logits, lab), in_axes=1, out_axes=1)(
        mlm_labels
    )
    return jnp.sum(per_variant, axis=1)
