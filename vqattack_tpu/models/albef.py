"""ALBEF surrogate (pre-trained) and victim (VQA fine-tuned) models.

Parity targets:

- surrogate: ``ALBEF_VQAttack/ALBEF_attack/models/model_pretrain.py:20-141`` —
  ViT-B/16 + fusion ``BertForMaskedLM``; the attack-facing API is
  ``Gen_feats`` (per-layer image+text feature stacks), ``Gen_feats_from_embeds``
  (text-embedding-differentiable variant; ``encoder_embeds`` overrides the
  ids — xbert ``BertModel.forward`` embeds only when ``encoder_embeds`` is
  None), and ``get_mlm_logits``.  All three re-apply random 15% MLM masking to
  the input ids (``model_pretrain.py:91-93,111-113,130-132``); here that
  stochasticity is factored out into the pure, explicitly-keyed
  :func:`mlm_random_mask`, applied by the caller, which makes the PGD scan
  reproducible (SURVEY §5.2 flags the reference's implicit global RNG as a
  reproducibility hazard).

- victim: ``models/model_vqa.py:11-211`` — 12-layer fusion text encoder +
  6-layer causal answer decoder (``fusion_layer=0``), with the two-pass
  ``rank_answer`` top-k re-ranking (``model_vqa.py:149-203``) re-formulated
  with static shapes for XLA.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqattack_tpu.config import ALBEFConfig
from vqattack_tpu.models.bert import FusionBert
from vqattack_tpu.models.vit import VisionTransformer

Dtype = Any
IGNORE_INDEX = -100


def mlm_random_mask(
    rng: jax.Array,
    input_ids: jnp.ndarray,
    vocab_size: int,
    mask_token_id: int,
    pad_token_id: int = 0,
    cls_token_id: int = 101,
    mlm_probability: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BERT-style random masking with explicit PRNG key.

    Reproduces ``ALBEF_pre.mask`` (``model_pretrain.py:309-332``): select 15%
    of non-pad, non-CLS positions; of those 80% -> [MASK], 10% -> uniform
    random token, 10% unchanged.  Returns ``(masked_ids, labels)`` with
    ``labels == -100`` on unmasked positions.
    """
    r_sel, r_rep, r_rand, r_words = jax.random.split(rng, 4)
    shape = input_ids.shape
    selectable = (input_ids != pad_token_id) & (input_ids != cls_token_id)
    masked = (jax.random.uniform(r_sel, shape) < mlm_probability) & selectable
    labels = jnp.where(masked, input_ids, IGNORE_INDEX)
    replaced = (jax.random.uniform(r_rep, shape) < 0.8) & masked
    randomized = (jax.random.uniform(r_rand, shape) < 0.5) & masked & ~replaced
    random_words = jax.random.randint(r_words, shape, 0, vocab_size)
    out = jnp.where(replaced, mask_token_id, input_ids)
    out = jnp.where(randomized, random_words, out)
    return out, labels


class AlbefPretrain(nn.Module):
    """The pre-trained ALBEF surrogate (white-box model of the attack).

    ``fused_feats=True`` returns the per-layer image features as a tuple
    instead of a stacked ``[B, 13, N, D]`` array so the attack's layer-sum
    cosine reduces each layer without materializing the stack (perf A/B;
    numerically identical — tests/test_fused_loss.py).
    """

    cfg: ALBEFConfig
    dtype: Dtype = jnp.float32
    fused_feats: bool = False

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = VisionTransformer(
            cfg.vit, dtype=self.dtype, stack_feats=not self.fused_feats
        )
        self.text_encoder = FusionBert(cfg.bert, with_mlm_head=True, dtype=self.dtype)
        # ITA/ITM heads — unused by the attack losses but part of the
        # checkpoint surface (model_pretrain.py:54-60)
        self.vision_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype)
        self.text_proj = nn.Dense(cfg.embed_dim, dtype=self.dtype)
        self.itm_head = nn.Dense(2, dtype=self.dtype)
        self.temp = self.param("temp", nn.initializers.constant(cfg.temp), ())

    def encode_image(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixels [B,H,W,3] -> (normed image embeds [B,Ni,D], feats [B,13,Ni,D])."""
        return self.visual_encoder(pixels)

    def gen_feats(
        self,
        pixels: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(pixels, masked ids, mask) -> (img_feats, txt_feats, mlm_logits).

        ``text_ids`` are expected to be already MLM-masked by
        :func:`mlm_random_mask` (the reference masks internally with global
        RNG; we key it at the call site).  Feature stacks are
        ``[B, 13, N, D]`` (embedding output + every block/layer output).
        """
        image_embeds, img_feats = self.visual_encoder(pixels)
        image_mask = jnp.ones(image_embeds.shape[:2], dtype=jnp.int32)
        _, txt_feats, mlm_logits = self.text_encoder(
            text_ids,
            attention_mask=text_mask,
            encoder_states=image_embeds,
            encoder_mask=image_mask,
            mode="multi_modal",
        )
        return img_feats, txt_feats, mlm_logits

    def gen_feats_from_embeds(
        self,
        pixels: jnp.ndarray,
        text_embeds: jnp.ndarray,
        text_mask: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Differentiable-in-text-embedding variant
        (``model_pretrain.py:85-104``); random id-masking is a no-op here
        because ``encoder_embeds`` bypasses the embedding lookup."""
        image_embeds, img_feats = self.visual_encoder(pixels)
        image_mask = jnp.ones(image_embeds.shape[:2], dtype=jnp.int32)
        _, txt_feats, _ = self.text_encoder.encode_embeds(
            text_embeds,
            attention_mask=text_mask,
            encoder_states=image_embeds,
            encoder_mask=image_mask,
            mode="multi_modal",
        )
        return img_feats, txt_feats

    def get_mlm_logits(
        self,
        pixels: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """MLM logits over the (already masked) paraphrase ids
        (``model_pretrain.py:105-122``)."""
        _, _, mlm_logits = self.gen_feats(pixels, text_ids, text_mask)
        return mlm_logits

    def embed_text(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        """BERT embedding lookup (``adv_attack.py:369-384`` text_embeddings)."""
        return self.text_encoder.embed(text_ids)

    def init_all(self, pixels, text_ids, text_mask):
        """Init entry point touching every head (ITA/ITM projections are only
        materialized when executed): use
        ``model.init(key, px, ids, mask, method=AlbefPretrain.init_all)``."""
        image_embeds, img_feats = self.visual_encoder(pixels)
        _ = self.vision_proj(image_embeds[:, 0])
        text_last, _, _ = self.text_encoder(
            text_ids, attention_mask=text_mask, mode="text"
        )
        _ = self.text_proj(text_last[:, 0])
        _ = self.itm_head(text_last[:, 0])
        return self.gen_feats(pixels, text_ids, text_mask)

    def __call__(self, pixels, text_ids, text_mask):
        return self.gen_feats(pixels, text_ids, text_mask)


class AlbefVQA(nn.Module):
    """The fine-tuned ALBEF VQA victim (black-box model of the attack)."""

    cfg: ALBEFConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = VisionTransformer(cfg.vit, dtype=self.dtype)
        self.text_encoder = FusionBert(cfg.bert, with_mlm_head=False, dtype=self.dtype)
        self.text_decoder = FusionBert(
            cfg.decoder_config, with_mlm_head=True, dtype=self.dtype
        )

    def encode_question(
        self, pixels: jnp.ndarray, text_ids: jnp.ndarray, text_mask: jnp.ndarray
    ) -> jnp.ndarray:
        """Joint (image, question) encoding -> question states [B,S,D]
        (``model_vqa.py:122-127``)."""
        image_embeds, _ = self.visual_encoder(pixels)
        image_mask = jnp.ones(image_embeds.shape[:2], dtype=jnp.int32)
        last, _, _ = self.text_encoder(
            text_ids,
            attention_mask=text_mask,
            encoder_states=image_embeds,
            encoder_mask=image_mask,
            mode="multi_modal",
        )
        return last

    def _decode_logits(
        self,
        answer_ids: jnp.ndarray,
        answer_mask: Optional[jnp.ndarray],
        question_states: jnp.ndarray,
        question_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Causal decoder logits [B, L, V] over answer tokens."""
        _, _, logits = self.text_decoder(
            answer_ids,
            attention_mask=answer_mask,
            encoder_states=question_states,
            encoder_mask=question_mask,
            mode="multi_modal",
        )
        return logits

    def answer_nll(
        self,
        answer_ids: jnp.ndarray,
        answer_mask: jnp.ndarray,
        question_states: jnp.ndarray,
        question_mask: jnp.ndarray,
        pad_token_id: int = 0,
    ) -> jnp.ndarray:
        """Per-token negative log-likelihood of answer sequences, shifted by
        one (HF ``BertLMHeadModel`` convention): returns [B, L-1]."""
        logits = self._decode_logits(
            answer_ids, answer_mask, question_states, question_mask
        )
        shifted_logits = logits[:, :-1, :]
        targets = answer_ids[:, 1:]
        valid = (targets != pad_token_id).astype(jnp.float32)
        logp = jax.nn.log_softmax(shifted_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll * valid

    def rank_answer(
        self,
        question_states: jnp.ndarray,
        question_mask: jnp.ndarray,
        answer_ids: jnp.ndarray,
        answer_mask: jnp.ndarray,
        k: int,
        pad_token_id: int = 0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Two-pass answer ranking (``model_vqa.py:149-203``).

        Pass 1: score every answer's *first* token from a single BOS decode;
        take top-k.  Pass 2: decode the k full candidate answers and re-rank
        by ``log p(first) + sum log p(rest)``.  ``k`` is static, so the whole
        routine is one fixed-shape XLA program (no host round-trips).

        Shapes: ``question_states [B,S,D]``, ``answer_ids [A,L]``.
        Returns ``(topk_ids [B,k], topk_probs [B,k])`` where ids index the
        answer list.
        """
        num_q = question_states.shape[0]
        bos = answer_ids[0, 0]
        start_ids = jnp.full((num_q, 1), bos, dtype=answer_ids.dtype)

        logits = self._decode_logits(start_ids, None, question_states, question_mask)
        first_logits = logits[:, 0, :].astype(jnp.float32)  # [B, V]
        probs = jax.nn.softmax(first_logits, axis=-1)
        first_tokens = answer_ids[:, 1]  # [A]
        prob_first = probs[:, first_tokens]  # [B, A]
        topk_probs, topk_ids = jax.lax.top_k(prob_first, k)  # [B, k]

        # gather the k candidate answers per question -> [B, k, L]
        cand_ids = answer_ids[topk_ids]
        cand_mask = answer_mask[topk_ids]

        flat_ids = cand_ids.reshape(num_q * k, -1)
        flat_mask = cand_mask.reshape(num_q * k, -1)
        # each question's states repeated k times (reference tile(), model_vqa.py:205)
        states_rep = jnp.repeat(question_states, k, axis=0)
        qmask_rep = jnp.repeat(question_mask, k, axis=0)

        nll = self.answer_nll(flat_ids, flat_mask, states_rep, qmask_rep, pad_token_id)
        seq_logp = -jnp.sum(nll, axis=-1).reshape(num_q, k)
        log_probs_sum = jnp.log(topk_probs) + seq_logp

        rerank_probs = jax.nn.softmax(log_probs_sum, axis=-1)
        topk_probs2, rerank_id = jax.lax.top_k(rerank_probs, k)
        topk_ids2 = jnp.take_along_axis(topk_ids, rerank_id, axis=1)
        return topk_ids2, topk_probs2

    def __call__(
        self,
        pixels: jnp.ndarray,
        text_ids: jnp.ndarray,
        text_mask: jnp.ndarray,
        answer_ids: jnp.ndarray,
        answer_mask: jnp.ndarray,
        k: int = 128,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inference path: (image, question, answer list) -> ranked answers
        (``model_vqa.py:122-130``)."""
        states = self.encode_question(pixels, text_ids, text_mask)
        return self.rank_answer(
            states,
            text_mask,
            answer_ids,
            answer_mask,
            k,
            pad_token_id=self.cfg.bert.pad_token_id,
        )
