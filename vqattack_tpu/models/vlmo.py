"""VLMo: MoME multiway transformer + heads + the attack-facing feature API.

Parity targets:

- trunk: ``VLMO_VQAttack/vlmo/modules/multiway_transformer.py:59-412`` —
  ViT-style blocks with *shared* self-attention but per-modality FFN experts
  (``mlp_text``/``mlp_imag``, plus ``mlp_vl`` for layers >=
  ``vlffn_start_layer``), decomposed qkv bias (q and v biased, k not,
  ``:75-93``), layer-scale ``gamma_1/2`` (``:175-180``), masked softmax with
  relative-position bias (``:104-112``);
- rel-pos machinery: one fused ``[all_num_relative_distance, H*L]`` table
  chunked per layer, with separate image-window / text-distance / cross
  index blocks (``vlmo_module.py:807-883``);
- joint VL inference with per-layer feature taps
  (``vlmo_module.py:884-948`` ``infer``) and the attack closures returning
  ``[cls_feats, per-layer cls, masked token feats]``
  (``vlmo_module.py:1387-1529``); image tokens start at index
  ``max_text_len`` (SURVEY §2.2);
- heads: ``Pooler`` / ``ITMHead`` / ``ITCHead`` / ``MLMHead``
  (``vlmo/modules/heads.py``) + the 2-layer GELU ``vqa_classifier``
  (``vlmo_module.py:274-280``).

The MoME "expert parallelism" is deterministic modality routing, not a
learned-router MoE (SURVEY §2.4): in the mixed ``"vl"`` mode the sequence is
statically split at ``max_text_len``, each half runs its expert FFN, and the
halves re-concatenate — branch-free and XLA-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vqattack_tpu.config import VLMoConfig
from vqattack_tpu.models.bert import BertEmbeddings, BertPredictionHead
from vqattack_tpu.models.layers import (
    Mlp,
    MultiHeadAttention,
    mask_to_bias,
    resolve_dtype,
)
from vqattack_tpu.config import BertConfig

Dtype = Any


# ---------------------------------------------------------------------------
# relative-position index tables (host-side constants)
# ---------------------------------------------------------------------------


def build_relative_position_index(
    window: Tuple[int, int],
    max_text_len: int,
    max_text_len_of_initckpt: int = 196,
) -> Dict[str, np.ndarray]:
    """The three index tables of ``build_relative_position_embed``
    (``vlmo_module.py:818-883``): image-window pairwise indices (+3 special
    cls rows), text relative distances offset past the image block, and the
    two cross-modal constants.  Returns int32 arrays."""
    wh, ww = window
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    text_num_rel = 2 * max_text_len_of_initckpt
    all_num = num_rel + text_num_rel + 2

    ch, cw = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    coords = np.stack([ch, cw]).reshape(2, -1)  # [2, Wh*Ww]
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    img_idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    img_idx[1:, 1:] = rel.sum(-1)
    img_idx[0, :] = num_rel - 3
    img_idx[:, 0] = num_rel - 2
    img_idx[0, 0] = num_rel - 1

    tpos = np.arange(max_text_len - 1)
    tmat = tpos[None, :] - tpos[:, None]
    min_distance = 2 - max_text_len_of_initckpt
    tmat = tmat - min_distance + num_rel + 2
    txt_idx = np.zeros((max_text_len, max_text_len), np.int64)
    txt_idx[1:, 1:] = tmat
    txt_idx[0, :] = all_num - 3
    txt_idx[:, 0] = all_num - 2
    txt_idx[0, 0] = all_num - 1

    max_imag_len = wh * ww + 1
    t2i = np.full((max_text_len, max_imag_len), num_rel, np.int64)
    i2t = np.full((max_imag_len, max_text_len), num_rel + 1, np.int64)

    joint = np.concatenate(
        [
            np.concatenate([txt_idx, t2i], axis=1),
            np.concatenate([i2t, img_idx], axis=1),
        ],
        axis=0,
    )
    return {
        "image": img_idx.astype(np.int32),
        "text": txt_idx.astype(np.int32),
        "joint": joint.astype(np.int32),
        "all_num_relative_distance": all_num,
    }


def _layer_cls_of(feats) -> jnp.ndarray:
    """Per-layer cls states [B, L+1, D] from either a stacked [B, L+1, S, D]
    feature array or a tuple of per-layer [B, S, D] tensors (fused path)."""
    if isinstance(feats, (tuple, list)):
        return jnp.stack([f[:, 0] for f in feats], axis=1)
    return feats[:, :, 0, :]


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


class MultiWayBlock(nn.Module):
    """Shared-attention, modality-expert-FFN block
    (``multiway_transformer.py:121-201``)."""

    cfg: VLMoConfig
    with_vlffn: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        modality: str,
        attn_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dim = cfg.hidden_size
        eps = cfg.layer_norm_eps
        ls = cfg.layer_scale_init

        def gamma(name):
            if ls is None:
                return 1.0
            return self.param(name, nn.initializers.constant(ls), (dim,)).astype(
                self.dtype
            )

        h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="norm1")(x)
        attn = MultiHeadAttention(
            num_heads=cfg.num_heads,
            head_dim=dim // cfg.num_heads,
            out_dim=dim,
            q_bias=True,
            k_bias=False,  # decomposed qkv bias: k un-biased (:75-93)
            v_bias=True,
            remat_scores=cfg.remat_scores,
            softmax_dtype=resolve_dtype(cfg.softmax_dtype),
            dtype=self.dtype,
            name="attn",
        )(h, bias=attn_bias)
        x = x + gamma("gamma_1") * attn

        g2 = gamma("gamma_2")

        def text_ffn(t):
            t = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="norm2_text")(t)
            return Mlp(int(dim * cfg.mlp_ratio), dim, dtype=self.dtype, name="mlp_text")(t)

        def imag_ffn(t):
            t = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="norm2_imag")(t)
            return Mlp(int(dim * cfg.mlp_ratio), dim, dtype=self.dtype, name="mlp_imag")(t)

        if not cfg.moe:
            # single-stream (ViLT): one shared FFN regardless of modality
            h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="norm2")(x)
            return x + g2 * Mlp(
                int(dim * cfg.mlp_ratio), dim, dtype=self.dtype, name="mlp"
            )(h)

        if modality == "image":
            x = x + g2 * imag_ffn(x)
        elif modality == "text":
            x = x + g2 * text_ffn(x)
        else:  # joint "vl"
            if self.with_vlffn:
                h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="norm2_vl")(x)
                x = x + g2 * Mlp(
                    int(dim * cfg.mlp_ratio), dim, dtype=self.dtype, name="mlp_vl"
                )(h)
            else:
                # static split at max_text_len (:192-197)
                t = cfg.max_text_len
                x_text, x_imag = x[:, :t], x[:, t:]
                x_text = x_text + g2 * text_ffn(x_text)
                x_imag = x_imag + g2 * imag_ffn(x_imag)
                x = jnp.concatenate([x_text, x_imag], axis=1)
        return x


class Pooler(nn.Module):
    """cls -> dense -> tanh (``heads.py:8``)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(x[:, 0]))


class VQAClassifier(nn.Module):
    """dense(2D) -> LayerNorm -> GELU -> dense(labels) (``vlmo_module.py:274-280``)."""

    hidden_size: int
    num_labels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_size * 2, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.num_labels, dtype=self.dtype, name="fc2")(x)


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


class LogitScale(nn.Module):
    """Learnable contrastive temperature, open_clip-style
    (``vlmo_module.py:252-253``: ``ones([]) * log(1/0.07)``); used as
    ``exp(scale)`` multiplying the similarity logits."""

    init_value: float = float(np.log(1 / 0.07))

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "scale", lambda key: jnp.full((), self.init_value, jnp.float32)
        )


class VLMo(nn.Module):
    cfg: VLMoConfig
    with_vqa_head: bool = True
    with_nlvr2_head: bool = False
    dtype: Dtype = jnp.float32
    # fused_feats: attack closures return per-layer token features as a
    # tuple instead of a stacked [B, L+1, S, D] array, so the attack loss
    # reduces each layer in place without materializing the stack (same
    # trick as models/vit.py stack_feats; equivalence in tests/test_fused_loss.py)
    fused_feats: bool = False

    def setup(self):
        cfg = self.cfg
        bert_cfg = BertConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=1e-12,
        )
        self.text_embeddings = BertEmbeddings(bert_cfg, dtype=self.dtype)
        # nlvr2 routes its second image stream through modality-type row 2,
        # so the table must hold >= 3 rows (the reference widens 2 -> 3 at
        # load, vlmo_module.py:291-296; checkpoint/convert.py::
        # widen_token_type_embeddings reproduces the row copy) — an
        # unwidened table would silently return NaN rows for index 2
        n_token_types = (
            max(cfg.type_vocab_size, 3) if self.with_nlvr2_head
            else cfg.type_vocab_size
        )
        self.token_type_embeddings = nn.Embed(
            n_token_types, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype,
        )
        from vqattack_tpu.models.layers import PatchEmbed

        self.patch_embed = PatchEmbed(
            patch_size=cfg.patch_size, hidden_size=cfg.hidden_size, dtype=self.dtype
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size), jnp.float32
        )
        if cfg.use_abs_pos_emb:
            self.pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, cfg.image_seq_len, cfg.hidden_size),
                jnp.float32,
            )
        # static_argnums=(2,): the modality string (self=0, x=1); block
        # calls must pass it positionally for the remat transform
        block_cls = (
            nn.remat(MultiWayBlock, static_argnums=(2,))
            if cfg.remat
            else MultiWayBlock
        )
        self.blocks = [
            block_cls(
                cfg,
                with_vlffn=(i >= cfg.vlffn_start_layer),
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype)
        self.pooler = Pooler(cfg.hidden_size, dtype=self.dtype)
        self.mlm_score = BertPredictionHead(bert_cfg, dtype=self.dtype)
        self.itm_score = nn.Dense(2, dtype=self.dtype)
        self.itc_text_proj = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype)
        self.itc_image_proj = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype)
        # vlffn-branch ITC heads + logit scales (``vlmo_module.py:242-253``);
        # lazy submodules — params materialize only on ITC-pretraining paths
        self.itc_vl_text_proj = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype)
        self.itc_vl_image_proj = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype)
        self.logit_scale = LogitScale(name="logit_scale")
        self.logit_vl_scale = LogitScale(name="logit_vl_scale")
        if self.with_vqa_head:
            self.vqa_classifier = VQAClassifier(
                cfg.hidden_size, cfg.vqa_label_size, dtype=self.dtype
            )
        if self.with_nlvr2_head:
            # nlvr2 widens token types to 3 (second image stream) and
            # classifies the concatenated pair cls feats (vlvo_module:283-296)
            self.nlvr2_classifier = VQAClassifier(
                cfg.hidden_size, 2, dtype=self.dtype, name="nlvr2_classifier"
            )

        if cfg.need_relative_position_embed:
            tables = build_relative_position_index(cfg.window_size, cfg.max_text_len)
            self._rel_index = {
                k: jnp.asarray(v) for k, v in tables.items() if k != "all_num_relative_distance"
            }
            self.relative_position_bias_table = self.param(
                "relative_position_bias_table",
                nn.initializers.zeros,
                (tables["all_num_relative_distance"], cfg.num_heads * cfg.depth),
                jnp.float32,
            )
        else:
            self._rel_index = None

    # ------------------------------------------------------------- internals

    def _rel_bias(self, layer: int, kind: str) -> Optional[jnp.ndarray]:
        """Per-layer [1, H, S, S] additive bias from the fused table
        (``get_rel_pos_bias``, ``vlmo_module.py:807-816``)."""
        if self._rel_index is None:
            return None
        h = self.cfg.num_heads
        tbl = self.relative_position_bias_table[:, layer * h : (layer + 1) * h]
        idx = self._rel_index[kind]
        bias = tbl[idx]  # [S, S, H]
        return jnp.transpose(bias, (2, 0, 1))[None].astype(self.dtype)

    def visual_embed(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """patchify + cls + (optional) abs pos (``multiway_transformer.py:366-380``)."""
        cfg = self.cfg
        x = self.patch_embed(pixels)
        b = x.shape[0]
        cls = jnp.broadcast_to(self.cls_token, (b, 1, cfg.hidden_size)).astype(self.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        if cfg.use_abs_pos_emb:
            x = x + self.pos_embed.astype(self.dtype)
        return x

    def precompute_joint_biases(self) -> Optional[jnp.ndarray]:
        """All layers' joint rel-pos biases as one [depth, H, S, S] stack.

        The per-layer table gather is parameter-only; recomputing it inside
        every PGD iteration's forward costs ~40x redundant gathers over an
        attack. Compute once per attack and thread through the loss aux
        (``rel_biases``); identical numerics (tests/test_vlmo.py)."""
        if self._rel_index is None:
            return None
        return jnp.stack(
            [self._rel_bias(i, "joint")[0] for i in range(self.cfg.depth)], axis=0
        )

    def _joint_trunk(
        self, text_ids, text_masks, pixels, image_token_type_idx: int = 1,
        rel_biases: Optional[jnp.ndarray] = None, stack: bool = True,
        text_embeds: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Shared VL forward: returns (normed_x, feats [B, L+1, S, D],
        co_masks [B, S]) with S = max_text_len + image_seq_len.
        ``image_token_type_idx``: modality-type row (2 = the second NLVR2
        image stream, ``vlmo_module.py:884-916`` imgkey handling).
        ``stack=False`` returns the per-layer feats as a tuple (fused-loss
        path — the attack reduces each layer without materializing the
        stack).  ``text_embeds`` (pre-token-type-add) bypasses the embedding
        lookup — the differentiable entry of the VL joint step."""
        cfg = self.cfg
        if text_embeds is None:
            text_embeds = self.text_embeddings(text_ids)
        image_embeds = self.visual_embed(pixels)
        image_masks = jnp.ones(image_embeds.shape[:2], dtype=text_masks.dtype)
        text_embeds = text_embeds + self.token_type_embeddings(
            jnp.zeros_like(text_masks)
        )
        image_embeds = image_embeds + self.token_type_embeddings(
            jnp.full_like(image_masks, image_token_type_idx)
        )
        x = jnp.concatenate([text_embeds, image_embeds], axis=1)
        co_masks = jnp.concatenate([text_masks, image_masks], axis=1)
        mask_bias = mask_to_bias(co_masks, self.dtype)

        feats = [x]
        for i, blk in enumerate(self.blocks):
            if rel_biases is not None:
                bias = rel_biases[i][None] + mask_bias
            else:
                bias = self._rel_bias(i, "joint")
                bias = mask_bias if bias is None else bias + mask_bias
            x = blk(x, "vl", bias)
            feats.append(x)
        xn = self.norm(x)
        return xn, (jnp.stack(feats, axis=1) if stack else tuple(feats)), co_masks

    # ----------------------------------------------------------- public API

    def infer(self, text_ids, text_masks, pixels) -> Dict[str, jnp.ndarray]:
        """Joint VL inference (``vlmo_module.py:884-948``)."""
        cfg = self.cfg
        xn, feats, _ = self._joint_trunk(text_ids, text_masks, pixels)
        t = cfg.max_text_len
        return {
            "text_feats": xn[:, :t],
            "image_feats": xn[:, t:],
            "cls_feats": self.pooler(xn),
            "raw_cls_feats": xn[:, 0],
            "feats": feats,
        }

    @property
    def _has_vlffn(self) -> bool:
        return bool(self.cfg.moe) and self.cfg.vlffn_start_layer < self.cfg.depth

    def infer_text(self, text_ids, text_masks, vlffn: bool = False) -> Dict[str, jnp.ndarray]:
        """Text-only tower (``vlmo_module.py:950-1006``).  With
        ``vlffn=True`` (pretraining ITC) the hidden state entering layer
        ``vlffn_start_layer`` is additionally run through the remaining
        blocks in the 'vl' expert mode and projected by ``itc_vl_text_proj``
        (``:973-977,990-992``) as ``cls_vlffn_feats``."""
        x = self.text_embeddings(text_ids) + self.token_type_embeddings(
            jnp.zeros_like(text_masks)
        )
        mask_bias = mask_to_bias(text_masks, self.dtype)
        feats = [x]
        for i, blk in enumerate(self.blocks):
            bias = self._rel_bias(i, "text")
            bias = mask_bias if bias is None else bias + mask_bias
            x = blk(x, "text", bias)
            feats.append(x)
        xn = self.norm(x)
        out = {
            "text_feats": xn,
            "cls_feats": self.itc_text_proj(xn[:, 0]),
            "mlm_logits": self.mlm_score(xn),
            "feats": jnp.stack(feats, axis=1),
        }
        if vlffn and self._has_vlffn:
            start = self.cfg.vlffn_start_layer
            vl = feats[start]  # output of block start-1 (ref :973)
            for i in range(start, self.cfg.depth):
                bias = self._rel_bias(i, "text")
                bias = mask_bias if bias is None else bias + mask_bias
                vl = self.blocks[i](vl, "vl", bias)
            out["cls_vlffn_feats"] = self.itc_vl_text_proj(self.norm(vl)[:, 0])
        return out

    def infer_image(self, pixels, vlffn: bool = False) -> Dict[str, jnp.ndarray]:
        """Image-only tower (``vlmo_module.py:1101-1166``); ``vlffn=True``
        adds the 'vl'-expert branch feats as in :meth:`infer_text`."""
        x = self.visual_embed(pixels)
        masks = jnp.ones(x.shape[:2], dtype=jnp.int32)
        x = x + self.token_type_embeddings(jnp.ones_like(masks))
        feats = [x]
        for i, blk in enumerate(self.blocks):
            x = blk(x, "image", self._rel_bias(i, "image"))
            feats.append(x)
        xn = self.norm(x)
        out = {
            "image_feats": xn,
            "cls_feats": self.itc_image_proj(xn[:, 0]),
            "feats": jnp.stack(feats, axis=1),
        }
        if vlffn and self._has_vlffn:
            start = self.cfg.vlffn_start_layer
            vl = feats[start]
            for i in range(start, self.cfg.depth):
                vl = self.blocks[i](vl, "vl", self._rel_bias(i, "image"))
            out["cls_vlffn_feats"] = self.itc_vl_image_proj(self.norm(vl)[:, 0])
        return out

    # ------------------------------------------------------- attack closures

    def attack_feats(
        self, pixels, text_ids, text_masks, rel_biases=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``pgd_attack`` (``vlmo_module.py:1387-1446``): returns
        ``(cls_feats [B,D], layer_cls [B,L+1,D], token_feats [B,L+1,S,D],
        token_mask [B,S])`` where token_mask selects valid text tokens and all
        image tokens (the reference gathers them; we mask — static shapes)."""
        xn, feats, co_masks = self._joint_trunk(
            text_ids, text_masks, pixels, rel_biases=rel_biases,
            stack=not self.fused_feats,
        )
        cls_feats = self.pooler(xn)
        layer_cls = _layer_cls_of(feats)
        # co_masks IS [masks, ones-for-image] (built in _joint_trunk)
        token_mask = co_masks
        return cls_feats, layer_cls, feats, token_mask

    def attack_mlm(
        self, pixels, mlm_ids, mlm_masks, rel_biases=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``pgd_mlm_attack`` (``vlmo_module.py:1448-1529``): MLM logits over
        the text half + the same feature stacks."""
        xn, feats, co_masks = self._joint_trunk(
            mlm_ids, mlm_masks, pixels, rel_biases=rel_biases,
            stack=not self.fused_feats,
        )
        text_feats = xn[:, : self.cfg.max_text_len]
        mlm_logits = self.mlm_score(text_feats)
        layer_cls = _layer_cls_of(feats)
        # co_masks IS [masks, ones-for-image] (built in _joint_trunk)
        token_mask = co_masks
        return mlm_logits, layer_cls, feats, token_mask

    def attack_feats_from_embeds(
        self, pixels, text_embeds, text_masks, rel_biases=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``pgd_attack_vl`` (``vlmo_module.py:1328-1385``): text embeddings
        enter pre-token-type-add, differentiable."""
        xn, feats, co_masks = self._joint_trunk(
            None, text_masks, pixels, rel_biases=rel_biases,
            stack=not self.fused_feats, text_embeds=text_embeds,
        )
        cls_feats = self.pooler(xn)
        layer_cls = _layer_cls_of(feats)
        # co_masks IS [masks, ones-for-image] (built in _joint_trunk)
        token_mask = co_masks
        return cls_feats, layer_cls, feats, token_mask

    def embed_text(self, text_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text_embeddings(text_ids)

    def vqa_logits(self, pixels, text_ids, text_masks) -> jnp.ndarray:
        """Victim path: joint forward -> pooler -> 3129-way classifier
        (``objectives.py:375-414`` + ``vqa_test_step_after_pgd:812``)."""
        xn, _, _ = self._joint_trunk(text_ids, text_masks, pixels)
        return self.vqa_classifier(self.pooler(xn))

    def nlvr2_logits(self, pixels1, pixels2, text_ids, text_masks) -> jnp.ndarray:
        """NLVR2: encode the statement with each image (modality rows 1 and
        2), classify the concatenated pooled pair
        (``objectives.py:416-475``).  Requires ``type_vocab_size >= 3`` and
        ``with_nlvr2_head=True``."""
        x1, _, _ = self._joint_trunk(text_ids, text_masks, pixels1, 1)
        x2, _, _ = self._joint_trunk(text_ids, text_masks, pixels2, 2)
        pooled = jnp.concatenate([self.pooler(x1), self.pooler(x2)], axis=-1)
        return self.nlvr2_classifier(pooled)

    def init_all(self, text_ids, text_masks, pixels):
        """Initialization entry point touching every head (flax materializes
        only executed params): use ``model.init(key, ids, masks, px,
        method=VLMo.init_all)``."""
        out = self.infer(text_ids, text_masks, pixels)
        # the single-modality towers materialize the text/image experts of the
        # vlffn layers (joint mode routes those layers through mlp_vl only);
        # vlffn=True additionally materializes the ITC vl-branch projections
        _ = self.infer_text(text_ids, text_masks, vlffn=self._has_vlffn)
        _ = self.infer_image(pixels, vlffn=self._has_vlffn)
        _ = self.logit_scale()
        if self._has_vlffn:
            _ = self.logit_vl_scale()
        xn_text = out["text_feats"]
        _ = self.mlm_score(xn_text)
        _ = self.itm_score(out["cls_feats"])
        _ = self.itc_text_proj(xn_text[:, 0])
        _ = self.itc_image_proj(out["image_feats"][:, 0])
        if self.with_vqa_head:
            _ = self.vqa_classifier(out["cls_feats"])
        if self.with_nlvr2_head:
            _ = self.nlvr2_logits(pixels, pixels, text_ids, text_masks)
        return out

    def __call__(self, text_ids, text_masks, pixels):
        return self.infer(text_ids, text_masks, pixels)
