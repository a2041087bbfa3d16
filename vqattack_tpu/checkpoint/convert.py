"""PyTorch-checkpoint -> flax-param-tree conversion (key surgery).

The reference's checkpoint machinery (SURVEY §5.4) does envelope sniffing
(``state_dict``/``module``/``model``), deepspeed ``module.`` stripping, ViT
pos-embed interpolation, and (VLMo) rel-pos-bias surgery.  This module
reproduces that surface for the TPU build: the output is a plain nested dict
matching the flax modules in ``vqattack_tpu.models``, loadable via
``model.apply({'params': tree}, ...)``.

Layout rules (torch -> flax):
- ``nn.Linear``:   weight [out,in] -> kernel [in,out] (transpose), bias kept
- ``nn.Embedding``: weight -> embedding
- ``nn.LayerNorm``: weight -> scale, bias kept
- ``nn.Conv2d``:   weight [O,I,kh,kw] -> kernel [kh,kw,I,O]
- fused qkv (timm ViT): split into thirds -> query/key/value kernels
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt checkpoint into a flat {name: np.ndarray} dict.

    Handles the reference's envelope variants (``vlmo_module.py:307-319``):
    ``{'model': sd}``, ``{'state_dict': sd}``, ``{'module': sd}`` or a bare
    state dict; strips deepspeed ``module.`` prefixes
    (``vlmo_module.py:115-125``).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if not hasattr(v, "numpy"):
            continue
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().to(torch.float32).numpy()
    return out


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _linear(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _linear_nobias(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T}


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _embedding(sd, prefix):
    return {"embedding": sd[f"{prefix}.weight"]}


def _conv(sd, prefix, bias=True):
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _split_qkv(sd, prefix):
    """timm fused qkv -> separate query/key/value Dense params."""
    w = sd[f"{prefix}.weight"]  # [3D, D]
    d = w.shape[0] // 3
    qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    out = {
        "query": {"kernel": qw.T},
        "key": {"kernel": kw.T},
        "value": {"kernel": vw.T},
    }
    if f"{prefix}.bias" in sd:
        b = sd[f"{prefix}.bias"]
        out["query"]["bias"] = b[:d]
        out["key"]["bias"] = b[d : 2 * d]
        out["value"]["bias"] = b[2 * d :]
    return out


# ---------------------------------------------------------------------------
# ViT (timm/DeiT naming: models/vit.py)
# ---------------------------------------------------------------------------


def convert_vit(
    sd: Dict[str, np.ndarray],
    prefix: str = "",
    depth: int = 12,
    new_num_patches: Optional[int] = None,
) -> Dict[str, Any]:
    """Map ``{prefix}cls_token / pos_embed / patch_embed.proj / blocks.N.*``
    to the :class:`~vqattack_tpu.models.vit.VisionTransformer` tree."""
    from vqattack_tpu.checkpoint.interpolate import interpolate_pos_embed

    p = prefix
    pos = sd[f"{p}pos_embed"]
    if new_num_patches is not None:
        pos = interpolate_pos_embed(pos, new_num_patches)
    tree: Dict[str, Any] = {
        "cls_token": sd[f"{p}cls_token"],
        "pos_embed": pos,
        "patch_embed": {"proj": _conv(sd, f"{p}patch_embed.proj")},
        "norm": _layernorm(sd, f"{p}norm"),
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}"
        attn = _split_qkv(sd, f"{bp}.attn.qkv")
        attn["proj"] = _linear(sd, f"{bp}.attn.proj")
        tree[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}.norm1"),
            "attn": attn,
            "norm2": _layernorm(sd, f"{bp}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{bp}.mlp.fc1"),
                "fc2": _linear(sd, f"{bp}.mlp.fc2"),
            },
        }
    return tree


# ---------------------------------------------------------------------------
# Fusion BERT (HF naming: models/xbert.py)
# ---------------------------------------------------------------------------


def convert_fusion_bert(
    sd: Dict[str, np.ndarray],
    prefix: str = "bert.",
    num_layers: int = 12,
    fusion_layer: int = 6,
    mlm_prefix: Optional[str] = None,
) -> Dict[str, Any]:
    """Map HF-style ``{prefix}embeddings.* / encoder.layer.N.*`` (and
    optionally ``{mlm_prefix}predictions.*``) to the
    :class:`~vqattack_tpu.models.bert.FusionBert` tree."""
    p = prefix
    tree: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": _embedding(sd, f"{p}embeddings.word_embeddings"),
            "position_embeddings": _embedding(sd, f"{p}embeddings.position_embeddings"),
            "token_type_embeddings": _embedding(
                sd, f"{p}embeddings.token_type_embeddings"
            ),
            "LayerNorm": _layernorm(sd, f"{p}embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}"
        layer: Dict[str, Any] = {
            "attention_self": {
                "query": _linear(sd, f"{lp}.attention.self.query"),
                "key": _linear(sd, f"{lp}.attention.self.key"),
                "value": _linear(sd, f"{lp}.attention.self.value"),
            },
            "attention_output": {
                "dense": _linear(sd, f"{lp}.attention.output.dense"),
                "LayerNorm": _layernorm(sd, f"{lp}.attention.output.LayerNorm"),
            },
            "intermediate_dense": _linear(sd, f"{lp}.intermediate.dense"),
            "output_dense": _linear(sd, f"{lp}.output.dense"),
            "output_LayerNorm": _layernorm(sd, f"{lp}.output.LayerNorm"),
        }
        if i >= fusion_layer and f"{lp}.crossattention.self.query.weight" in sd:
            layer["crossattention_self"] = {
                "query": _linear(sd, f"{lp}.crossattention.self.query"),
                "key": _linear(sd, f"{lp}.crossattention.self.key"),
                "value": _linear(sd, f"{lp}.crossattention.self.value"),
            }
            layer["crossattention_output"] = {
                "dense": _linear(sd, f"{lp}.crossattention.output.dense"),
                "LayerNorm": _layernorm(sd, f"{lp}.crossattention.output.LayerNorm"),
            }
        tree[f"layer_{i}"] = layer
    if mlm_prefix is not None:
        mp = mlm_prefix
        decoder = {"kernel": sd[f"{mp}predictions.decoder.weight"].T}
        if f"{mp}predictions.decoder.bias" in sd:
            decoder["bias"] = sd[f"{mp}predictions.decoder.bias"]
        else:
            decoder["bias"] = sd[f"{mp}predictions.bias"]
        tree["mlm_head"] = {
            "transform_dense": _linear(sd, f"{mp}predictions.transform.dense"),
            "transform_LayerNorm": _layernorm(
                sd, f"{mp}predictions.transform.LayerNorm"
            ),
            "decoder": decoder,
        }
    return tree


# ---------------------------------------------------------------------------
# ALBEF models
# ---------------------------------------------------------------------------


def convert_albef_pretrain(
    sd: Dict[str, np.ndarray],
    depth: int = 12,
    num_layers: int = 12,
    fusion_layer: int = 6,
    new_num_patches: Optional[int] = None,
) -> Dict[str, Any]:
    """ALBEF_pre checkpoint (``model_pretrain.py``) -> AlbefPretrain params.

    Momentum copies (``*_m``) and feature queues are intentionally dropped —
    the attack only differentiates through the online model.
    """
    tree = {
        "visual_encoder": convert_vit(
            sd, "visual_encoder.", depth, new_num_patches=new_num_patches
        ),
        "text_encoder": convert_fusion_bert(
            sd,
            "text_encoder.bert.",
            num_layers,
            fusion_layer,
            mlm_prefix="text_encoder.cls.",
        ),
        "vision_proj": _linear(sd, "vision_proj"),
        "text_proj": _linear(sd, "text_proj"),
        "itm_head": _linear(sd, "itm_head"),
    }
    if "temp" in sd:
        tree["temp"] = np.asarray(sd["temp"]).reshape(())
    return tree


def convert_vlmo(
    sd: Dict[str, np.ndarray],
    depth: int = 12,
    new_window: Optional[int] = None,
    src_window: Optional[int] = None,
) -> Dict[str, Any]:
    """VLMo checkpoint (``vlmo_base_patch16_*.pt``) -> VLMo flax params.

    Key surface: ``transformer.*`` trunk (decomposed qkv bias: fused
    ``attn.qkv.weight`` without bias + separate ``attn.q_bias``/``v_bias`` —
    ``multiway_transformer.py:75-93``), HF ``text_embeddings.*``, modality
    ``token_type_embeddings``, fused ``relative_position_bias_table``, heads
    (``pooler/mlm_score/itm_score/itc_*_proj/vqa_classifier.{0,1,3}``).

    ``new_window``/``src_window``: geometric rel-pos-bias resize for
    224->480 adaptation (``vlmo_module.py:741-804``).
    """
    p = "transformer."
    tree: Dict[str, Any] = {
        "cls_token": sd[f"{p}cls_token"],
        "patch_embed": {"proj": _conv(sd, f"{p}patch_embed.proj")},
        "norm": _layernorm(sd, f"{p}norm"),
        "text_embeddings": {
            "word_embeddings": _embedding(sd, "text_embeddings.word_embeddings"),
            "position_embeddings": _embedding(sd, "text_embeddings.position_embeddings"),
            "token_type_embeddings": _embedding(sd, "text_embeddings.token_type_embeddings"),
            "LayerNorm": _layernorm(sd, "text_embeddings.LayerNorm"),
        },
        "token_type_embeddings": _embedding(sd, "token_type_embeddings"),
        "pooler": {"dense": _linear(sd, "pooler.dense")},
    }
    if f"{p}pos_embed" in sd:
        pos = sd[f"{p}pos_embed"]
        if new_window is not None and src_window is not None and new_window != src_window:
            # abs-pos models (use_abs_pos_emb=True family) bicubic-resize the
            # grid part at load, like the reference (vlmo_module.py:615-619,
            # 735-739); rel-pos models have no pos_embed key and skip this
            from vqattack_tpu.checkpoint.interpolate import interpolate_pos_embed

            pos = interpolate_pos_embed(pos, new_window ** 2)
        tree["pos_embed"] = pos
    if "relative_position_bias_table" in sd:
        tbl = sd["relative_position_bias_table"]
        if new_window is not None and src_window is not None and new_window != src_window:
            tbl = resize_vlmo_rel_pos_table(tbl, src_window, new_window)
        tree["relative_position_bias_table"] = tbl

    for i in range(depth):
        bp = f"{p}blocks.{i}"
        w = sd[f"{bp}.attn.qkv.weight"]
        d = w.shape[0] // 3
        attn = {
            "query": {"kernel": w[:d].T, "bias": sd[f"{bp}.attn.q_bias"]},
            "key": {"kernel": w[d : 2 * d].T},
            "value": {"kernel": w[2 * d :].T, "bias": sd[f"{bp}.attn.v_bias"]},
            "proj": _linear(sd, f"{bp}.attn.proj"),
        }
        layer: Dict[str, Any] = {
            "norm1": _layernorm(sd, f"{bp}.norm1"),
            "attn": attn,
            "norm2_text": _layernorm(sd, f"{bp}.norm2_text"),
            "norm2_imag": _layernorm(sd, f"{bp}.norm2_imag"),
            "mlp_text": {
                "fc1": _linear(sd, f"{bp}.mlp_text.fc1"),
                "fc2": _linear(sd, f"{bp}.mlp_text.fc2"),
            },
            "mlp_imag": {
                "fc1": _linear(sd, f"{bp}.mlp_imag.fc1"),
                "fc2": _linear(sd, f"{bp}.mlp_imag.fc2"),
            },
        }
        if f"{bp}.gamma_1" in sd:
            layer["gamma_1"] = sd[f"{bp}.gamma_1"]
            layer["gamma_2"] = sd[f"{bp}.gamma_2"]
        if f"{bp}.mlp_vl.fc1.weight" in sd:
            layer["norm2_vl"] = _layernorm(sd, f"{bp}.norm2_vl")
            layer["mlp_vl"] = {
                "fc1": _linear(sd, f"{bp}.mlp_vl.fc1"),
                "fc2": _linear(sd, f"{bp}.mlp_vl.fc2"),
            }
        tree[f"blocks_{i}"] = layer

    if "mlm_score.transform.dense.weight" in sd:
        decoder = {"kernel": sd["mlm_score.decoder.weight"].T,
                   "bias": sd["mlm_score.bias"]}
        tree["mlm_score"] = {
            "transform_dense": _linear(sd, "mlm_score.transform.dense"),
            "transform_LayerNorm": _layernorm(sd, "mlm_score.transform.LayerNorm"),
            "decoder": decoder,
        }
    if "itm_score.fc.weight" in sd:
        tree["itm_score"] = _linear(sd, "itm_score.fc")
    if "itc_text_proj.fc.weight" in sd:
        tree["itc_text_proj"] = _linear_nobias(sd, "itc_text_proj.fc")
        tree["itc_image_proj"] = _linear_nobias(sd, "itc_image_proj.fc")
    if "itc_vl_text_proj.fc.weight" in sd:
        # vlffn-branch ITC heads + contrastive temperatures
        # (vlmo_module.py:247-253)
        tree["itc_vl_text_proj"] = _linear_nobias(sd, "itc_vl_text_proj.fc")
        tree["itc_vl_image_proj"] = _linear_nobias(sd, "itc_vl_image_proj.fc")
    if "logit_scale" in sd:
        tree["logit_scale"] = {"scale": np.asarray(sd["logit_scale"]).reshape(())}
    if "logit_vl_scale" in sd:
        tree["logit_vl_scale"] = {
            "scale": np.asarray(sd["logit_vl_scale"]).reshape(())}
    if "vqa_classifier.0.weight" in sd:
        tree["vqa_classifier"] = {
            "fc1": _linear(sd, "vqa_classifier.0"),
            "norm": _layernorm(sd, "vqa_classifier.1"),
            "fc2": _linear(sd, "vqa_classifier.3"),
        }
    if "nlvr2_classifier.0.weight" in sd:
        # NLVR2-finetuned head, same Sequential(0: dense, 1: LN, 3: dense)
        # layout as the vqa head (vlvr2_classifier at vlmo_module.py:283-296)
        tree["nlvr2_classifier"] = {
            "fc1": _linear(sd, "nlvr2_classifier.0"),
            "norm": _layernorm(sd, "nlvr2_classifier.1"),
            "fc2": _linear(sd, "nlvr2_classifier.3"),
        }
    return tree


def widen_token_type_embeddings(tree: Dict[str, Any], n_types: int = 3) -> Dict[str, Any]:
    """NLVR2 load surgery: widen the modality token-type table to
    ``n_types`` rows, replicating row 1 (the image row) into every new row —
    the reference's in-place widening when loading a 2-row pretrain
    checkpoint into the 3-row NLVR2 model (``vlmo_module.py:291-296``).
    No-op if the table already has ``n_types`` rows."""
    out = dict(tree)
    emb = np.asarray(out["token_type_embeddings"]["embedding"])
    if emb.shape[0] >= n_types:
        return out
    pad = np.broadcast_to(emb[1:2], (n_types - emb.shape[0], emb.shape[1]))
    out["token_type_embeddings"] = {"embedding": np.concatenate([emb, pad])}
    return out


def convert_textpt_state_dict(
    sd: Dict[str, np.ndarray],
    all_num_relative_distance: int,
    num_heads_times_layers: int,
    base_table: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """BEiT/text-pretrain checkpoint -> VLMo key layout
    (``vlmo_module.py:convert_to_textpt_ckpt:47-85``):

    - per-layer ``blocks.N.attn.relative_position_bias_table`` tensors merge
      column-wise into the single fused table, spliced over ``base_table``
      (the reference splices into a clone of the module's current table,
      ``vlmo_module.py:79-83`` — zeros at init, which is the default here;
      pass the live table to reproduce the splice over a non-fresh module);
    - ``mlp``/``norm2`` keys re-target the image expert (``mlp_imag`` /
      ``norm2_imag``); everything gains the ``transformer.`` prefix.

    Returns a PARTIAL torch-layout state dict: a BEiT image checkpoint has
    no text embeddings / text experts / heads, and the reference loads the
    converted dict with ``load_state_dict(strict=False)`` (missing keys stay
    at init).  To feed :func:`convert_vlmo`, merge it over a complete
    state dict first — ``convert_vlmo({**full_sd, **textpt_sd})`` — or graft
    the converted subtree onto initialized params (the ``--init-ckpt``
    pattern in ``train/cli.py``).
    """
    out: Dict[str, np.ndarray] = {}
    per_layer_tables = {}
    for key, value in sd.items():
        if "relative_position_bias_table" in key and ".attn." in key:
            layer_idx = int(key.split(".attn.")[0].split(".")[-1])
            per_layer_tables[layer_idx] = value
            continue
        if "mlp" in key:
            out["transformer." + key.replace("mlp", "mlp_imag")] = value
        elif "norm2" in key:
            out["transformer." + key.replace("norm2", "norm2_imag")] = value
        else:
            out["transformer." + key] = value
    if per_layer_tables:
        merged = np.concatenate(
            [per_layer_tables[i] for i in sorted(per_layer_tables)], axis=1
        )
        if base_table is not None:
            full = np.array(base_table, dtype=merged.dtype, copy=True)
        else:
            full = np.zeros(
                (all_num_relative_distance, num_heads_times_layers), merged.dtype
            )
        full[: merged.shape[0], :] = merged
        out["relative_position_bias_table"] = full
    return out


def convert_vilt(
    sd: Dict[str, np.ndarray],
    depth: int = 12,
    new_num_patches: Optional[int] = None,
) -> Dict[str, Any]:
    """ViLT-B/32 checkpoint -> the single-stream (``moe=False``) VLMo tree.

    ViLT uses timm fused qkv with a full bias; the key bias is dropped in
    conversion — adding a constant to every key shifts each query's logits
    uniformly, which softmax cancels (the same identity VLMo's decomposed
    bias exploits, ``multiway_transformer.py:75-93``).
    """
    p = "transformer."
    pos = sd[f"{p}pos_embed"]
    if new_num_patches is not None:
        from vqattack_tpu.checkpoint.interpolate import interpolate_pos_embed

        pos = interpolate_pos_embed(pos, new_num_patches)
    tree: Dict[str, Any] = {
        "cls_token": sd[f"{p}cls_token"],
        "pos_embed": pos,
        "patch_embed": {"proj": _conv(sd, f"{p}patch_embed.proj")},
        "norm": _layernorm(sd, f"{p}norm"),
        "text_embeddings": {
            "word_embeddings": _embedding(sd, "text_embeddings.word_embeddings"),
            "position_embeddings": _embedding(sd, "text_embeddings.position_embeddings"),
            "token_type_embeddings": _embedding(sd, "text_embeddings.token_type_embeddings"),
            "LayerNorm": _layernorm(sd, "text_embeddings.LayerNorm"),
        },
        "token_type_embeddings": _embedding(sd, "token_type_embeddings"),
        "pooler": {"dense": _linear(sd, "pooler.dense")},
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}"
        w = sd[f"{bp}.attn.qkv.weight"]
        d = w.shape[0] // 3
        b = sd.get(f"{bp}.attn.qkv.bias")
        attn = {
            "query": {"kernel": w[:d].T},
            "key": {"kernel": w[d : 2 * d].T},
            "value": {"kernel": w[2 * d :].T},
            "proj": _linear(sd, f"{bp}.attn.proj"),
        }
        if b is not None:
            attn["query"]["bias"] = b[:d]
            attn["value"]["bias"] = b[2 * d :]
        tree[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{bp}.norm1"),
            "attn": attn,
            "norm2": _layernorm(sd, f"{bp}.norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{bp}.mlp.fc1"),
                "fc2": _linear(sd, f"{bp}.mlp.fc2"),
            },
        }
    if "mlm_score.transform.dense.weight" in sd:
        tree["mlm_score"] = {
            "transform_dense": _linear(sd, "mlm_score.transform.dense"),
            "transform_LayerNorm": _layernorm(sd, "mlm_score.transform.LayerNorm"),
            "decoder": {"kernel": sd["mlm_score.decoder.weight"].T,
                        "bias": sd["mlm_score.bias"]},
        }
    if "itm_score.fc.weight" in sd:
        tree["itm_score"] = _linear(sd, "itm_score.fc")
    if "vqa_classifier.0.weight" in sd:
        tree["vqa_classifier"] = {
            "fc1": _linear(sd, "vqa_classifier.0"),
            "norm": _layernorm(sd, "vqa_classifier.1"),
            "fc2": _linear(sd, "vqa_classifier.3"),
        }
    if "nlvr2_classifier.0.weight" in sd:
        # NLVR2-finetuned head, same Sequential(0: dense, 1: LN, 3: dense)
        # layout as the vqa head (vlvr2_classifier at vlmo_module.py:283-296)
        tree["nlvr2_classifier"] = {
            "fc1": _linear(sd, "nlvr2_classifier.0"),
            "norm": _layernorm(sd, "nlvr2_classifier.1"),
            "fc2": _linear(sd, "nlvr2_classifier.3"),
        }
    return tree


def resize_vlmo_rel_pos_table(
    table: np.ndarray, src_window: int, dst_window: int
) -> np.ndarray:
    """Resize the fused VLMo table: only the image-window block
    ((2w-1)^2 rows) resizes; the 3 image specials, text distances, and 2
    cross constants pass through with re-laid-out offsets
    (``vlmo_module.py:741-804``)."""
    from vqattack_tpu.checkpoint.interpolate import interpolate_rel_pos_bias

    # rows: [(2w-1)^2 image distances | 3 specials + text + 2 cross] — only
    # the image block resizes, everything after passes through
    return interpolate_rel_pos_bias(table, 2 * src_window - 1, 2 * dst_window - 1)


def convert_albef_vqa(
    sd: Dict[str, np.ndarray],
    depth: int = 12,
    num_layers: int = 12,
    fusion_layer: int = 6,
    decoder_layers: int = 6,
    new_num_patches: Optional[int] = None,
) -> Dict[str, Any]:
    """ALBEF VQA checkpoint (``model_vqa.py``) -> AlbefVQA params."""
    return {
        "visual_encoder": convert_vit(
            sd, "visual_encoder.", depth, new_num_patches=new_num_patches
        ),
        "text_encoder": convert_fusion_bert(
            sd, "text_encoder.bert." if "text_encoder.bert.embeddings.word_embeddings.weight" in sd else "text_encoder.",
            num_layers, fusion_layer,
        ),
        "text_decoder": convert_fusion_bert(
            sd,
            "text_decoder.bert.",
            decoder_layers,
            fusion_layer=0,
            mlm_prefix="text_decoder.cls.",
        ),
    }
