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
