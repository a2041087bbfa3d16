"""Param-tree persistence: orbax checkpoints + torch-checkpoint ingestion.

The reference only ever *loads* torch checkpoints (SURVEY §5.4); the rebuild
adds a first-class native format (orbax, async-capable, multi-host-safe) so
converted trees load in seconds instead of re-running key surgery, plus the
one-stop ``load_albef_*`` / ``load_vlmo`` ingestion helpers.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def save_params(params: Any, path: str) -> None:
    """Write a param tree as an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


def _maybe_cached(torch_path: str, cache_dir: Optional[str], build, tag: str):
    """Convert once, then reuse the orbax cache next to the torch file.

    The key carries the converter ``tag`` (converter name + geometry) and a
    hash of the source's absolute path + size + mtime — the basename alone
    would collide when the SAME file is ingested through different
    converters (pretrain vs vqa) or geometries (rel-pos resize windows),
    and a path-only hash would silently serve a stale tree after the
    checkpoint file is overwritten in place."""
    if cache_dir is None:
        return build()
    import hashlib

    ap = os.path.abspath(torch_path)
    st = os.stat(ap)
    h = hashlib.sha1(
        f"{ap}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:8]
    key = f"{os.path.basename(torch_path).replace('.', '_')}-{tag}-{h}"
    cache = os.path.join(cache_dir, key)
    if os.path.isdir(cache):
        return load_params(cache)
    tree = build()
    save_params(tree, cache)
    return tree


def load_albef_pretrain(
    torch_path: str,
    image_size: int = 480,
    cache_dir: Optional[str] = None,
) -> Any:
    """ALBEF pre-trained surrogate ckpt -> flax tree (+pos-embed resize to
    ``image_size``; ``adv_attack.py:83-92`` semantics)."""
    from vqattack_tpu.checkpoint.convert import (
        convert_albef_pretrain,
        load_torch_checkpoint,
    )

    def build():
        sd = load_torch_checkpoint(torch_path)
        return convert_albef_pretrain(
            sd, new_num_patches=(image_size // 16) ** 2
        )

    return {"params": _maybe_cached(
        torch_path, cache_dir, build, f"albef_pretrain{image_size}"
    )}


def load_albef_vqa(
    torch_path: str,
    image_size: int = 480,
    cache_dir: Optional[str] = None,
) -> Any:
    """ALBEF fine-tuned victim ckpt -> flax tree (``adv_attack.py:96-100``)."""
    from vqattack_tpu.checkpoint.convert import (
        convert_albef_vqa,
        load_torch_checkpoint,
    )

    def build():
        sd = load_torch_checkpoint(torch_path)
        return convert_albef_vqa(sd, new_num_patches=(image_size // 16) ** 2)

    return {"params": _maybe_cached(
        torch_path, cache_dir, build, f"albef_vqa{image_size}"
    )}


def load_vlmo(
    torch_path: str,
    image_size: int = 480,
    src_image_size: Optional[int] = None,
    cache_dir: Optional[str] = None,
    token_types: Optional[int] = None,
) -> Any:
    """VLMo ckpt -> flax tree, with BEiT-style rel-pos-bias resize when the
    checkpoint was trained at a different resolution
    (``vlmo_module.py:741-804``).

    ``token_types=3`` widens the modality token-type table for
    ``VLMo(with_nlvr2_head=True)`` models (the reference's 2->3 row copy at
    load, ``vlmo_module.py:291-296``)."""
    from vqattack_tpu.checkpoint.convert import (
        convert_vlmo,
        load_torch_checkpoint,
        widen_token_type_embeddings,
    )

    def build():
        sd = load_torch_checkpoint(torch_path)
        kw = {}
        if src_image_size is not None and src_image_size != image_size:
            kw = dict(
                new_window=image_size // 16, src_window=src_image_size // 16
            )
        tree = convert_vlmo(sd, **kw)
        if token_types is not None:
            tree = widen_token_type_embeddings(tree, token_types)
        return tree

    return {"params": _maybe_cached(
        torch_path, cache_dir, build,
        f"vlmo{image_size}src{src_image_size or image_size}"
        + (f"tt{token_types}" if token_types else ""),
    )}


def save_train_state(state: Any, ckpt_dir: str, step: int, keep: int = 3) -> str:
    """Write a training checkpoint ``{ckpt_dir}/step_{N}`` and prune old ones
    (the ModelCheckpoint surface, ``run.py:88-94``)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    save_params(state, path)
    steps = sorted(find_train_steps(ckpt_dir))
    for s in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s:08d}"), ignore_errors=True)
    return path


def find_train_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                out.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return out


def restore_latest_train_state(ckpt_dir: str, like: Any) -> Optional[Any]:
    """``resume_during_training`` last-checkpoint scan (``run.py:118-124``):
    restore the newest ``step_*`` checkpoint, or None."""
    steps = sorted(find_train_steps(ckpt_dir))
    if not steps:
        return None
    return load_params(os.path.join(ckpt_dir, f"step_{steps[-1]:08d}"), like)


def load_hf_bert_mlm(name_or_path: str = "bert-base-uncased") -> Any:
    """The substitution-candidate MLM (``adv_attack.py:110``): load HF
    BertForMaskedLM weights (local path or cached hub) into the FusionBert
    (fusion disabled) tree."""
    from transformers import BertForMaskedLM

    from vqattack_tpu.checkpoint.convert import convert_fusion_bert

    model = BertForMaskedLM.from_pretrained(name_or_path)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    num_layers = model.config.num_hidden_layers
    tree = convert_fusion_bert(
        sd, prefix="bert.", num_layers=num_layers,
        fusion_layer=num_layers, mlm_prefix="cls.",
    )
    return {"params": tree}
