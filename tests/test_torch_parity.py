"""Numerical parity vs torch goldens (SURVEY §4b).

The checkpoint converter maps HF/timm state-dict naming into the flax trees;
these tests round-trip randomly-initialized torch models through the
converter and require output agreement, which pins both the conversion and
the forward-pass numerics (erf-GELU, post-LN order, mask semantics,
cross-attention wiring, causal decoder shift).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqattack_tpu.checkpoint.convert import (  # noqa: E402
    convert_fusion_bert,
    convert_vit,
)
from vqattack_tpu.config import BertConfig, ViTConfig  # noqa: E402
from vqattack_tpu.models.bert import FusionBert  # noqa: E402
from vqattack_tpu.models.vit import VisionTransformer  # noqa: E402

ATOL = 2e-5


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _hf_config(**kw):
    from transformers import BertConfig as HFBertConfig

    base = dict(
        vocab_size=64, hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )
    base.update(kw)
    return HFBertConfig(**base)


def test_bert_text_parity_vs_hf():
    """Plain text encoding matches HF BertModel exactly."""
    from transformers import BertModel

    hf = BertModel(_hf_config(), add_pooling_layer=False).eval()
    sd = _sd(hf)
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        fusion_layer=3, encoder_width=32,
    )
    tree = convert_fusion_bert(sd, prefix="", num_layers=3, fusion_layer=3)
    model = FusionBert(cfg)

    ids = np.array([[2, 5, 9, 11, 3, 0, 0, 0], [2, 7, 8, 3, 0, 0, 0, 0]])
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state

    out, feats, _ = model.apply(
        {"params": tree}, jnp.asarray(ids), jnp.asarray(mask), mode="text"
    )
    # compare only non-pad positions (HF's -10000 vs our -1e9 mask fill can
    # differ at fully-masked pad queries)
    m = mask[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[m[..., 0]], ref.numpy()[m[..., 0]], atol=ATOL
    )
    assert feats.shape[1] == 4  # embedding + 3 layers


def test_bert_mlm_head_parity_vs_hf():
    from transformers import BertForMaskedLM

    hf = BertForMaskedLM(_hf_config()).eval()
    sd = _sd(hf)
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        fusion_layer=3, encoder_width=32,
    )
    tree = convert_fusion_bert(
        sd, prefix="bert.", num_layers=3, fusion_layer=3, mlm_prefix="cls."
    )
    model = FusionBert(cfg, with_mlm_head=True)
    ids = np.array([[2, 5, 9, 11, 3, 1, 1, 1]])
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits
    _, _, logits = model.apply(
        {"params": tree}, jnp.asarray(ids), jnp.asarray(mask), mode="text"
    )
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), atol=ATOL)


def test_bert_causal_cross_decoder_parity_vs_hf():
    """Causal decoder with per-layer cross-attention == ALBEF answer-decoder
    structure (model_vqa.py:30-33): HF BertModel(is_decoder, add_cross_attention)."""
    from transformers import BertModel

    hf = BertModel(
        _hf_config(is_decoder=True, add_cross_attention=True),
        add_pooling_layer=False,
    ).eval()
    sd = _sd(hf)
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        fusion_layer=0, encoder_width=32, is_decoder=True,
    )
    tree = convert_fusion_bert(sd, prefix="", num_layers=3, fusion_layer=0)
    model = FusionBert(cfg)

    ids = np.array([[2, 5, 9, 11]])
    mask = np.ones_like(ids)
    rng = np.random.default_rng(0)
    enc = rng.normal(size=(1, 6, 32)).astype(np.float32)
    enc_mask = np.ones((1, 6), dtype=np.int64)
    with torch.no_grad():
        ref = hf(
            torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).last_hidden_state
    out, _, _ = model.apply(
        {"params": tree},
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(enc),
        jnp.asarray(enc_mask),
        mode="multi_modal",
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=ATOL)


# ---------------------------------------------------------------------------
# mini torch ViT golden (timm/DeiT semantics + naming, as in models/vit.py)
# ---------------------------------------------------------------------------


class _TorchViT(torch.nn.Module):
    """Minimal DeiT-style ViT with timm state-dict naming, used solely as a
    golden for the converter + forward numerics."""

    def __init__(self, img=32, patch=16, dim=32, depth=2, heads=2):
        super().__init__()
        self.dim, self.heads = dim, heads
        n = (img // patch) ** 2
        self.patch_embed = torch.nn.Module()
        self.patch_embed.proj = torch.nn.Conv2d(3, dim, patch, patch)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = torch.nn.ModuleList()
        for _ in range(depth):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
            blk.attn = torch.nn.Module()
            blk.attn.qkv = torch.nn.Linear(dim, dim * 3)
            blk.attn.proj = torch.nn.Linear(dim, dim)
            blk.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
            blk.mlp = torch.nn.Module()
            blk.mlp.fc1 = torch.nn.Linear(dim, dim * 4)
            blk.mlp.fc2 = torch.nn.Linear(dim * 4, dim)
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed[:, : x.size(1)]
        feats = [x]
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv = blk.attn.qkv(h).reshape(b, -1, 3, self.heads, self.dim // self.heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (self.dim // self.heads) ** -0.5
            att = att.softmax(-1)
            h = (att @ v).transpose(1, 2).reshape(b, -1, self.dim)
            x = x + blk.attn.proj(h)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(blk.norm2(x))))
            feats.append(x)
        return self.norm(x), feats


def test_vit_parity_vs_torch_golden():
    tv = _TorchViT().eval()
    sd = _sd(tv)
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=32, depth=2, num_heads=2)
    tree = convert_vit(sd, prefix="", depth=2)
    model = VisionTransformer(cfg)

    rng = np.random.default_rng(0)
    px = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_feats = tv(torch.tensor(px))
    out, feats = model.apply(
        {"params": tree}, jnp.asarray(px.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=ATOL)
    for i, rf in enumerate(ref_feats):
        np.testing.assert_allclose(
            np.asarray(feats[:, i]), rf.numpy(), atol=ATOL, err_msg=f"tap {i}"
        )


def test_pos_embed_interpolation_matches_torch_bicubic():
    from vqattack_tpu.checkpoint.interpolate import interpolate_pos_embed

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 5, 8)).astype(np.float32)  # 2x2 grid + cls
    out = interpolate_pos_embed(pos, new_num_patches=16)  # -> 4x4
    grid = torch.tensor(pos[:, 1:].reshape(1, 2, 2, 8).transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(
        grid, size=(4, 4), mode="bicubic", align_corners=False
    )
    ref = ref.permute(0, 2, 3, 1).reshape(1, 16, 8).numpy()
    np.testing.assert_allclose(out[:, 0], pos[:, 0])  # cls passthrough
    np.testing.assert_allclose(out[:, 1:], ref, atol=1e-5)


def test_bicubic_resize_matches_torch_large():
    from vqattack_tpu.checkpoint.interpolate import bicubic_resize_2d

    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 8, 14, 14)).astype(np.float32)  # 224px ViT grid
    out = bicubic_resize_2d(x, 30, 30)  # -> 480px grid
    ref = torch.nn.functional.interpolate(
        torch.tensor(x), size=(30, 30), mode="bicubic", align_corners=False
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)
