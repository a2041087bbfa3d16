"""VLMo conversion parity: torch mini-MoME golden (decomposed qkv bias,
layer scale, rel-pos bias, expert routing) + full-tree conversion."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqattack_tpu.checkpoint.convert import convert_vlmo  # noqa: E402
from vqattack_tpu.checkpoint.interpolate import interpolate_rel_pos_bias  # noqa: E402
from vqattack_tpu.config import tiny_test_config  # noqa: E402
from vqattack_tpu.models.vlmo import VLMo  # noqa: E402

CFG = tiny_test_config().vlmo


class _TorchMoMEBlock(torch.nn.Module):
    """Reference-semantics MoME block golden (multiway_transformer.py:59-201)."""

    def __init__(self, dim=32, heads=2, max_text_len=8, with_vlffn=False, ls=0.1):
        super().__init__()
        self.dim, self.heads, self.t = dim, heads, max_text_len
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
        self.v_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
        self.proj = torch.nn.Linear(dim, dim)
        self.norm2_text = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm2_imag = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp_text = torch.nn.Sequential(
            torch.nn.Linear(dim, dim * 4), torch.nn.GELU(), torch.nn.Linear(dim * 4, dim)
        )
        self.mlp_imag = torch.nn.Sequential(
            torch.nn.Linear(dim, dim * 4), torch.nn.GELU(), torch.nn.Linear(dim * 4, dim)
        )
        self.gamma_1 = torch.nn.Parameter(ls * torch.ones(dim))
        self.gamma_2 = torch.nn.Parameter(ls * torch.ones(dim))

    def forward(self, x, mask, rel_bias):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv_bias = torch.cat(
            [self.q_bias, torch.zeros_like(self.v_bias), self.v_bias]
        )
        qkv = torch.nn.functional.linear(h, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b, n, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (self.dim // self.heads) ** -0.5
        attn = q.float() @ k.float().transpose(-2, -1)
        if rel_bias is not None:
            attn = attn + rel_bias.unsqueeze(0)
        attn = attn.masked_fill(~mask.bool()[:, None, None, :], float("-inf"))
        attn = attn.softmax(-1).type_as(x)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.gamma_1 * self.proj(out)
        x_text, x_imag = x[:, : self.t], x[:, self.t :]
        x_text = x_text + self.gamma_2 * self.mlp_text(self.norm2_text(x_text))
        x_imag = x_imag + self.gamma_2 * self.mlp_imag(self.norm2_imag(x_imag))
        return torch.cat([x_text, x_imag], 1)


def test_mome_block_parity():
    from vqattack_tpu.models.vlmo import MultiWayBlock

    torch.manual_seed(0)
    tb = _TorchMoMEBlock().eval()
    t, n_img, dim = 8, 5, 32
    n = t + n_img
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, n, dim)).astype(np.float32)
    mask = np.ones((2, n), np.int64)
    mask[0, 6:8] = 0  # pad some text positions
    rel = rng.normal(size=(2, n, n)).astype(np.float32) * 0.1  # [H, S, S]

    with torch.no_grad():
        ref = tb(torch.tensor(x), torch.tensor(mask), torch.tensor(rel))

    # map the torch params onto the flax block
    sdp = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    tree = {
        "norm1": {"scale": sdp["norm1.weight"], "bias": sdp["norm1.bias"]},
        "attn": {
            "query": {"kernel": sdp["qkv.weight"][:dim].T, "bias": sdp["q_bias"]},
            "key": {"kernel": sdp["qkv.weight"][dim : 2 * dim].T},
            "value": {"kernel": sdp["qkv.weight"][2 * dim :].T, "bias": sdp["v_bias"]},
            "proj": {"kernel": sdp["proj.weight"].T, "bias": sdp["proj.bias"]},
        },
        "gamma_1": sdp["gamma_1"],
        "gamma_2": sdp["gamma_2"],
        "norm2_text": {"scale": sdp["norm2_text.weight"], "bias": sdp["norm2_text.bias"]},
        "norm2_imag": {"scale": sdp["norm2_imag.weight"], "bias": sdp["norm2_imag.bias"]},
        "mlp_text": {
            "fc1": {"kernel": sdp["mlp_text.0.weight"].T, "bias": sdp["mlp_text.0.bias"]},
            "fc2": {"kernel": sdp["mlp_text.2.weight"].T, "bias": sdp["mlp_text.2.bias"]},
        },
        "mlp_imag": {
            "fc1": {"kernel": sdp["mlp_imag.0.weight"].T, "bias": sdp["mlp_imag.0.bias"]},
            "fc2": {"kernel": sdp["mlp_imag.2.weight"].T, "bias": sdp["mlp_imag.2.bias"]},
        },
    }
    import dataclasses

    cfg = dataclasses.replace(CFG, hidden_size=32, num_heads=2, max_text_len=8)
    blk = MultiWayBlock(cfg, with_vlffn=False)
    from vqattack_tpu.models.layers import mask_to_bias

    bias = jnp.asarray(rel)[None] + mask_to_bias(jnp.asarray(mask), jnp.float32)
    out = blk.apply({"params": tree}, jnp.asarray(x), "vl", bias)
    # compare only non-pad positions (mask fill -inf vs -1e9 differs at pads)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], ref.numpy()[valid], atol=2e-5
    )


def _fake_vlmo_sd(cfg):
    rng = np.random.default_rng(0)
    d, depth = cfg.hidden_size, cfg.depth
    sd = {}

    def lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.02
        if bias:
            sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def ln(name):
        sd[f"{name}.weight"] = np.ones(d_cur, np.float32)
        sd[f"{name}.bias"] = np.zeros(d_cur, np.float32)

    d_cur = d
    sd["transformer.cls_token"] = np.zeros((1, 1, d), np.float32)
    sd["transformer.patch_embed.proj.weight"] = (
        rng.normal(size=(d, 3, cfg.patch_size, cfg.patch_size)).astype(np.float32) * 0.02
    )
    sd["transformer.patch_embed.proj.bias"] = np.zeros(d, np.float32)
    ln("transformer.norm")
    for i in range(depth):
        bp = f"transformer.blocks.{i}"
        sd[f"{bp}.attn.qkv.weight"] = rng.normal(size=(3 * d, d)).astype(np.float32) * 0.02
        sd[f"{bp}.attn.q_bias"] = np.zeros(d, np.float32)
        sd[f"{bp}.attn.v_bias"] = np.zeros(d, np.float32)
        lin(f"{bp}.attn.proj", d, d)
        ln(f"{bp}.norm1")
        ln(f"{bp}.norm2_text")
        ln(f"{bp}.norm2_imag")
        lin(f"{bp}.mlp_text.fc1", d, 4 * d)
        lin(f"{bp}.mlp_text.fc2", 4 * d, d)
        lin(f"{bp}.mlp_imag.fc1", d, 4 * d)
        lin(f"{bp}.mlp_imag.fc2", 4 * d, d)
        sd[f"{bp}.gamma_1"] = np.full(d, 0.1, np.float32)
        sd[f"{bp}.gamma_2"] = np.full(d, 0.1, np.float32)
        if i >= cfg.vlffn_start_layer:
            ln(f"{bp}.norm2_vl")
            lin(f"{bp}.mlp_vl.fc1", d, 4 * d)
            lin(f"{bp}.mlp_vl.fc2", 4 * d, d)
    sd["text_embeddings.word_embeddings.weight"] = (
        rng.normal(size=(cfg.vocab_size, d)).astype(np.float32) * 0.02
    )
    sd["text_embeddings.position_embeddings.weight"] = (
        rng.normal(size=(cfg.max_position_embeddings, d)).astype(np.float32) * 0.02
    )
    sd["text_embeddings.token_type_embeddings.weight"] = np.zeros((2, d), np.float32)
    sd["text_embeddings.LayerNorm.weight"] = np.ones(d, np.float32)
    sd["text_embeddings.LayerNorm.bias"] = np.zeros(d, np.float32)
    sd["token_type_embeddings.weight"] = np.zeros((2, d), np.float32)
    from vqattack_tpu.models.vlmo import build_relative_position_index

    all_num = build_relative_position_index(cfg.window_size, cfg.max_text_len)[
        "all_num_relative_distance"
    ]
    sd["relative_position_bias_table"] = np.zeros(
        (all_num, cfg.num_heads * depth), np.float32
    )
    lin("pooler.dense", d, d)
    lin("mlm_score.transform.dense", d, d)
    sd["mlm_score.transform.LayerNorm.weight"] = np.ones(d, np.float32)
    sd["mlm_score.transform.LayerNorm.bias"] = np.zeros(d, np.float32)
    lin("mlm_score.decoder", d, cfg.vocab_size, bias=False)
    sd["mlm_score.bias"] = np.zeros(cfg.vocab_size, np.float32)
    lin("itm_score.fc", d, 2)
    lin("itc_text_proj.fc", d, d, bias=False)
    lin("itc_image_proj.fc", d, d, bias=False)
    lin("vqa_classifier.0", d, 2 * d)
    sd["vqa_classifier.1.weight"] = np.ones(2 * d, np.float32)
    sd["vqa_classifier.1.bias"] = np.zeros(2 * d, np.float32)
    lin("vqa_classifier.3", 2 * d, cfg.vqa_label_size)
    return sd


def test_convert_vlmo_tree_loads():
    sd = _fake_vlmo_sd(CFG)
    tree = convert_vlmo(sd, depth=CFG.depth)
    model = VLMo(CFG)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, CFG.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    out = model.apply({"params": tree}, ids, mask, px)
    assert out["cls_feats"].shape == (1, CFG.hidden_size)
    logits = model.apply({"params": tree}, px, ids, mask, method=VLMo.vqa_logits)
    assert logits.shape == (1, CFG.vqa_label_size)


def test_rel_pos_bias_resize_shapes():
    src_g, dst_g = 7, 13  # window 4 -> window 7 grids
    h = 6
    extra = 5
    rng = np.random.default_rng(0)
    table = rng.normal(size=(src_g ** 2 + extra, h)).astype(np.float32)
    out = interpolate_rel_pos_bias(table, src_g, dst_g)
    assert out.shape == (dst_g ** 2 + extra, h)
    # extra rows untouched
    np.testing.assert_array_equal(out[-extra:], table[-extra:])
    # src==dst is identity
    np.testing.assert_array_equal(interpolate_rel_pos_bias(table, src_g, src_g), table)
    # constant tables stay (approximately) constant under resize
    const = np.ones((src_g ** 2 + extra, h), np.float32)
    out_c = interpolate_rel_pos_bias(const, src_g, dst_g)
    np.testing.assert_allclose(out_c[: dst_g ** 2], 1.0, atol=1e-4)
    # the real 224->480 geometry: 27-grid -> 59-grid, 144 fused columns
    big = rng.normal(size=(27 ** 2 + 395, 8)).astype(np.float32)
    out_b = interpolate_rel_pos_bias(big, 27, 59)
    assert out_b.shape == (59 ** 2 + 395, 8)
    assert np.isfinite(out_b).all()


def test_rel_pos_bias_resize_cubic_exactness():
    """An interpolating cubic spline reproduces cubic polynomials exactly,
    so resizing a bias table whose per-head grid is a polynomial (deg<=3)
    in the geometric source coordinates must equal the polynomial evaluated
    at the integer destination coordinates (vlmo_module.py:764-801's
    geometry, modulo the removed scipy.interp2d)."""
    from vqattack_tpu.checkpoint.interpolate import (
        _geometric_points,
        interpolate_rel_pos_bias,
    )

    src_g, dst_g = 27, 59  # 224px -> 480px real case (2*14-1 -> 2*30-1)
    x = _geometric_points(src_g, dst_g)
    polys = [
        lambda u, v: 0.3 + 0.0 * u,                    # constant
        lambda u, v: 1.5 * u - 0.7 * v,                # linear
        lambda u, v: 0.01 * u * u * v - 0.2 * v + 2.0, # mixed cubic-ish
    ]
    table = np.stack(
        [np.asarray([[p(u, v) for v in x] for u in x]).reshape(-1) for p in polys],
        axis=1,
    )
    out = interpolate_rel_pos_bias(table, src_g, dst_g)
    t = dst_g // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    # the outermost destination row/column sits a hair outside the geometric
    # source hull (the reference's bisection stops within 1e-6 of dst//2, on
    # either side — see _geometric_points on the final-iteration q), where
    # FITPACK extrapolation loses a few digits; pin exactness inside the
    # hull and finiteness+closeness at the boundary
    interior = np.abs(dx) <= np.max(np.abs(dx)) - 1.0
    mask2d = (interior[:, None] & interior[None, :]).reshape(-1)
    for h, p in enumerate(polys):
        want = np.asarray([[p(u, v) for v in dx] for u in dx]).reshape(-1)
        np.testing.assert_allclose(out[mask2d, h], want[mask2d],
                                   rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(out[:, h], want, rtol=1e-3, atol=1e-3)


def test_convert_vlmo_resizes_abs_pos_embed():
    """Abs-pos VLMo/ViLT-family checkpoints carry transformer.pos_embed;
    conversion with a window change must bicubic-resize its grid part like
    the reference's load (vlmo_module.py:615-619), not pass it through."""
    sd = _fake_vlmo_sd(CFG)
    d = CFG.hidden_size
    src_w = CFG.window_size[0]
    dst_w = src_w + 3
    rng = np.random.default_rng(7)
    sd["transformer.pos_embed"] = rng.normal(
        size=(1, src_w ** 2 + 1, d)
    ).astype(np.float32)
    tree = convert_vlmo(sd, depth=CFG.depth, new_window=dst_w, src_window=src_w)
    assert tree["pos_embed"].shape == (1, dst_w ** 2 + 1, d)
    # cls row untouched by the grid resize
    np.testing.assert_allclose(
        tree["pos_embed"][0, 0], sd["transformer.pos_embed"][0, 0], atol=1e-6
    )
    # no-resize conversion passes through unchanged
    same = convert_vlmo(sd, depth=CFG.depth)
    np.testing.assert_array_equal(same["pos_embed"], sd["transformer.pos_embed"])


def test_convert_vlmo_maps_nlvr2_head():
    """NLVR2-finetuned checkpoints carry nlvr2_classifier.{0,1,3}; the
    converted tree must feed VLMo(with_nlvr2_head=True).nlvr2_logits."""
    sd = _fake_vlmo_sd(CFG)
    d = CFG.hidden_size
    rng = np.random.default_rng(8)
    # Sequential(Linear(2d, 2d), LN(2d), GELU, Linear(2d, 2)) — the pooled
    # features of both image streams are concatenated (vlmo_module.py:283-296)
    sd["nlvr2_classifier.0.weight"] = rng.normal(size=(2 * d, 2 * d)).astype(np.float32)
    sd["nlvr2_classifier.0.bias"] = np.zeros(2 * d, np.float32)
    sd["nlvr2_classifier.1.weight"] = np.ones(2 * d, np.float32)
    sd["nlvr2_classifier.1.bias"] = np.zeros(2 * d, np.float32)
    sd["nlvr2_classifier.3.weight"] = rng.normal(size=(2, 2 * d)).astype(np.float32)
    sd["nlvr2_classifier.3.bias"] = np.zeros(2, np.float32)
    sd["token_type_embeddings.weight"] = np.zeros((3, d), np.float32)
    tree = convert_vlmo(sd, depth=CFG.depth)
    assert "nlvr2_classifier" in tree
    # with_nlvr2_head widens the MODALITY type table to 3 rows internally;
    # the text-side token_type table stays at the checkpoint's 2 rows
    model = VLMo(CFG, with_nlvr2_head=True)
    px = jnp.zeros((1, 32, 32, 3))
    ids = jnp.ones((1, CFG.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    logits = model.apply(
        {"params": tree}, px, px, ids, mask, method=VLMo.nlvr2_logits
    )
    assert logits.shape == (1, 2)


def test_checkpoint_cache_invalidates_on_overwrite(tmp_path):
    """_maybe_cached must not serve a stale tree after the checkpoint file
    at the same path is overwritten with different weights."""
    from vqattack_tpu.checkpoint.io import _maybe_cached

    f = tmp_path / "ckpt.pth"
    f.write_bytes(b"v1")
    calls = []

    def build1():
        calls.append(1)
        return {"w": np.ones(3, np.float32)}

    def build2():
        calls.append(2)
        return {"w": np.full(3, 2.0, np.float32)}

    cache = str(tmp_path / "cache")
    t1 = _maybe_cached(str(f), cache, build1, "tag")
    t1b = _maybe_cached(str(f), cache, build1, "tag")  # cache hit
    assert calls == [1]
    np.testing.assert_array_equal(np.asarray(t1b["w"]), np.ones(3))
    import os as _os
    f.write_bytes(b"v2-longer")  # different size (and mtime)
    _os.utime(f, ns=(1, 1))  # force distinct mtime even on coarse clocks
    t2 = _maybe_cached(str(f), cache, build2, "tag")
    assert calls == [1, 2]
    np.testing.assert_array_equal(np.asarray(t2["w"]), np.full(3, 2.0))


def test_convert_vlmo_maps_itc_vl_heads_and_logit_scales():
    """The vlffn-branch ITC heads + contrastive temperatures
    (``vlmo_module.py:247-253``) convert and drive infer_text(vlffn=True)."""
    sd = _fake_vlmo_sd(CFG)
    rng = np.random.default_rng(3)
    d = CFG.hidden_size
    sd["itc_vl_text_proj.fc.weight"] = rng.normal(size=(d, d)).astype(np.float32) * 0.02
    sd["itc_vl_image_proj.fc.weight"] = rng.normal(size=(d, d)).astype(np.float32) * 0.02
    sd["logit_scale"] = np.asarray(np.log(1 / 0.07), np.float32)
    sd["logit_vl_scale"] = np.asarray(np.log(1 / 0.05), np.float32)

    tree = convert_vlmo(sd, depth=CFG.depth)
    assert tree["logit_scale"]["scale"].shape == ()
    np.testing.assert_allclose(tree["logit_vl_scale"]["scale"], np.log(1 / 0.05),
                               rtol=1e-6)

    model = VLMo(CFG)
    ids = jnp.ones((2, CFG.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    out = model.apply({"params": tree}, ids, mask, vlffn=True,
                      method=VLMo.infer_text)
    assert out["cls_vlffn_feats"].shape == (2, d)
    want = model.apply(
        {"params": tree}, px := jnp.zeros((2, 32, 32, 3)), vlffn=True,
        method=VLMo.infer_image)
    assert want["cls_vlffn_feats"].shape == (2, d)
