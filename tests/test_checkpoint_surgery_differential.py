"""Differential tests for the checkpoint-surgery routines against the
reference's OWN conversion code (VERDICT round 2, Next #2).

SURVEY §7.2 flags these as "must be bit-faithful or ASR drifts"; until now
they were validated only against self-derived expectations.  Here each one
executes the reference's actual function:

- ``convert_to_textpt_ckpt`` (``vlmo_module.py:47-85``) — BEiT/text-pretrain
  key surgery + per-layer rel-pos-table merge spliced over the module table;
- ``convert_deepspeed_ckpt`` (``vlmo_module.py:115-125``) — ``module.``
  prefix strip, driven through the ``ckpt["module"]`` envelope;
- ``interpolate_pos_embed`` — BOTH copies: the VLMo one
  (``vlmo_module.py:88-112``) and the ALBEF one (``models/vit.py:181-205``),
  each a reshape/slice wrapper around torch bicubic;
- the rel-pos-bias geometric-progression resize inside
  ``load_pretrained_weight_pretrain`` (``vlmo_module.py:741-804``) at the
  REAL 224->480 geometry (27-grid -> 59-grid, 397 extra rows), driven
  through the reference's full load method on an unbound ``self`` stub.

The reference calls ``scipy.interpolate.interp2d``, removed in SciPy 1.14;
the test installs scipy's own documented bug-for-bug replacement
(``RectBivariateSpline`` on regular grids) so the reference's geometry code
— the bisection for the geometric ratio, the cumulative source coordinates,
the extra-token split — still executes verbatim.
"""

from __future__ import annotations

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_shim as rs  # noqa: E402

from vqattack_tpu.checkpoint.convert import (  # noqa: E402
    convert_textpt_state_dict,
    load_torch_checkpoint,
    resize_vlmo_rel_pos_table,
)
from vqattack_tpu.checkpoint.interpolate import interpolate_pos_embed  # noqa: E402


def _interp2d_shim(x, y, z, kind="cubic"):
    """SciPy's documented interp2d replacement for regular grids
    (the removal notice names ``RectBivariateSpline`` as the nearly
    bug-for-bug compatible substitute).  interp2d's ``z`` is indexed
    ``[y, x]`` and the returned callable is ``f(dx, dy) -> [dy, dx]``."""
    from scipy.interpolate import RectBivariateSpline

    assert kind == "cubic"
    s = RectBivariateSpline(np.asarray(y, np.float64),
                            np.asarray(x, np.float64),
                            np.asarray(z, np.float64), kx=3, ky=3)
    return lambda dx, dy: s(np.asarray(dy, np.float64),
                            np.asarray(dx, np.float64))


# ---------------------------------------------------------------------------
# convert_to_textpt_ckpt
# ---------------------------------------------------------------------------


def _synthetic_beit_sd(rng, layers=2, heads=3, window=4):
    """A miniature BEiT-shaped checkpoint: per-layer rel-pos tables
    ((2w-1)^2 + 3 rows like BEiT), mlp/norm2/norm1/other keys."""
    rows = (2 * window - 1) ** 2 + 3
    sd = {}
    for i in range(layers):
        sd[f"blocks.{i}.attn.relative_position_bias_table"] = torch.from_numpy(
            rng.normal(size=(rows, heads)).astype(np.float32))
        sd[f"blocks.{i}.mlp.fc1.weight"] = torch.from_numpy(
            rng.normal(size=(8, 6)).astype(np.float32))
        sd[f"blocks.{i}.mlp.fc1.bias"] = torch.from_numpy(
            rng.normal(size=(8,)).astype(np.float32))
        sd[f"blocks.{i}.norm2.weight"] = torch.from_numpy(
            rng.normal(size=(6,)).astype(np.float32))
        sd[f"blocks.{i}.norm1.weight"] = torch.from_numpy(
            rng.normal(size=(6,)).astype(np.float32))
    sd["cls_token"] = torch.from_numpy(rng.normal(size=(1, 1, 6)).astype(np.float32))
    sd["patch_embed.proj.weight"] = torch.from_numpy(
        rng.normal(size=(6, 3, 2, 2)).astype(np.float32))
    return sd


@pytest.mark.parametrize("fresh_module", [True, False])
def test_textpt_convert_matches_reference(fresh_module):
    """``convert_to_textpt_ckpt`` key-for-key + value-exact.  The reference
    splices the merged per-layer tables over a CLONE of the module's current
    table (``vlmo_module.py:79-83``) — zeros on a fresh module (the real
    textmlm flow), arbitrary otherwise; both are pinned."""
    vm = rs.vlmo_module()
    rng = np.random.default_rng(0)
    layers, heads, window = 2, 3, 4
    all_rows = (2 * window - 1) ** 2 + 3 + 2 * 8 + 2  # image + text + cross
    sd = _synthetic_beit_sd(rng, layers, heads, window)

    if fresh_module:
        module_table = torch.zeros(all_rows, heads * layers)
    else:
        module_table = torch.from_numpy(
            rng.normal(size=(all_rows, heads * layers)).astype(np.float32))
    module = types.SimpleNamespace(
        relative_position_bias_table=torch.nn.Parameter(module_table.clone()))

    want = vm.convert_to_textpt_ckpt({k: v.clone() for k, v in sd.items()}, module)

    got = convert_textpt_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        all_num_relative_distance=all_rows,
        num_heads_times_layers=heads * layers,
        base_table=None if fresh_module else module_table.numpy(),
    )

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(
            got[k], want[k].detach().numpy(), err_msg=k)
    # spot-check the surgery itself: mlp -> mlp_imag, norm2 -> norm2_imag,
    # everything transformer.-prefixed, per-layer tables merged column-wise
    assert "transformer.blocks.0.mlp_imag.fc1.weight" in got
    assert "transformer.blocks.1.norm2_imag.weight" in got
    assert "transformer.blocks.0.norm1.weight" in got
    assert got["relative_position_bias_table"].shape == (all_rows, heads * layers)


def test_deepspeed_strip_matches_reference(tmp_path):
    """``ckpt["module"]`` envelope + ``module.`` key strip
    (``vlmo_module.py:115-125`` driven at ``:689-704``) vs
    :func:`load_torch_checkpoint` on the same file."""
    vm = rs.vlmo_module()
    rng = np.random.default_rng(1)
    inner = {
        "module.transformer.blocks.0.attn.qkv.weight": torch.from_numpy(
            rng.normal(size=(6, 2)).astype(np.float32)),
        "module.mlm_score.bias": torch.from_numpy(
            rng.normal(size=(5,)).astype(np.float32)),
        # a key without the prefix passes through unchanged (:121-123)
        "logit_scale": torch.tensor(2.5),
    }
    p = tmp_path / "ds.ckpt"
    torch.save({"module": inner}, p)

    ckpt = torch.load(p, map_location="cpu", weights_only=False)
    want = vm.convert_deepspeed_ckpt(ckpt["module"])
    got = load_torch_checkpoint(str(p))

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k].numpy(), err_msg=k)


# ---------------------------------------------------------------------------
# interpolate_pos_embed — both reference copies
# ---------------------------------------------------------------------------


def _pos_embed_case(rng, orig=14, new=30, dim=32, extra=1):
    pe = rng.normal(size=(1, orig * orig + extra, dim)).astype(np.float32)
    stub = types.SimpleNamespace(
        patch_embed=types.SimpleNamespace(num_patches=new * new),
        pos_embed=torch.zeros(1, new * new + extra, dim),
    )
    return pe, stub


def test_interpolate_pos_embed_matches_vlmo_reference():
    """The reference's own reshape/permute/interpolate/cat wrapper
    (``vlmo_module.py:88-112``), not raw ``F.interpolate`` (VERDICT round 2,
    Missing #2) — at the real 14x14 -> 30x30 (224->480/16) geometry."""
    vm = rs.vlmo_module()
    rng = np.random.default_rng(2)
    pe, stub = _pos_embed_case(rng)
    want = vm.interpolate_pos_embed(torch.from_numpy(pe.copy()), stub)
    got = interpolate_pos_embed(pe, new_num_patches=900, num_extra_tokens=1)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)

    # same-size input returns the checkpoint unchanged (:111-112)
    pe_same = rng.normal(size=(1, 901, 32)).astype(np.float32)
    want_same = vm.interpolate_pos_embed(torch.from_numpy(pe_same.copy()), stub)
    got_same = interpolate_pos_embed(pe_same, new_num_patches=900)
    np.testing.assert_array_equal(got_same, want_same.numpy())


def test_interpolate_pos_embed_matches_albef_reference():
    """The ALBEF copy (``models/vit.py:181-205``) — identical math, separate
    code path in the reference; drive it too so both imports are pinned."""
    ref = rs.albef_models()
    rng = np.random.default_rng(3)
    pe, stub = _pos_embed_case(rng, orig=14, new=20, dim=16)
    stub.patch_embed.num_patches = 400
    stub.pos_embed = torch.zeros(1, 401, 16)
    want = ref.vit.interpolate_pos_embed(torch.from_numpy(pe.copy()), stub)
    got = interpolate_pos_embed(pe, new_num_patches=400, num_extra_tokens=1)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# rel-pos-bias geometric resize, through the reference's full load method
# ---------------------------------------------------------------------------


def test_rel_pos_resize_matches_reference_at_real_geometry(tmp_path, monkeypatch):
    """Drive the reference's ``load_pretrained_weight_pretrain``
    (``vlmo_module.py:689-806``) unbound on a stub ``self`` with the REAL
    224->480 geometry: src window 14 (27-grid, 729 body rows + 397 extra),
    dst window 30 (59-grid, 3481 body rows) — the exact resize VERDICT
    round 2 Missing #2 says never executed against the reference.  Asserts
    the final state dict (rel-pos table, interpolated pos_embed, popped
    index keys) against :func:`resize_vlmo_rel_pos_table` /
    :func:`interpolate_pos_embed`."""
    vm = rs.vlmo_module()
    monkeypatch.setattr(vm.interpolate, "interp2d", _interp2d_shim,
                        raising=False)

    heads, dim = 4, 16
    max_text_len_initckpt = 196
    dst_window, src_window = 30, 14
    dst_rows = (2 * dst_window - 1) ** 2  # 3481
    num_extra = 2 * max_text_len_initckpt + 3 + 2  # 397
    src_rows = (2 * src_window - 1) ** 2  # 729

    rng = np.random.default_rng(4)
    table = rng.normal(size=(src_rows + num_extra, heads)).astype(np.float32)
    pos_embed = rng.normal(size=(1, 197, dim)).astype(np.float32)

    sd = {
        "relative_position_bias_table": torch.from_numpy(table.copy()),
        "transformer.pos_embed": torch.from_numpy(pos_embed.copy()),
        # present so the reference's unconditional pops (:755-757) succeed
        "relative_position_index": torch.zeros(3, 3),
        "text_relative_position_index": torch.zeros(3, 3),
        "text_imag_relative_position_index": torch.zeros(3, 3),
    }
    p = tmp_path / "pre.ckpt"
    torch.save({"state_dict": sd}, p)

    captured = {}

    def load_state_dict(state_dict, strict=False):
        captured.update(state_dict)
        return [], []

    stub = types.SimpleNamespace(
        relative_position_bias_table=torch.zeros(dst_rows + num_extra, heads),
        transformer=types.SimpleNamespace(
            patch_embed=types.SimpleNamespace(
                patch_shape=(dst_window, dst_window),
                num_patches=dst_window * dst_window,
            ),
            pos_embed=torch.zeros(1, dst_window * dst_window + 1, dim),
        ),
        load_state_dict=load_state_dict,
    )
    config = {
        "load_path": str(p),
        "loss_names": {"textmlm": 0},
        "max_text_len": 40,
    }

    vm.VLMo.load_pretrained_weight_pretrain(stub, config)

    # the three index keys were popped before loading (:755-757)
    assert "relative_position_index" not in captured
    assert "text_imag_relative_position_index" not in captured

    want_table = captured["relative_position_bias_table"].numpy()
    got_table = resize_vlmo_rel_pos_table(table, src_window, dst_window)
    assert got_table.shape == want_table.shape == (dst_rows + num_extra, heads)
    # identical geometric-coordinate bicubic spline, f64 internally
    np.testing.assert_allclose(got_table, want_table, atol=1e-5)
    # the 397 extra rows (3 image specials + 392 text + 2 cross) pass through
    np.testing.assert_array_equal(got_table[dst_rows:], table[src_rows:])

    want_pe = captured["transformer.pos_embed"].numpy()
    got_pe = interpolate_pos_embed(
        pos_embed, new_num_patches=dst_window * dst_window, num_extra_tokens=1)
    np.testing.assert_allclose(got_pe, want_pe, atol=1e-5)
