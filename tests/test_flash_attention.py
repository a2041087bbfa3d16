"""Flash-attention backend parity vs the XLA einsum path (interpret-mode on
CPU is too slow for the pallas kernel, so CPU tests compare the wrapper's
padding/bias plumbing against the reference mha on tiny shapes via the
kernel's own mha_reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqattack_tpu.ops.attention import attention_impl, get_impl


def test_impl_context():
    assert get_impl() == "xla"
    with attention_impl("flash"):
        assert get_impl() == "flash"
    assert get_impl() == "xla"


def test_flash_wrapper_matches_einsum_reference():
    """Validate the padding/bias plumbing against the kernel's own
    mha_reference (pure jnp, runs everywhere)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import mha_reference

    rng = np.random.default_rng(0)
    b, sq, h, d = 2, 130, 2, 64  # deliberately not a multiple of 128
    q = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, sq, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, h, sq, sq)), jnp.float32) * 0.2

    # kernel semantics: softmax((q@k + ab) * sm_scale); our wrapper
    # pre-divides the bias so it lands post-scale
    ref = mha_reference(q, k, v, ab=bias / 0.125, sm_scale=0.125)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * 0.125, k) + bias
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_prepare_no_bias_uses_segment_ids_not_ab():
    """The no-bias path (ViT joint-image attention, the headline hot loop)
    must mask sequence padding via segment ids, NOT a materialized
    [B, H, S, S] bias — emulating the kernel's segment masking must
    reproduce plain unpadded attention on the real rows."""
    from vqattack_tpu.ops.attention import _prepare

    rng = np.random.default_rng(1)
    b, sq, h, d = 2, 130, 2, 8  # pads to 256
    scale = d ** -0.5
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)

    qt, kt, vt, ab, seg, sq_out = _prepare(q, k, v, None, scale)
    assert ab is None, "no-bias path must not materialize an ab tensor"
    assert seg is not None and sq_out == sq
    q_seg, kv_seg = seg
    assert q_seg.shape == (b, 256) and kv_seg.shape == (b, 256)
    # real tokens segment 0, padded segment 1
    assert int(q_seg[0, :sq].sum()) == 0 and int(q_seg[0, sq:].sum()) == 256 - sq

    # emulate the kernel: scores masked where q_seg != kv_seg
    mask = (q_seg[:, None, :, None] != kv_seg[:, None, None, :])
    attn = jnp.einsum("bhqd,bhkd->bhqk", qt * scale, kt)
    attn = jnp.where(mask, -1e30, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vt)[:, :, :sq, :]
    out = jnp.transpose(out, (0, 2, 1, 3))

    # plain unpadded attention
    ref_attn = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", q * scale, k), axis=-1
    )
    ref = jnp.einsum("bhqk,bkhd->bqhd", ref_attn, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_prepare_bias_path_keeps_key_padding_mask():
    """With an additive bias the ab tensor is built; padded keys must carry
    a large negative bias so they get no weight."""
    from vqattack_tpu.ops.attention import _prepare

    rng = np.random.default_rng(2)
    b, sq, h, d = 1, 130, 2, 8
    scale = 0.25
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, h, sq, sq)), jnp.float32)

    qt, kt, vt, ab, seg, _ = _prepare(q, k, v, bias, scale)
    assert seg is None and ab is not None
    assert ab.shape == (b, h, 256, 256)
    # kernel applies softmax((qk + ab) * scale): post-scale the padded-key
    # bias must still be overwhelmingly negative
    assert float(jnp.max(ab[..., sq:] * scale)) < -1e6
    # real-key entries reproduce the pre-scale division
    np.testing.assert_allclose(
        np.asarray(ab[..., :sq, :sq] * scale), np.asarray(bias), atol=1e-4
    )


def test_block_size_divides_padded_length():
    """Block sizes must divide the padded sequence length for ANY geometry,
    not just S_p <= 1024 (e.g. image_size 576 -> joint seq 1337 -> padded
    1408, where min()-clamping alone would violate the kernel's
    divisibility requirement)."""
    from vqattack_tpu.ops.attention import _block_size

    for padded in (128, 256, 896, 1024, 1152, 1408, 2048, 3200):
        b = _block_size(1024, padded)
        assert padded % b == 0, (padded, b)
        assert 128 <= b <= 1024
    assert _block_size(1024, 1024) == 1024
    assert _block_size(1024, 1408) == 128  # 11 * 128, no larger divisor
    assert _block_size(1024, 2048) == 1024
