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
