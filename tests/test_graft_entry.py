"""Driver-contract tests for __graft_entry__ (abstract shapes only — the
full-size compile is exercised on TPU out-of-band)."""

import jax
import jax.numpy as jnp


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    img_f, txt_f, logits = out
    assert img_f.shape == (1, 13, 901, 768)
    assert txt_f.shape == (1, 13, 25, 768)
    assert logits.shape == (1, 25, 30522)
