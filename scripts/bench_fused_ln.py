"""Chain-level A/B of the fused residual+LayerNorm kernel vs XLA.

Isolates the pattern the kernel targets — the ViT trunk's 24 residual-add +
LayerNorm sites at the production shape ([16*901, 768] bf16) with a matmul
between sites (so XLA gets its usual chance to fuse the normalize into the
consumer and the add into the producer) — and times fwd+bwd of both
implementations on-chip.  Small program = fast relay compile, unlike the
full-attack A/B (see PERF.md round 3).

Usage: python scripts/bench_fused_ln.py [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vqattack_tpu.ops.fused_ln import (  # noqa: E402
    residual_layernorm,
    residual_layernorm_reference,
)

B, S, D = 16, 901, 768
LAYERS = 12
DTYPE = jnp.bfloat16


def make_chain(fused: bool):
    def chain(x, delta, gamma, beta, w):
        # 2 residual+LN sites per layer with a dxd matmul between (the
        # cheapest stand-in for attn/mlp that keeps XLA fusion behavior)
        fn = residual_layernorm if fused else residual_layernorm_reference
        for _ in range(LAYERS):
            s, h = fn(x, delta, gamma, beta)
            delta = jnp.dot(h, w, preferred_element_type=DTYPE)
            s2, h2 = fn(s, delta, gamma, beta)
            x, delta = s2, jnp.dot(h2, w, preferred_element_type=DTYPE)
        return jnp.sum((x + delta).astype(jnp.float32) ** 2)

    def loss(x, delta, gamma, beta, w):
        return chain(x, delta, gamma, beta, w)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))


def main(iters: int = 30) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B * S, D)) * 0.5, DTYPE)
    delta = jnp.asarray(rng.normal(size=(B * S, D)) * 0.1, DTYPE)
    gamma = jnp.asarray(rng.normal(size=(D,)) * 0.05 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(D,)) * 0.05, jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, D)) * 0.02, DTYPE)

    def hard_sync(out):
        # device->host scalar: the tunneled runtime's only reliable sync
        # (block_until_ready can return before remote execution finishes,
        # leaking warmup/upload time into whatever is timed next)
        np.asarray(jax.device_get(out[0].reshape(-1)[:1]))

    for name, fused in (("xla", False), ("pallas", True)):
        f = make_chain(fused)
        t0 = time.perf_counter()
        hard_sync(f(x, delta, gamma, beta, w))
        compile_s = time.perf_counter() - t0
        hard_sync(f(x, delta, gamma, beta, w))  # steady-state warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x, delta, gamma, beta, w)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.2f} ms/step (compile+upload {compile_s:.1f}s)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
