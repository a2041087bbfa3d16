"""Measure this chip's *achievable* roofline through the attached runtime.

The MFU numbers in PERF.md divide by the v5e datasheet bf16 peak
(197 TFLOP/s).  On this environment the chip sits behind a tunneled-PJRT
relay, so the datasheet peak may not be reachable by ANY program.  This
script measures, on the real device:

1. peak sustained matmul FLOP/s — square bf16 and f32 matmul chains at
   MXU-friendly sizes (a ``lax.scan`` of dependent matmuls, so XLA cannot
   elide work; wall-clock is amortized over many steps);
2. sustained HBM read+write bandwidth — a scan of large-array copies with a
   data dependency (x = x * a + b, two reads + one write per element);
3. the attention-shaped contraction of the actual workload
   ([B*H, 941, 64] x [B*H, 64, 941]), which is the hot matmul geometry of
   the attack (head_dim=64 under-fills the 128-wide MXU).

Usage: ``python scripts/roofline.py`` (runs on whatever jax.devices()[0]
is).  Prints one JSON dict; paste the numbers into PERF.md.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _hard_sync(x) -> None:
    np.asarray(jax.device_get(jnp.ravel(x)[:1]))


def _time_scan(fn, init, steps: int, reps: int = 3) -> float:
    """Best wall seconds for one jitted scan of ``steps`` applications."""

    def body(c, _):
        return fn(c), None

    scanned = jax.jit(lambda c: jax.lax.scan(body, c, None, length=steps)[0])
    out = scanned(init)
    _hard_sync(out)  # warm-up (compile)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = scanned(init)
        _hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def matmul_peak(n: int, dtype, steps: int = 64) -> float:
    """Sustained FLOP/s of a dependent chain of n x n matmuls."""
    a = jnp.eye(n, dtype=dtype) * 0.999  # spectral radius <1: no overflow
    x = jnp.ones((n, n), dtype=dtype)

    def step(c):
        return (a @ c).astype(dtype)

    wall = _time_scan(step, x, steps)
    return 2.0 * n * n * n * steps / wall


def attention_shape_flops(b_heads: int = 12, s: int = 941, d: int = 64,
                          dtype=jnp.float32, steps: int = 64) -> float:
    """FLOP/s of the attack's actual QK^T geometry (batched, thin-K)."""
    q = jnp.ones((b_heads, s, d), dtype=dtype) * 0.01
    k = jnp.ones((b_heads, d, s), dtype=dtype) * 0.01

    def step(c):
        logits = jnp.einsum("bsd,bdt->bst", c, k)
        # fold back to q's shape with a second thin matmul (AV-shaped)
        return jnp.einsum("bst,bdt->bsd", logits, k * 0.01).astype(dtype)

    wall = _time_scan(step, q, steps)
    flops_per_step = 2 * b_heads * s * s * d * 2  # two contractions
    return flops_per_step * steps / wall


def hbm_bandwidth(mib: int = 512, steps: int = 64) -> float:
    """Sustained bytes/s of x = x*a + b over a ``mib`` MiB f32 array."""
    n = mib * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 1e-6, jnp.float32)

    def step(c):
        return c * 0.9999 + b

    wall = _time_scan(step, x, steps)
    # per element: read x, read b, write x
    return 3.0 * 4.0 * n * steps / wall


def main() -> None:
    dev = jax.devices()[0]
    out = {"device": dev.device_kind, "platform": dev.platform}
    out["matmul_bf16_tflops"] = {}
    out["matmul_f32_tflops"] = {}
    for n in (1024, 2048, 4096):
        out["matmul_bf16_tflops"][str(n)] = round(
            matmul_peak(n, jnp.bfloat16) / 1e12, 1
        )
        out["matmul_f32_tflops"][str(n)] = round(
            matmul_peak(n, jnp.float32) / 1e12, 1
        )
    out["attention_geometry_f32_tflops"] = round(
        attention_shape_flops(dtype=jnp.float32) / 1e12, 1
    )
    out["attention_geometry_bf16_tflops"] = round(
        attention_shape_flops(dtype=jnp.bfloat16) / 1e12, 1
    )
    # occupancy sweep: the same contraction at the batched attack's
    # batch*heads counts.  b_heads=12 is batch 1; 96 is batch 8; 384 batch
    # 32.  The spread (5 -> ~31 -> ~64 TF/s measured here) shows the
    # batch-1 number is a latency/occupancy floor of the thin-K geometry,
    # NOT a hardware cap — see PERF.md "roofline" for the interpretation.
    out["attention_geometry_bf16_tflops_by_bheads"] = {
        str(bh): round(
            attention_shape_flops(b_heads=bh, dtype=jnp.bfloat16) / 1e12, 1
        )
        for bh in (12, 96, 384)
    }
    out["hbm_gib_per_s"] = round(hbm_bandwidth() / 2**30, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
