"""Retune the Pallas flash-attention block sizes at the attack geometry.

Times a 12-layer serial attention fwd+bwd chain (the PGD backward's hot
pattern: S=941->1024 padded, d=64, 12 heads) for XLA einsum vs the flash
kernel across (block_q, block_k) grids, at batch 1 and 8, bf16.

Round-2 measured flash 1.54x slower than XLA at the default 128/128 blocks
and attributed it to a grid of tiny programs (PERF.md); this script answers
whether bigger blocks close the gap.  Run on TPU:

    python scripts/flash_blocks.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqattack_tpu.utils.cache import enable_compile_cache


def _hard_sync(x) -> None:
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def chain(impl: str, b: int, reps: int = 5) -> float:
    """12-layer attention fwd+bwd chain wall-clock (s) at batch b, bf16."""
    from vqattack_tpu.ops import attention as attn_backend

    s, h, d = 941, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((h * d, h * d)) * 0.02, jnp.bfloat16)

    def one(x, w):
        if impl == "flash":
            o = attn_backend.flash_attention(x, x, x, None, d ** -0.5)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", x * d ** -0.5, x)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(x.dtype), x)
        # a dense between layers keeps the chain serial + realistic
        o = (o.reshape(b, s, h * d) @ w).reshape(b, s, h, d)
        return o

    def loss(x, w):
        for _ in range(12):
            x = one(x, w)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    out = g(q, w)
    _hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(q, w)
        _hard_sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    enable_compile_cache()
    for b in (1, 8):
        t = chain("xla", b)
        print(f"xla       b={b}: {t*1e3:8.1f} ms", flush=True)
        for bq, bk in ((128, 128), (256, 256), (512, 512), (512, 1024),
                       (1024, 1024)):
            os.environ["VQATTACK_FLASH_BLOCK_Q"] = str(bq)
            os.environ["VQATTACK_FLASH_BLOCK_K"] = str(bk)
            try:
                t = chain("flash", b)
                print(f"flash {bq:4d}/{bk:4d} b={b}: {t*1e3:8.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"flash {bq:4d}/{bk:4d} b={b}: FAIL {repr(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
