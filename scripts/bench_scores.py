"""Measure the scores-remat lever on the chip and merge into BENCH_MATRIX.

Runs bench.measure() for the remat="scores" configurations next to the
round-2 matrix's best points, prints each row, and appends the new rows to
BENCH_MATRIX.json (replacing rows with identical keys).  One process: the
relay's per-process executable upload is paid once.

    python scripts/bench_scores.py [quick]

"quick" = only the production candidates (bf16 b=8/16); default also runs
f32 b=8 and bf16 b=1/32.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main() -> None:
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    from vqattack_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import bench

    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    configs = [
        (jnp.bfloat16, 8, "scores"),
        (jnp.bfloat16, 16, "scores"),
    ]
    if not quick:
        configs += [
            (jnp.bfloat16, 1, "scores"),
            (jnp.bfloat16, 32, "scores"),
            (jnp.float32, 8, "scores"),
        ]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_MATRIX.json")
    with open(path) as f:
        matrix = json.load(f)

    def key(r):
        return (r.get("model"), r.get("batch"), r.get("dtype"),
                str(r.get("remat")), r.get("fused_loss", False))

    for dtype, batch, remat in configs:
        try:
            row = bench.measure("albef", batch, 40, dtype, remat=remat)
        except Exception as e:
            row = {"model": "albef", "batch": batch,
                   "dtype": jnp.dtype(dtype).name, "remat": remat,
                   "error": repr(e)[:200]}
        print(json.dumps(row), flush=True)
        matrix["rows"] = [r for r in matrix["rows"] if key(r) != key(row)]
        matrix["rows"].append(row)
        with open(path, "w") as f:
            json.dump(matrix, f, indent=1)


if __name__ == "__main__":
    main()
