"""Measure the VLMo (MoME @480) attack matrix on the chip.

Round 2 measured only the f32 b=1 point (82.3 aggregate sample-iters/s);
this fills in the dtype x batch x remat grid that found ALBEF's production
configuration (bf16 + no-remat + batch 8-16), merging rows into
BENCH_MATRIX.json keyed like bench.py's matrix mode.

    python scripts/bench_vlmo.py [quick]

"quick" = only the production candidates (bf16 b=8/16 no-remat).
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
        (jnp.bfloat16, 8, False),
        (jnp.bfloat16, 16, False),
    ]
    if not quick:
        configs += [
            (jnp.bfloat16, 1, False),
            (jnp.bfloat16, 8, True),
            (jnp.float32, 1, True),
            (jnp.float32, 8, False),
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
            row = bench.measure("vlmo", batch, 40, dtype, remat=remat)
        except Exception as e:
            row = {"model": "vlmo", "batch": batch,
                   "dtype": jnp.dtype(dtype).name, "remat": remat,
                   "error": repr(e)[:200]}
        print(json.dumps(row), flush=True)
        matrix["rows"] = [r for r in matrix["rows"] if key(r) != key(row)]
        matrix["rows"].append(row)
        with open(path, "w") as f:
            json.dump(matrix, f, indent=1)


if __name__ == "__main__":
    main()
