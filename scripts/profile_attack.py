"""Op-level time/bandwidth attribution of the production attack program.

Round 2's perf story diagnosed the b>=8 plateau as "HBM traffic that scales
with batch" from the roofline sweep alone, because the relay runtime exposed
neither ``cost_analysis`` nor ``jax.profiler`` traces (PERF.md).  On a
runtime that does (this one), this script measures the claim directly:

1. build the exact production attack program (same plumbing as bench.py);
2. run one traced scan under ``jax.profiler.trace``;
3. parse the Chrome-trace JSON the TPU backend emits (per-HLO events carry
   ``dur``, ``bytes_accessed``, ``hlo_category``) and print, per HLO
   category and per top op: time share, achieved HBM bandwidth, and an
   MXU-vs-VPU split.

Usage::

    python scripts/profile_attack.py            # production config
    BENCH_BATCH=1 BENCH_DTYPE=float32 python scripts/profile_attack.py

Writes the aggregate table to stdout and the raw per-op CSV next to the
trace dir (default /tmp/vqattack_profile).
"""

from __future__ import annotations

import collections
import csv
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vqattack_tpu.utils.cache import enable_compile_cache


def build_runner():
    import bench

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "40"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    remat_env = os.environ.get("BENCH_REMAT", "0")
    remat = {"0": False, "1": True, "scores": "scores"}[remat_env]
    fused = os.environ.get("BENCH_FUSED_LOSS", "0") == "1"
    unroll = int(os.environ.get("BENCH_UNROLL", "4"))
    model = os.environ.get("BENCH_MODEL", "albef")
    if model == "albef":
        run, _ = bench._make_albef(batch, iters, dtype, fused, remat, unroll)
    else:
        run, _ = bench._make_vlmo(batch, iters, dtype, fused, remat, unroll)
    meta = dict(batch=batch, iters=iters, dtype=dtype_name, remat=remat_env,
                unroll=unroll, model=model)
    return run, meta


def newest_trace(trace_dir: str) -> str:
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    return max(paths, key=os.path.getmtime)


def device_events(trace_path: str):
    data = json.load(gzip.open(trace_path))
    ev = data["traceEvents"]
    device_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            yield e


MXU_CATEGORIES = {"convolution", "convolution fusion"}


#: trace events that are parents of real HLO leaf ops (the jit_* module
#: event, the `while` loop event) carry no hlo_category or the "while"
#: category; counting them double-counts every child.  Leaf totals only.
PARENT_CATEGORIES = {"?", "while"}


def attribute(trace_path: str, out_csv: str):
    by_cat = collections.defaultdict(lambda: [0.0, 0.0, 0])  # us, bytes, n
    by_op = collections.defaultdict(lambda: [0.0, 0.0, 0])
    total_us = 0.0
    parent_us = 0.0
    for e in device_events(trace_path):
        dur = float(e.get("dur", 0.0))
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        if cat in PARENT_CATEGORIES:
            parent_us += dur
            continue
        by = float(args.get("bytes_accessed", 0) or 0)
        name = e.get("name", "?")
        # strip trailing .N / digit suffixes so repeated layers aggregate
        base = name.rstrip("0123456789.")
        by_cat[cat][0] += dur
        by_cat[cat][1] += by
        by_cat[cat][2] += 1
        by_op[base][0] += dur
        by_op[base][1] += by
        by_op[base][2] += 1
        total_us += dur
    rows_cat = sorted(by_cat.items(), key=lambda kv: -kv[1][0])
    print(f"\ndevice leaf-op time: {total_us/1e3:.2f} ms over "
          f"{sum(v[2] for v in by_cat.values())} ops "
          f"(parent module/while events excluded: {parent_us/1e3:.1f} ms)")
    print(f"{'hlo_category':<28}{'ms':>9}{'share':>8}{'GiB':>9}{'GiB/s':>9}{'#ops':>7}")
    for cat, (us, by, n) in rows_cat:
        gib = by / 2**30
        bw = by / (us / 1e6) / 2**30 if us else 0.0
        print(f"{cat:<28}{us/1e3:>9.2f}{us/total_us*100:>7.1f}%"
              f"{gib:>9.2f}{bw:>9.0f}{n:>7}")
    mxu_us = sum(v[0] for k, v in by_cat.items() if k in MXU_CATEGORIES)
    total_by = sum(v[1] for v in by_cat.values())
    print(f"\nMXU-category share: {mxu_us/total_us*100:.1f}%  "
          f"(everything else is VPU/copy/HBM-bound)")
    print(f"aggregate HLO bytes_accessed: {total_by/2**30:.1f} GiB over "
          f"{total_us/1e6:.2f} s busy = {total_by/(total_us/1e6)/2**30:.0f} GiB/s "
          f"average achieved (measured stream capacity ~692 GiB/s)")
    print(f"\ntop 25 op groups by time:")
    print(f"{'op (suffix-stripped)':<52}{'ms':>9}{'share':>8}{'GiB/s':>9}{'#':>6}")
    for op, (us, by, n) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:25]:
        bw = by / (us / 1e6) / 2**30 if us else 0.0
        print(f"{op[:52]:<52}{us/1e3:>9.2f}{us/total_us*100:>7.1f}%{bw:>9.0f}{n:>6}")
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["op", "total_us", "bytes", "count"])
        for op, (us, by, n) in sorted(by_op.items(), key=lambda kv: -kv[1][0]):
            w.writerow([op, f"{us:.1f}", int(by), n])
    print(f"\nper-op CSV: {out_csv}")
    return total_us


#: roofline constants for the slack report (this chip, measured: PERF.md)
PEAK_FLOPS = 197e12       # bf16 MXU peak
STREAM_BPS = 692 * 2**30  # measured HBM stream capacity


def roofline_slack(trace_path: str, top: int = 20):
    """Per-module roofline slack: for every HLO leaf op, floor =
    max(model_flops/peak, bytes/stream); slack = time - floor.  Grouping by
    the trailing ``tf_op`` path (block indices stripped) attributes the
    recoverable time to model components instead of anonymous fusion ids —
    this is what found the 9-17 TFLOP/s patchify conv (round 5)."""
    import re

    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for e in device_events(trace_path):
        args = e.get("args", {})
        cat = args.get("hlo_category", "?")
        if cat in PARENT_CATEGORIES:
            continue
        t = re.sub(r"blocks?_\d+", "blocks", args.get("tf_op", "?"))
        g = "/".join(t.split("/")[-3:])[:64]
        agg[g][0] += float(e.get("dur", 0.0)) / 1e6
        agg[g][1] += float(args.get("bytes_accessed", 0) or 0)
        agg[g][2] += float(args.get("model_flops", 0) or 0)
        agg[g][3] += 1
    rows = []
    for g, (t, b, f, n) in agg.items():
        floor = max(f / PEAK_FLOPS, b / STREAM_BPS)
        rows.append((t - floor, g, t, f, b, n))
    rows.sort(reverse=True)
    total = sum(r[2] for r in rows)
    slack = sum(max(r[0], 0.0) for r in rows)
    print(f"\nroofline slack: busy {total:.2f} s, floor {total-slack:.2f} s, "
          f"recoverable-if-perfect {slack:.2f} s "
          f"(max speedup {total/(total-slack):.2f}x)")
    print(f"{'group (tf_op tail)':<64}{'ms':>8}{'slack':>8}{'TF/s':>6}{'GiB/s':>7}")
    for s, g, t, f, b, n in rows[:top]:
        print(f"{g:<64}{t*1e3:>8.1f}{s*1e3:>8.1f}"
              f"{f/t/1e12 if t else 0:>6.1f}{b/t/2**30 if t else 0:>7.0f}")


def main():
    enable_compile_cache()
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/vqattack_profile")
    run, meta = build_runner()
    print(f"config: {meta}")
    key = jax.random.key(0)
    # compile + warm up outside the trace
    out = run(key)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
    import time

    t0 = time.perf_counter()
    out = run(jax.random.key(1))
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
    wall = time.perf_counter() - t0
    print(f"warm wall for one {meta['iters']}-iter scan: {wall*1e3:.1f} ms")
    with jax.profiler.trace(trace_dir):
        out = run(jax.random.key(2))
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
    trace_path = newest_trace(trace_dir)
    print(f"trace: {trace_path}")
    busy_us = attribute(trace_path, os.path.join(trace_dir, "ops.csv"))
    roofline_slack(trace_path)
    print(f"\nwall {wall*1e3:.1f} ms vs device busy {busy_us/1e3:.1f} ms "
          f"(gap = dispatch/host)")


if __name__ == "__main__":
    main()
