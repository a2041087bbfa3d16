"""Write docs/SWEEP256_VLMO_r05.json from the round-5 warm VLMo sweep log.

One-shot round-5 bookkeeping: parses the final JSON summary line the sweep
prints (run.py end-of-sweep), attaches the cold-run comparison and the
end-to-end ratios against docs/REFSTYLE_E2E.json's vlmo row, and records
protocol facts a reader needs (fused block programs + matmul patchify in
the measured tree; warm persistent compile cache).

Usage: python scripts/write_vlmo_sweep_artifact.py <warm_log> [cold_log]
"""

from __future__ import annotations

import json
import os
import sys


def summary_of(log_path: str) -> dict:
    last = None
    with open(log_path) as f:
        for ln in f:
            ln = ln.strip()
            if ln.startswith("{") and "mean_attack_s" in ln:
                last = ln
    if last is None:
        raise SystemExit(f"no sweep summary JSON line in {log_path}")
    return json.loads(last)


def main() -> None:
    warm = summary_of(sys.argv[1])
    cold = summary_of(sys.argv[2]) if len(sys.argv) > 2 else None
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "docs", "REFSTYLE_E2E.json")) as f:
        e2e = json.load(f)["vlmo"]

    mean = warm["mean_attack_s"]
    out = {
        "description": (
            "256-sample realistic synthetic sweep, VLMo pipeline, production "
            "CLI end-to-end on the chip (round 5: FUSED block programs + "
            "dynamic PGD + matmul patchify, pipeline-depth 4, warm persistent "
            "compile cache)"
        ),
        "command": (
            "VQATTACK_PHASE_TIMING=1 python -m vqattack_tpu.run --pipeline "
            "vlmo --limit 256 --batch-size 16 --dtype bfloat16 --no-remat "
            "--softmax-dtype bfloat16 --dynamic-pgd "
            "[arrow/id2answer/side-table flags]"
        ),
        "device": "TPU v5 lite (tunneled relay runtime)",
        "samples": warm["samples"],
        "attack_accuracy": warm["attack_accuracy"],
        "attack_accuracy_note": warm["attack_accuracy_note"],
        "mean_attack_s": mean,
        "bucket_occupancy": warm["bucket_occupancy"],
        "phase_s": warm["phase_s"],
        "vs_r4_unfused_sweep": {
            "mean_attack_s": f"{mean:.2f} vs 3.92 (docs/SWEEP256_VLMO.json)",
        },
        "e2e_ratio": {
            "reference_s_per_pair": e2e["s_per_pair"],
            "vs_reference_style_e2e": round(e2e["s_per_pair"] / mean, 2),
            "vs_reference_style_e2e_floor": round(
                e2e["s_per_pair_floor"] / mean, 2
            ),
            "note": (
                "reference shape pays 7.18 s/pair of reload churn "
                "(vlmo_module.py:2064,2087 rebuilds the model every 10 "
                "samples); the floor ratio subtracts gate AND reload "
                "entirely from the baseline"
            ),
        },
        "protocol_note": (
            "phase_s timers overlap under --pipeline-depth 4 (async bucket "
            "pipelining): their sum exceeds process wall"
        ),
    }
    if cold is not None:
        out["cold_process_run"] = {
            "mean_attack_s": cold["mean_attack_s"],
            "note": (
                "same command on an empty persistent compile cache: "
                "fused-lattice XLA compiles through the remote relay are "
                "charged to the phase timers; quoted headline is the warm "
                "run (every production deployment after its first process)"
            ),
        }
    path = os.path.join(root, "docs", "SWEEP256_VLMO_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(path)
    print(json.dumps({k: out[k] for k in ("mean_attack_s", "e2e_ratio")}, indent=1))


if __name__ == "__main__":
    main()
