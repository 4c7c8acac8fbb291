"""Assemble WEAKSCALING_r{N}.json (VERDICT round-2 item 7).

Combines three measurement sets into one committed artifact:

  1. virtual-CPU mesh rows (1, 2, 4, 8 devices, fixed per-device load) —
     validates the sharded compile/execute path end-to-end.  The virtual
     devices share host cores, so per-device rate falls ~1/n by
     construction; the meaningful plumbing number is TOTAL throughput,
     which stays flat as devices (and total work) scale.
  2. an equal-total-work single-device CPU row — the sharded 8-device run
     vs one device doing the same total work isolates the sharding
     overhead (shard_map + 2 psums) from batch-size effects.
  3. the single-chip hardware row (bench.py headline), the per-device
     rate an ICI mesh would weak-scale from.

The communication cost model (pinned at the HLO level by
tests/test_parallel.py::test_sharded_step_communicates_only_mode_scalars):
per step the sharded RK2 exchanges exactly TWO psums of (2, nmode) f32
scalars — 16*nmode bytes per device per step, independent of marker count
and grid size.  At nmode=1 that is 32 B against ~6.6 ms of compute per
2^26-marker device: even at 1 us/psum of pure ICI latency the predicted
weak-scaling efficiency is > 99.9%, and there is no bandwidth term at all
(the reference Allreduces nx words).

Usage: python bench/weak_scaling_artifact.py --out WEAKSCALING_r03.json
       [--tpu-rate PUSHES_PER_S]   (skip re-running bench.py on chip)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_ws(env_extra):
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "weak_scaling.py")],
        capture_output=True, text=True, env=env, timeout=3600, check=True)
    return [json.loads(line) for line in out.stdout.splitlines()
            if line.startswith("{")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tpu-rate", type=float, default=None,
                    help="single-chip pushes/s (skips running bench.py)")
    ap.add_argument("--nper", type=int, default=262144)
    args = ap.parse_args()

    rows = {"virtual_cpu_mesh": run_ws({
        "PIC1DP_WS_CPU": "1", "PIC1DP_WS_NPER": str(args.nper)})}
    rows["equal_work_single_device"] = run_ws({
        "PIC1DP_WS_CPU": "1", "PIC1DP_WS_NPER": str(args.nper * 8),
        "PIC1DP_WS_DEVICES": "1"})

    cpu = [r for r in rows["virtual_cpu_mesh"]
           if r["metric"] == "weak_scaling_pushes_per_sec"]
    total_1 = cpu[0]["value"]
    total_8 = cpu[-1]["value"]
    single_eq = rows["equal_work_single_device"][0]["value"]

    if args.tpu_rate is None:
        env = dict(os.environ, PIC1DP_BENCH_SECONDARY="0")
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, env=env,
                             timeout=3600, check=True)
        args.tpu_rate = json.loads(out.stdout.splitlines()[-1])["value"]

    artifact = {
        "comm_cost_model": (
            "2 psums of (2, nmode) f32 scalars per RK2 step = 16*nmode B "
            "per device per step, independent of markers and nx (HLO-pinned "
            "by tests/test_parallel.py::"
            "test_sharded_step_communicates_only_mode_scalars); no "
            "bandwidth term, latency-only -> predicted ICI weak-scaling "
            "efficiency > 99.9% at 2^26 markers/device"),
        "hardware_single_chip_pushes_per_sec": args.tpu_rate,
        "virtual_cpu_rows": rows["virtual_cpu_mesh"],
        "equal_work_single_device_row": rows["equal_work_single_device"],
        "plumbing": {
            "total_rate_1dev": total_1,
            "total_rate_8dev_8x_work": total_8,
            "total_rate_flatness_8x_work": total_8 / total_1,
            "sharded_8dev_vs_single_dev_equal_work": total_8 / single_eq,
            "note": (
                "virtual CPU devices share host cores, so per-device rate "
                "falls ~1/n by construction; flat TOTAL rate at 8x work = "
                "the sharded path adds no serial bottleneck, and the "
                "equal-work ratio bounds shard_map+psum overhead"),
        },
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({"metric": "weak_scaling_artifact", "out": args.out,
                      "total_rate_flatness": total_8 / total_1,
                      "equal_work_ratio": total_8 / single_eq}))


if __name__ == "__main__":
    main()
