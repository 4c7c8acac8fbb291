"""On-chip evidence for the scheduled-optimization path.

Runs the PRE 83, 056402 bump-on-tail case on the active backend with a live
merge / remove / split schedule (the reference's particle_optimize path,
src/pic1dp_particle.F90:752-813, schedule shapes src/pic1dp_input.F90:141-206)
so that the only hot-path combination without hardware evidence — compiled
Pallas push_pair -> merge/remove/split -> collect_and_solve — executes on the
real chip.  Records marker counts around every optimization event, the
growth-rate fit, and wall time to a JSON artifact.

Usage: python bench/opt_onchip.py [--out OPT_ONCHIP.json] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.devices()[0].platform
    if backend == "cpu":
        jax.config.update("jax_enable_x64", True)
    else:
        from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    import numpy as np

    from pic1dp_tpu import Simulation
    from pic1dp_tpu.config import (DepositMethod, OptimizationConfig,
                                   bump_on_tail_default)

    dtype = "float64" if backend == "cpu" else "float32"
    n = 2**21 if backend != "cpu" else 2**16
    cfg = bump_on_tail_default(
        nparticle_max=n, time_max=80.0, output_interval=1.0, dtype=dtype,
        verbosity=1,
        optimization=OptimizationConfig(
            tmerge=(50.0, 62.0), thshmerge=(0.05, 0.1),
            tremove=(56.0,), typeremove=2, thshremove=(),
            tsplit=(68.0,), thshsplit=(0.9,),
            split_ngroup=2, split_dv_sig_frac=0.1,
        ))
    sim = Simulation(cfg)
    from pic1dp_tpu.core.step import Stepper

    stepper = sim.stepper if isinstance(sim.stepper, Stepper) else None
    pallas_active = (stepper is not None
                     and str(stepper.deposit_method.value) == "pallas")
    print(f"backend={backend} n={n} pallas_active={pallas_active}",
          file=sys.stderr, flush=True)

    events = []
    orig_step_once = sim.step_once

    def step_once():
        due = sim._optimization_due()
        pre = None
        if any(d is not None for d in due):
            pre = int(np.sum(np.asarray(sim.state.nparticles())))
        orig_step_once()
        if pre is not None:
            post = int(np.sum(np.asarray(sim.state.nparticles())))
            events.append({
                "time": round(sim.time, 6),
                "ops": [name for name, d in
                        zip(("merge", "remove", "split"), due)
                        if d is not None],
                "n_before": pre, "n_after": post})
            print(f"opt event t={sim.time:.2f} {events[-1]['ops']} "
                  f"{pre} -> {post}", file=sys.stderr, flush=True)

    sim.step_once = step_once

    snaps = []
    t0 = time.perf_counter()
    sim.run(snapshot_callback=snaps.append)
    wall = time.perf_counter() - t0

    t = np.array([s["time"] for s in snaps])
    e = np.array([s["field_energy"] for s in snaps])
    m = (t >= 25.0) & (t <= 48.0)
    gamma = float(np.polyfit(t[m], np.log(e[m]), 1)[0] / 2.0)

    result = {
        "backend": backend, "device": jax.devices()[0].device_kind,
        "pallas_active": pallas_active, "n_markers": n, "dtype": dtype,
        "events": events, "gamma_linear_window": gamma,
        "gamma_theory": 0.0838311, "final_field_energy": float(e[-1]),
        "all_finite": bool(np.all(np.isfinite(e))), "wall_s": round(wall, 1),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)
    ok = (len(events) == 4 and np.all(np.isfinite(e))
          and abs(gamma - 0.0838311) / 0.0838311 < 0.1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
