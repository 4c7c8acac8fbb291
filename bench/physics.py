"""Physics-accuracy benchmark: regenerable growth-rate artifact.

Runs the three BASELINE.md verification cases — linear Landau damping,
the PRE 83, 056402 bump-on-tail headline case, and the nonlinear two-stream
instability — on whatever backend is active, fits the field-energy growth
rate exactly as the reference's tools/runinfo.py does (gamma = energy-fit/2,
reference tools/runinfo.py:114-122), and compares against the kinetic
dispersion root (tools/dispersion.py:130-157 methodology).

Emits one JSON line per case:
    {"case": ..., "gamma_sim": ..., "gamma_theory": ..., "rel_err": ...,
     "dtype": ..., "bf16_weights": ..., "backend": ..., "n_markers": ...}
and, with --out FILE, the combined list as a JSON artifact (the committed
PHYSICS_r{N}.json files), so accuracy claims are regenerable with one
command instead of living in PARITY.md prose.

On non-CPU backends the bump-on-tail and two-stream cases are additionally
run with bf16_weights=True (the reduced-precision p/w1 stream,
docs/performance.md) to measure the on-chip gamma error budget of that mode.

Usage:
    python bench/physics.py [--out PHYSICS.json] [--cpu] [--no-bf16]
Env: PIC1DP_PHYSICS_N_BOT / _N_TS / _N_LANDAU override marker counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _fit_gamma(t, e, window, peaks_only=False):
    import numpy as np

    lo, hi = window
    if peaks_only:
        idx = [i for i in range(1, len(e) - 1)
               if e[i] > e[i - 1] and e[i] > e[i + 1] and lo <= t[i] <= hi]
    else:
        idx = [i for i in range(len(e)) if lo <= t[i] <= hi and e[i] > 0]
    return float(np.polyfit(t[idx], np.log(e[idx]), 1)[0] / 2.0)


def _run_case(cfg, theory_gamma: float, window, peaks_only=False):
    import numpy as np

    from pic1dp_tpu import Simulation

    snaps = []
    t0 = time.perf_counter()
    Simulation(cfg).run(snapshot_callback=snaps.append)
    wall = time.perf_counter() - t0
    t = np.array([s["time"] for s in snaps])
    e = np.array([s["field_energy"] for s in snaps])
    gamma = _fit_gamma(t, e, window, peaks_only)
    return gamma, abs(gamma - theory_gamma) / abs(theory_gamma), wall


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", type=str, default=None,
                    help="write the combined JSON artifact here")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--no-bf16", action="store_true",
                    help="skip the bf16_weights error-budget variants")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.devices()[0].platform
    on_cpu = backend == "cpu"
    if on_cpu:
        jax.config.update("jax_enable_x64", True)
    else:
        from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    import numpy as np

    from pic1dp_tpu.analysis.dispersion import Dispersion, species_for_config
    from pic1dp_tpu.config import (bump_on_tail_default, landau_damping,
                                   two_stream)

    dtype = "float64" if on_cpu else "float32"
    log(f"backend: {backend}  dtype: {dtype}")
    results = []

    def record(case, cfg, gamma_theory, window, peaks_only=False):
        gamma, rel, wall = _run_case(cfg, gamma_theory, window, peaks_only)
        row = {"case": case, "gamma_sim": gamma, "gamma_theory": gamma_theory,
               "rel_err": rel, "dtype": cfg.dtype,
               "bf16_weights": cfg.bf16_weights, "backend": backend,
               "n_markers": cfg.nparticle_max, "wall_s": round(wall, 2)}
        results.append(row)
        print(json.dumps(row), flush=True)
        return row

    import dataclasses

    # --- case 1: linear Landau damping (BASELINE.md config 2) ------------
    n_lan = int(float(os.environ.get("PIC1DP_PHYSICS_N_LANDAU", 102_400)))
    n_lan = (n_lan + 2047) // 2048 * 2048
    cfg = landau_damping(nx=64, nparticle=n_lan, k=0.5, amp=1e-4,
                         time_max=20.0, output_interval=0.1, dtype=dtype,
                         verbosity=0)
    om = Dispersion(species_for_config(cfg), 0.5).solve_omega()
    log(f"landau theory: omega = {om:.6g}")
    record("landau_damping_k0.5", cfg, om.imag, (1.0, 15.0), peaks_only=True)

    # --- case 2: PRE 83, 056402 bump-on-tail headline case ----------------
    n_bot = int(float(os.environ.get(
        "PIC1DP_PHYSICS_N_BOT", 6_400_000 if not on_cpu else 1_000_000)))
    n_bot = (n_bot + 2047) // 2048 * 2048
    t_end = 100.0
    cfg = bump_on_tail_default(nparticle_max=n_bot, time_max=t_end,
                               output_interval=1.0, dtype=dtype, verbosity=0)
    k = 2.0 * np.pi / cfg.lx
    om = Dispersion(species_for_config(cfg), k).solve_omega()
    log(f"bump-on-tail theory: k = {k:.4f}, omega = {om:.6g}")
    window = (25.0, min(t_end * 0.85, 70.0))
    record("bump_on_tail_pre83", cfg, om.imag, window)
    if not (on_cpu or args.no_bf16):
        record("bump_on_tail_pre83_bf16", dataclasses.replace(
            cfg, bf16_weights=True), om.imag, window)

    # --- case 3: nonlinear two-stream (BASELINE.md config 3) --------------
    n_ts = int(float(os.environ.get("PIC1DP_PHYSICS_N_TS", 1_000_000)))
    n_ts = (n_ts + 2047) // 2048 * 2048
    cfg = two_stream(nparticle=n_ts, time_max=60.0, dtype=dtype,
                     output_interval=0.5, verbosity=0)
    disp = Dispersion(species_for_config(cfg), 0.2)
    disp._guesses = [0.01 + 0.3j, 0.02 + 0.5j, 0.05 + 0.4j]
    om = disp.solve_omega()
    log(f"two-stream theory: omega = {om:.6g}")
    record("two_stream_k0.2", cfg, om.imag, (15.0, 35.0))
    if not (on_cpu or args.no_bf16):
        record("two_stream_k0.2_bf16", dataclasses.replace(
            cfg, bf16_weights=True), om.imag, (15.0, 35.0))

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        log(f"wrote {args.out}")

    worst = max(r["rel_err"] for r in results if not r["bf16_weights"])
    log(f"worst f32/f64 rel_err: {worst:.2%}")
    return 0 if worst < 0.10 else 1


if __name__ == "__main__":
    sys.exit(main())
