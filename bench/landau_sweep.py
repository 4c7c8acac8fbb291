"""Bisect the Landau damping-rate error: sampling noise vs systematic bias.

PHYSICS_r03 measured gamma 1.28% off theory at 2^22 markers where pure
1/sqrt(N) noise extrapolated from the 102k-marker round-2 point predicts
~0.3% — so something systematic (dt, grid resolution, fit window) or an
unlucky seed is in play.  This sweep runs the k=0.5 Landau case across

  * marker count x seed  (noise scaling + seed scatter),
  * dt 0.05 -> 0.025     (RK2 discretization bias),
  * nx 64 -> 256         (hat-interpolation / grid shape-factor bias),

and prints one JSON line per run.  Usage: python bench/landau_sweep.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpu = "--cpu" in sys.argv

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    if not cpu:
        from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()

    from pic1dp_tpu import Simulation
    from pic1dp_tpu.analysis.dispersion import Dispersion, species_for_config
    from pic1dp_tpu.config import landau_damping

    def gamma_for(cfg):
        snaps = []
        t0 = time.perf_counter()
        Simulation(cfg).run(snapshot_callback=snaps.append)
        wall = time.perf_counter() - t0
        t = np.array([s["time"] for s in snaps])
        e = np.array([s["field_energy"] for s in snaps])
        pk = [i for i in range(1, len(e) - 1)
              if e[i] > e[i - 1] and e[i] > e[i + 1] and 1.0 <= t[i] <= 15.0]
        return float(np.polyfit(t[pk], np.log(e[pk]), 1)[0] / 2.0), wall

    base = landau_damping(nx=64, nparticle=2**22, k=0.5, amp=1e-4,
                          time_max=20.0, output_interval=0.1,
                          dtype="float64" if cpu else "float32", verbosity=0)
    th = Dispersion(species_for_config(base), 0.5).solve_omega().imag
    print(json.dumps({"theory_gamma": th}), flush=True)

    def run(tag, cfg):
        g, wall = gamma_for(cfg)
        print(json.dumps({
            "tag": tag, "gamma": g, "rel_err": abs(g - th) / abs(th),
            "n": cfg.nparticle_max, "dt": cfg.dt, "nx": cfg.nx,
            "seed": cfg.rng.seed, "wall_s": round(wall, 1)}), flush=True)

    # noise scaling + seed scatter (2^22 first: its programs are already in
    # the compile cache from bench/physics.py, so a wedged remote compile
    # can't stall the whole sweep at the front)
    for n in (2**22, 2**20, 2**24):
        for seed in (0, 1, 2):
            rng = dataclasses.replace(base.rng, seed=seed)
            run("noise", dataclasses.replace(base, nparticle_max=n, rng=rng))
    # dt bias at fixed n/seed
    run("dt", dataclasses.replace(base, dt=0.025))
    # grid bias at fixed n/seed
    run("nx", dataclasses.replace(base, nx=256))
    # both finer
    run("dt+nx", dataclasses.replace(base, dt=0.025, nx=256))


if __name__ == "__main__":
    main()
