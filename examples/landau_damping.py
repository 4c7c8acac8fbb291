"""Linear Landau damping verification case (BASELINE.md config 2): a k=0.5
Maxwellian plasma; the field-amplitude damping rate must match the kinetic
dispersion root omega = 1.4157 - 0.1534i to ~1%.

Usage:  python examples/landau_damping.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pic1dp_tpu import Simulation
from pic1dp_tpu.analysis.dispersion import Dispersion, species_for_config
from pic1dp_tpu.config import landau_damping


def main() -> int:
    cfg = landau_damping(nx=64, nparticle=102_400, k=0.5, amp=1e-4,
                         time_max=20.0, output_interval=0.1, verbosity=1)
    omega = Dispersion(species_for_config(cfg), 0.5).solve_omega()
    print(f"dispersion theory: omega = {omega:.6g}")

    snaps = []
    Simulation(cfg).run(snapshot_callback=snaps.append)
    t = np.array([s["time"] for s in snaps])
    e = np.array([s["field_energy"] for s in snaps])
    # fit through the oscillation peaks of the damped field energy
    pk = [i for i in range(1, len(e) - 1)
          if e[i] > e[i - 1] and e[i] > e[i + 1] and 1.0 <= t[i] <= 15.0]
    gamma = np.polyfit(t[pk], np.log(e[pk]), 1)[0] / 2.0
    rel = abs(gamma - omega.imag) / abs(omega.imag)
    print(f"simulated gamma = {gamma:.5f}  (theory {omega.imag:.5f}, "
          f"rel. err {rel:.2%})")
    return 0 if rel < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
