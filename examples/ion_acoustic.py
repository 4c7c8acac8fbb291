"""Ion-acoustic wave Landau damping: electrons + heavy ions (two species).

A physics regime beyond the reference's demonstrated cases, fully supported
by its nspecies surface (src/pic1dp_input.F90:57-72): two species with
different charge SIGN, mass, and temperature.  The quasineutral ion-acoustic
wave (omega ~ k*cs with cs = sqrt(Te/mi)) is Landau-damped on both species;
the kinetic dispersion root comes from the same Z-function oracle as every
other case (analysis/dispersion.py).

Parameters: m_i = 25, T_i/T_e = 0.05, k = 0.5 -> omega = 0.09843 - 0.00774j
(in electron omega_pe / lambda_De units).  PHYSICAL (per-species Gaussian)
marker loading — uniform-v loading would spread ion markers over ~180 ion
thermal widths.  The seed amplitude matters: 3e-3 shallows the measured
damping by ~24% through ion trapping (omega_b/gamma ~ 0.27) — a real
nonlinear effect; 3e-4 keeps the run linear (measured scans in
PHYSICS_r05.json ion_acoustic_k0.5_mi25).

Usage:  python examples/ion_acoustic.py   (TPU: ~2 min; CPU: very slow —
        6400 steps of a slow wave)
Env:    PIC1DP_EX_N (markers/species, default 2^22), PIC1DP_EX_TMAX (320).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pic1dp_tpu import Simulation
from pic1dp_tpu.analysis.dispersion import (Dispersion, fit_mode_omega,
                                            species_for_config)
from pic1dp_tpu.config import (Config, Equilibrium, MarkerLoading,
                               SpeciesConfig)


def main() -> int:
    n = int(float(os.environ.get("PIC1DP_EX_N", 2**22)))
    n = (n + 1023) // 1024 * 1024
    tmax = float(os.environ.get("PIC1DP_EX_TMAX", 320.0))

    import jax

    dtype = "float32" if jax.devices()[0].platform != "cpu" else "float64"
    k = 0.5
    cfg = Config(
        linear=False, deltaf=True, lx=2.0 * math.pi / k,
        equilibrium=Equilibrium.MAXWELLIAN,
        species=(SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.0,
                               density=1.0, v0=0.0),
                 SpeciesConfig(charge=1.0, mass=25.0, temperature=0.05,
                               density=1.0, v0=0.0)),
        nx=64, nparticle_max=n, time_max=tmax, dt=0.05,
        marker=MarkerLoading.PHYSICAL, v_max=8.0,
        modes=(1,), init_modes=(1,), init_amp_cos=(0.0,),
        init_amp_sin=(3e-4,), output_interval=1.0, verbosity=1,
        dtype=dtype).validate()

    d = Dispersion(species_for_config(cfg), k)
    d._guesses = [0.098 - 0.008j, 0.118 - 0.010j, 0.078 - 0.006j]
    om = d.solve_omega()
    print(f"kinetic theory: omega = {om.real:.5f}, gamma = {om.imag:.5f}")

    snaps = []
    Simulation(cfg).run(snapshot_callback=snaps.append)

    t = np.array([s["time"] for s in snaps])
    zre = np.stack([s["mode_re"] for s in snaps], axis=1)
    zim = np.stack([s["mode_im"] for s in snaps], axis=1)
    # window past the Langmuir-branch ringdown (damped by t ~ 40)
    fit = fit_mode_omega(t, zre[0], zim[0], window=(60.0, min(300.0, tmax)))
    om_err = abs(fit.real - abs(om.real)) / abs(om.real)
    g_err = abs(fit.imag - om.imag) / abs(om.imag)
    print(f"measured:       omega = {fit.real:.5f} ({om_err:.2%}), "
          f"gamma = {fit.imag:.5f} ({g_err:.2%})")
    ok = om_err < 0.02 and g_err < 0.08
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
