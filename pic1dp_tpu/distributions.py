"""Equilibrium velocity-distribution library.

The reference spreads each equilibrium's math over three places that must stay
consistent: marker loading (reference src/pic1dp_particle.F90:182-218), the
delta-f weight push term -f0'/f0 (reference src/pic1dp_interaction.F90:274-326),
and the full-f diagnostic subtraction (reference src/pic1dp_output.F90:371-452).
Here each equilibrium is ONE object with three methods:

    f0(v)              the equilibrium distribution function (per unit v,
                       integrates to `density` over v, except bump-on-tail
                       which integrates to 1 with `density` the core fraction)
    minus_dlnf0_dv(v)  -d(ln f0)/dv = -f0'(v)/f0(v), used by the weight push
    energy(lx)         equilibrium kinetic energy integral lx * int v^2 f0 dv
                       (used by full-f perturbed-energy diagnostics,
                       reference src/pic1dp_output.F90:157-170)

All methods are vectorized over a stacked species axis: the species parameter
arrays have shape (nspecies, 1) and v has shape (nspecies, nparticle), so a
single call covers every species (the reference loops over species instead).

Note: the reference's full-f diagnostic subtraction drops a sqrt() on the
thermal-velocity normalization when T/m != 1 (e.g. src/pic1dp_output.F90:413-414
divides by 2*pi^(1/2)*T/m instead of sqrt(2*pi*T/m)).  We use the correct f0
here; for the default T=m=1 cases the two agree exactly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from pic1dp_tpu.config import Config, Equilibrium

_SQRT2PI = math.sqrt(2.0 * math.pi)


class SpeciesParams(NamedTuple):
    """Species parameters stacked to (nspecies, 1) arrays for broadcasting."""

    charge: jnp.ndarray
    mass: jnp.ndarray
    temperature: jnp.ndarray
    temperature2: jnp.ndarray
    density: jnp.ndarray
    v0: jnp.ndarray

    @classmethod
    def from_config(cls, cfg: Config, dtype=None) -> "SpeciesParams":
        dtype = dtype or jnp.dtype(cfg.dtype)
        col = lambda attr: jnp.asarray(
            [[getattr(s, attr)] for s in cfg.species], dtype=dtype
        )
        return cls(
            charge=col("charge"),
            mass=col("mass"),
            temperature=col("temperature"),
            temperature2=col("temperature2"),
            density=col("density"),
            v0=col("v0"),
        )


def _gauss(v, vth2):
    """exp(-v^2 / (2 vth2)) / sqrt(2 pi vth2)."""
    return jnp.exp(-v * v / (2.0 * vth2)) / jnp.sqrt(2.0 * jnp.pi * vth2)


def f0(eq: Equilibrium, sp: SpeciesParams, v: jnp.ndarray) -> jnp.ndarray:
    """Equilibrium distribution f0(v), stacked over species.

    Formulas per reference src/pic1dp_input.F90:49-54 and the loader weights
    src/pic1dp_particle.F90:182-218.
    """
    vth2 = sp.temperature / sp.mass
    if eq == Equilibrium.MAXWELLIAN:
        return sp.density * _gauss(v - sp.v0, vth2)
    if eq == Equilibrium.TWO_STREAM1:
        # f(v) = n * v^2 exp(-v^2/2) / sqrt(2 pi); T, v0 unused (reference :51, :64)
        return sp.density * v * v * jnp.exp(-v * v / 2.0) / _SQRT2PI
    if eq == Equilibrium.TWO_STREAM2:
        # f(v) = n/2 * (fm(v - v0) + fm(v + v0)) (reference :52)
        return 0.5 * sp.density * (_gauss(v - sp.v0, vth2) + _gauss(v + sp.v0, vth2))
    if eq == Equilibrium.BUMP_ON_TAIL:
        # f(v) = n fm(v; T) + (1 - n) fm(v - v0; T2) (reference :53)
        vth2b = sp.temperature2 / sp.mass
        return sp.density * _gauss(v, vth2) + (1.0 - sp.density) * _gauss(
            v - sp.v0, vth2b
        )
    raise ValueError(f"unknown equilibrium {eq}")


def minus_dlnf0_dv(eq: Equilibrium, sp: SpeciesParams, v: jnp.ndarray) -> jnp.ndarray:
    """-f0'(v)/f0(v), the delta-f weight-equation kernel
    (reference src/pic1dp_interaction.F90:274-326)."""
    vth2 = sp.temperature / sp.mass
    if eq == Equilibrium.MAXWELLIAN:
        return (v - sp.v0) / vth2                        # reference :322-326
    if eq == Equilibrium.TWO_STREAM1:
        return v - 2.0 / v                               # reference :276
    if eq == Equilibrium.TWO_STREAM2:
        # weighted mean of the two beams' Maxwellian terms (reference :277-292)
        ep = jnp.exp(-(v + sp.v0) ** 2 / (2.0 * vth2))
        em = jnp.exp(-(v - sp.v0) ** 2 / (2.0 * vth2))
        return ((v + sp.v0) * ep + (v - sp.v0) * em) / ((ep + em) * vth2)
    if eq == Equilibrium.BUMP_ON_TAIL:
        # core + beam weighted mean (reference :293-321)
        vth2b = sp.temperature2 / sp.mass
        core = sp.density * jnp.exp(-v * v / (2.0 * vth2)) / jnp.sqrt(vth2)
        beam = (
            (1.0 - sp.density)
            * jnp.exp(-(v - sp.v0) ** 2 / (2.0 * vth2b))
            / jnp.sqrt(vth2b)
        )
        return (core * v / vth2 + beam * (v - sp.v0) / vth2b) / (core + beam)
    raise ValueError(f"unknown equilibrium {eq}")


def loader_weight_uniform(
    eq: Equilibrium, sp: SpeciesParams, v: jnp.ndarray, lx: float, v_max: float,
    nparticle_init: jnp.ndarray,
) -> jnp.ndarray:
    """Marker weight p = f0(v) * lx * 2 v_max / N for uniform-in-v loading
    (g = N / (lx * 2 v_max)), reference src/pic1dp_particle.F90:179-218.

    `nparticle_init` has shape (nspecies, 1).
    """
    return f0(eq, sp, v) * (lx * 2.0 * v_max) / nparticle_init


def equilibrium_energy(eq: Equilibrium, sp: SpeciesParams, lx: float) -> jnp.ndarray:
    """lx * int v^2 f0(v) dv per species, shape (nspecies, 1).

    Used to convert full-f total kinetic energy into perturbed energy
    (reference src/pic1dp_output.F90:157-170 implements only two of the four
    cases and leaves two-stream2 / bump-on-tail as TODO comments; here all
    four are provided analytically).
    """
    vth2 = sp.temperature / sp.mass
    if eq == Equilibrium.MAXWELLIAN:
        # int v^2 fm = vth2 + v0^2
        return (vth2 + sp.v0**2) * sp.density * lx
    if eq == Equilibrium.TWO_STREAM1:
        # int v^2 * v^2 exp(-v^2/2)/sqrt(2 pi) dv = 3
        return 3.0 * sp.density * lx
    if eq == Equilibrium.TWO_STREAM2:
        return (vth2 + sp.v0**2) * sp.density * lx
    if eq == Equilibrium.BUMP_ON_TAIL:
        vth2b = sp.temperature2 / sp.mass
        return (sp.density * vth2 + (1.0 - sp.density) * (vth2b + sp.v0**2)) * lx
    raise ValueError(f"unknown equilibrium {eq}")
