"""Fused gather->push->deposit Pallas TPU kernel for one RK substep.

The matrix-free spectral formulation (ops/spectral.py) makes the whole
substep pure elementwise work plus tiny reductions, but under plain XLA the
trig/weight intermediates (6+ arrays of N floats per mode) round-trip through
HBM because they have multiple consumers.  This kernel runs the entire
substep — kept-mode E gather at the current positions, the reference's push
ordering (x, then w with the analytic -f0'/f0, then v; reference
src/pic1dp_interaction.F90:238-339), and the mode-projection deposit at the
new positions — in one pass with every intermediate living in VMEM/registers.
HBM traffic is exactly the particle state streams:

    substep 1:  read x, v, p, w          write x', v', w'     (7 N floats)
    substep 2:  read x, v, p, w + the step-start backups x0, v0, w0
                                         write x', v', w'     (10 N floats)

plus a (2*nmode, 8, 128) VMEM tile of mode-projection partials accumulated
across the sequential grid (tile-wise vector adds in-kernel; the final
cross-lane reduction to (2, nmode) scalars happens once, outside).  Dead
markers carry p = w = 0 (core/state.py invariant), so no live mask is
streamed.

Static configuration (lx, nx, modes, dt, equilibrium, per-species scalars) is
baked into the kernel closure — one pallas_call per (species, substep), which
keeps the physics functions in distributions.py shared verbatim with the XLA
paths.

Particle blocks are (R, 128) tiles of the per-species (N/128, 128)-reshaped
arrays; R is the largest divisor of N/128 up to `max_rows`.  Capacity N must
be a multiple of 128 (pad nparticle_max; nparticle_init is unaffected).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pic1dp_tpu import distributions as dist
from pic1dp_tpu.config import Config
from pic1dp_tpu.ops.interp import wrap_x


class _ScalarSpecies:
    """SpeciesParams-compatible view with baked python-float fields, so the
    shared physics functions (distributions.py) run unchanged in-kernel."""

    def __init__(self, cfg: Config, s: int):
        sc = cfg.species[s]
        self.charge = sc.charge
        self.mass = sc.mass
        self.temperature = sc.temperature
        self.temperature2 = sc.temperature2
        self.density = sc.density
        self.v0 = sc.v0


def _largest_divisor(n: int, limit: int) -> int:
    """Largest divisor of n that is a multiple of 8 (f32 sublane tile) and
    <= limit; n itself must be a multiple of 8."""
    for r in range(min(n, limit) // 8 * 8, 0, -8):
        if n % r == 0:
            return r
    return 8


def _fast_wrap(x, lx: float):
    """Periodic wrap via x - lx*floor(x/lx) with a static reciprocal —
    division-free (VPU divisions are ~8x slower than multiplies).  The
    reciprocal rounding can land 1 ulp outside [0, lx); the selects fix it."""
    y = x - lx * jnp.floor(x * (1.0 / lx))
    return jnp.where(y >= lx, y - lx, jnp.where(y < 0.0, y + lx, y))


def _minus_dlnf0_dv_fast(eq, sp, v):
    """distributions.minus_dlnf0_dv with static python-float species
    parameters algebraically folded so at most ONE division survives
    (the weighted-mean ratio); bitwise-equal where no division is saved."""
    from pic1dp_tpu.config import Equilibrium

    vth2 = sp.temperature / sp.mass
    inv_vth2 = 1.0 / vth2
    if eq == Equilibrium.MAXWELLIAN:
        return (v - sp.v0) * inv_vth2
    if eq == Equilibrium.TWO_STREAM1:
        return v - 2.0 / v
    if eq == Equilibrium.TWO_STREAM2:
        ep = jnp.exp(-(v + sp.v0) ** 2 * (0.5 * inv_vth2))
        em = jnp.exp(-(v - sp.v0) ** 2 * (0.5 * inv_vth2))
        return ((v + sp.v0) * ep + (v - sp.v0) * em) * inv_vth2 / (ep + em)
    if eq == Equilibrium.BUMP_ON_TAIL:
        vth2b = sp.temperature2 / sp.mass
        inv_vth2b = 1.0 / vth2b
        c_core = sp.density / math.sqrt(vth2)
        c_beam = (1.0 - sp.density) / math.sqrt(vth2b)
        core = c_core * jnp.exp(-v * v * (0.5 * inv_vth2))
        beam = c_beam * jnp.exp(-(v - sp.v0) ** 2 * (0.5 * inv_vth2b))
        return (core * v * inv_vth2 + beam * (v - sp.v0) * inv_vth2b) \
            / (core + beam)
    raise ValueError(f"unknown equilibrium {eq}")


def _trig_block(x, lx, nx: int, modes, dtype):
    """mode_trig specialized for in-kernel blocks (same math as
    ops/spectral.mode_trig)."""
    s = x * (nx / lx)
    ix0 = jnp.floor(s)
    frac = s - ix0
    ix0 = jnp.clip(ix0, 0.0, float(nx - 1))
    w0, w1 = 1.0 - frac, frac
    out = []
    for m in modes:
        step = 2.0 * np.pi * m / nx
        theta0 = ix0 * jnp.asarray(step, dtype)
        c0 = jnp.cos(theta0)
        s0 = jnp.sin(theta0)
        c1 = c0 * np.cos(step) - s0 * np.sin(step)
        s1 = s0 * np.cos(step) + c0 * np.sin(step)
        out.append((c0, s0, c1, s1))
    return w0, w1, out


def make_substep_call(cfg: Config, s: int, dt_frac: float, with_backups: bool,
                      n: int, *, max_rows: int = 256, interpret: bool = False,
                      axis_name: str | None = None):
    """Build the fused substep for species `s`.

    Returns fn(x, v, p, w[, x0, v0, w0], mode_re, mode_im)
         -> (x', v', w', proj) with proj (2, nmode) raw mode projections
    of the species' charge-weighted deposit (spectral.project_modes
    semantics).  All particle arrays are (n,) flat for this species.
    """
    if n % 1024:
        raise ValueError(
            f"pallas hot path needs nparticle_max % 1024 == 0, got {n} "
            "(round the capacity up; nparticle_init may stay as is)")
    nrows = n // 128
    rows = _largest_divisor(nrows, max_rows)
    nblocks = nrows // rows
    dtype = jnp.dtype(cfg.dtype)
    nmode = len(cfg.modes)
    sp = _ScalarSpecies(cfg, s)
    vma = frozenset() if axis_name is None else frozenset({axis_name})
    dt_eff = dt_frac * cfg.dt
    q_over_m = sp.charge / sp.mass
    deposit_scale = sp.charge  # val = charge * (w' | p)

    def kernel(*refs):
        if with_backups:
            (x_ref, v_ref, p_ref, w_ref, xb_ref, vb_ref, wb_ref,
             mre_ref, mim_ref, xo_ref, vo_ref, wo_ref, proj_ref) = refs
        else:
            (x_ref, v_ref, p_ref, w_ref, mre_ref, mim_ref,
             xo_ref, vo_ref, wo_ref, proj_ref) = refs
            xb_ref, vb_ref, wb_ref = x_ref, v_ref, w_ref

        x = x_ref[:]
        v = v_ref[:]
        p = p_ref[:]
        w = w_ref[:]

        # -- gather: kept-mode E at the two hat neighbors of x --
        w0, w1, trig = _trig_block(x, cfg.lx, cfg.nx, cfg.modes, dtype)
        e = None
        for i, (c0, s0, c1, s1) in enumerate(trig):
            term = (w0 * c0 + w1 * c1) * mre_ref[0, i] \
                 - (w0 * s0 + w1 * s1) * mim_ref[0, i]
            e = term if e is None else e + term
        e_p = 2.0 * e

        # -- push, reference ordering: x, w, v --
        x_new = _fast_wrap(xb_ref[:] + dt_eff * v, cfg.lx)
        if cfg.deltaf:
            drive = (p * e_p) if cfg.linear else ((p - w) * e_p)
            kern = _minus_dlnf0_dv_fast(cfg.equilibrium, sp, v)
            w_new = wb_ref[:] + (dt_eff * q_over_m) * drive * kern
        else:
            w_new = w
        v_new = v if cfg.linear else vb_ref[:] + (dt_eff * q_over_m) * e_p

        xo_ref[:] = x_new
        vo_ref[:] = v_new
        wo_ref[:] = w_new

        # -- deposit: accumulate raw mode projections of the new positions.
        # Cross-lane scalar reductions per block are slow on the VPU, so the
        # kernel only folds row-tiles ((rows,128) -> (8,128), pure vector
        # adds) into a VMEM accumulator; the final (8,128) -> scalar
        # reduction happens once, outside the kernel. --
        val = (w_new if cfg.deltaf else p) * deposit_scale
        w0d, w1d, trigd = _trig_block(x_new, cfg.lx, cfg.nx, cfg.modes, dtype)

        @pl.when(pl.program_id(0) == 0)
        def _():
            proj_ref[:] = jnp.zeros_like(proj_ref)

        rows = val.shape[0]
        for i, (c0, s0, c1, s1) in enumerate(trigd):
            part_c = jnp.sum((val * (w0d * c0 + w1d * c1))
                             .reshape(rows // 8, 8, 128), axis=0)
            part_s = jnp.sum((val * (w0d * s0 + w1d * s1))
                             .reshape(rows // 8, 8, 128), axis=0)
            proj_ref[2 * i] += part_c
            proj_ref[2 * i + 1] += part_s

    pblock = pl.BlockSpec((rows, 128), lambda b: (b, 0),
                          memory_space=pltpu.VMEM)
    mblock = pl.BlockSpec((1, nmode), lambda b: (0, 0),
                          memory_space=pltpu.SMEM)
    n_part_in = 7 if with_backups else 4
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[pblock] * n_part_in + [mblock, mblock],
        out_specs=(pblock, pblock, pblock,
                   pl.BlockSpec((2 * nmode, 8, 128), lambda b: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # under shard_map every output varies across the particle mesh axis
        # (the proj partials are psum'd by the caller)
        out_shape=(
            jax.ShapeDtypeStruct((nrows, 128), dtype, vma=vma),
            jax.ShapeDtypeStruct((nrows, 128), dtype, vma=vma),
            jax.ShapeDtypeStruct((nrows, 128), dtype, vma=vma),
            jax.ShapeDtypeStruct((2 * nmode, 8, 128), dtype, vma=vma),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * (40 + 30 * nmode),
            bytes_accessed=(n_part_in + 3) * n * dtype.itemsize,
            transcendentals=n * (4 * nmode + 2),
        ),
    )

    def fn(*arrays):
        *particle, mode_re, mode_im = arrays
        blocked = [a.reshape(nrows, 128) for a in particle]
        mre = mode_re.reshape(1, nmode).astype(dtype)
        mim = mode_im.reshape(1, nmode).astype(dtype)
        xo, vo, wo, proj3 = call(*blocked, mre, mim)
        sums = jnp.sum(proj3, axis=(1, 2))          # (2*nmode,)
        proj = jnp.stack([sums[0::2], sums[1::2]])  # (2, nmode): cos; sin
        return (xo.reshape(n), vo.reshape(n), wo.reshape(n), proj)

    return fn


class FusedStepper:
    """Per-config factory of the fused substep callables (both substeps,
    every species), used by core.step.Stepper when the resolved deposit
    method is PALLAS.  Kernels are built lazily per particle-array length:
    under shard_map the per-device shard length (nparticle_max / mesh size)
    is what reaches the kernel, not the global capacity."""

    def __init__(self, cfg: Config, interpret: bool | None = None,
                 axis_name: str | None = None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.cfg = cfg
        self.interpret = interpret
        self.axis_name = axis_name
        self._subs: dict = {}

    def _sub(self, dt_frac: float, with_backups: bool, s: int, n: int):
        key = (dt_frac, with_backups, s, n)
        if key not in self._subs:
            self._subs[key] = make_substep_call(
                self.cfg, s, dt_frac, with_backups, n,
                interpret=self.interpret, axis_name=self.axis_name)
        return self._subs[key]

    def substep1(self, x, v, p, w, mode_re, mode_im):
        """(ns, N) arrays -> (x', v', w', (p_c, p_s)) summed over species."""
        return self._run(0.5, False, (x, v, p, w), mode_re, mode_im)

    def substep2(self, x, v, p, w, x0, v0, w0, mode_re, mode_im):
        return self._run(1.0, True, (x, v, p, w, x0, v0, w0), mode_re, mode_im)

    def _run(self, dt_frac, with_backups, particle_arrays, mode_re, mode_im):
        ns = self.cfg.nspecies
        n = particle_arrays[0].shape[-1]
        if self.axis_name is not None:
            # replicated mode scalars -> varying, so every kernel input
            # carries the same manual-axes set under shard_map
            mode_re = jax.lax.pvary(mode_re, self.axis_name)
            mode_im = jax.lax.pvary(mode_im, self.axis_name)
        outs = []
        for s in range(ns):
            per_species = tuple(a[s] for a in particle_arrays)
            fn = self._sub(dt_frac, with_backups, s, n)
            outs.append(fn(*per_species, mode_re, mode_im))
        x = jnp.stack([o[0] for o in outs])
        v = jnp.stack([o[1] for o in outs])
        w = jnp.stack([o[2] for o in outs])
        proj = sum(o[3] for o in outs)
        return x, v, w, (proj[0], proj[1])
