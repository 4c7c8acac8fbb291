"""The RK2 time step: gather -> push -> deposit -> spectral solve.

Reference semantics (src/pic1dp.F90:78-109 main loop,
src/pic1dp_interaction.F90 push/deposit, src/pic1dp_field.F90 solve):

Per step, two Runge-Kutta (midpoint) substeps.  Substep 1 integrates from the
step-start backups with dt/2; substep 2 re-integrates from the same backups
with the full dt using midpoint fields/velocities
(reference src/pic1dp_interaction.F90:178-193).  Within a substep the update
order matters and is preserved exactly (:238-339):

    E_p   = gather(E, x)                      # hat weights at current x
    x_new = x_bak + dt_eff * v                # current v (midpoint v in ss2)
    w_new = w_bak + dt_eff * drive * (-f0'/f0)(v) * (q/m)   # delta-f only
            drive = p * E_p (linear) or (p - w) * E_p (nonlinear)
    v_new = v_bak + dt_eff * E_p * (q/m)      # nonlinear only (v frozen if linear)

then charge deposition (delta-f: w; full-f: p then subtract equilibrium,
reference src/pic1dp_interaction.F90:51-70,142-148) and the partial-DFT field
solve.  Both substeps live inside ONE jitted function, so the x/v/w backups
(reference Vecs src/pic1dp_particle.F90:34-36) are compiler temporaries.

The step is written in pure jnp on stacked (nspecies, nparticle) arrays;
under pjit with the particle axis sharded, XLA turns the deposition reduction
into local partial sums + an ICI psum automatically — the TPU-native
equivalent of the reference's replicate-and-MPI_Allreduce deposition
(src/pic1dp_interaction.F90:130-135).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pic1dp_tpu import distributions as dist
from pic1dp_tpu.config import Config, DepositMethod, ParticleShape
from pic1dp_tpu.core import diagnostics
from pic1dp_tpu.core.state import SimState
from pic1dp_tpu.ops import deposit as deposit_ops
from pic1dp_tpu.ops import gather as gather_ops
from pic1dp_tpu.ops import shape_matrix as shape_ops
from pic1dp_tpu.ops import spectral as spectral_ops
from pic1dp_tpu.ops.interp import wrap_x
from pic1dp_tpu.ops.spectral import SpectralOperator


class Stepper:
    """Precompiled step functions for a fixed Config.

    `axis_name` makes every grid reduction finish with a psum over that mesh
    axis — set when the particle axis is sharded under shard_map
    (parallel/mesh.py); None on a single device.  This is the TPU-native
    analogue of the reference's deposit-then-MPI_Allreduce pattern
    (src/pic1dp_interaction.F90:130-135): each device deposits its particle
    shard onto a private full grid and the partial grids ride ICI.
    """

    def __init__(self, cfg: Config, axis_name: str | None = None):
        cfg.validate()
        self.cfg = cfg
        self.axis_name = axis_name
        self._fused = None  # lazily built FusedStepper (pallas path)
        # resolve DepositMethod.AUTO: fused Pallas on a TPU backend when the
        # config is eligible, pure-XLA one-hot everywhere else
        self.deposit_method = cfg.deposit_method
        # fused-kernel capacity granularity: 1024 (f32 streams), 2048 when
        # bf16_weights adds (16, 128)-tiled bf16 streams
        self._pallas_align = 2048 if cfg.p_dtype != cfg.dtype else 1024
        if self.deposit_method == DepositMethod.AUTO:
            eligible = (cfg.shape == ParticleShape.MATRIX_FREE
                        and cfg.nparticle_max % self._pallas_align == 0)
            if eligible and jax.default_backend() == "tpu":
                self.deposit_method = DepositMethod.PALLAS
            elif jax.default_backend() == "tpu" and cfg.nx >= 2048:
                # grid-path deposits on TPU: XLA's scatter lowering overtakes
                # the flat one-hot at large nx (measured 3x at nx=4096,
                # docs/performance.md)
                self.deposit_method = DepositMethod.SEGMENT
            else:
                self.deposit_method = DepositMethod.ONEHOT
        # grid-path gather: dynamic takes serialize on TPU (measured ~10x
        # slower than the factorized one-hot at 16M entries), so TPU backends
        # use the twolevel contraction; CPU keeps plain take
        self.gather_method = (
            "twolevel"
            if (self.deposit_method == DepositMethod.TWOLEVEL
                or jax.default_backend() == "tpu")
            else "take")
        self.dtype = jnp.dtype(cfg.dtype)
        # packed p||w1 fused-kernel layout (ops/pallas_kernels.pack_pw):
        # 12 N f32 stream-floats per step with every tile f32 — the default
        # bf16_weights data path (the separate bf16 p stream costs +30% on
        # this Mosaic version, docs/performance.md).  PIC1DP_PACKED=0 or a
        # PIC1DP_BF16_STREAMS bisection selection reverts to separate
        # bf16 streams.
        import os

        self._packed = (cfg.bf16_weights and cfg.deltaf
                        and self.dtype == jnp.float32
                        and os.environ.get("PIC1DP_BF16_STREAMS") is None
                        and bool(int(os.environ.get("PIC1DP_PACKED", "1"))))
        if cfg.bf16_weights and cfg.nspecies > 1 and any(
                abs(s.v0) > 2.0 * (s.temperature / s.mass) ** 0.5
                for s in cfg.species):
            # measured limitation (docs/performance.md round 5): the bf16
            # w1-stream rounding destabilizes the post-saturation vortex
            # reorganization of strongly shifted multi-species equilibria
            # (deterministic divergence, dt/seed-independent; f32 and
            # p-only quantization stable).  Single-species composite
            # equilibria representing the same physics are unaffected.
            import warnings

            warnings.warn(
                "bf16_weights with multiple strongly shifted species "
                "(|v0| > 2 vth) has a measured post-saturation divergence "
                "(bf16 w1-stream rounding amplifies the vortex-merging "
                "transient; docs/performance.md round 5). Use f32, the "
                "equivalent single-species composite equilibrium, or stop "
                "before deep saturation.", RuntimeWarning, stacklevel=3)
        # stream the midpoint velocities v1 between the fused substeps
        # instead of recomputing them: +2N HBM floats for one less trig
        # gather chain — the right trade once the kernels are VPU-bound
        # (PIC1DP_STREAM_V1=0 reverts to the recompute layout)
        self._stream_v1 = (not cfg.linear and cfg.deltaf
                           and bool(int(os.environ.get(
                               "PIC1DP_STREAM_V1", "1"))))
        self.spectral = SpectralOperator.create(cfg.nx, cfg.modes, cfg.lx, self.dtype)
        self.sp = dist.SpeciesParams.from_config(cfg, self.dtype)
        self.step = jax.jit(self._step)
        self.initial_field = jax.jit(self._initial_field)
        self.energies = jax.jit(
            lambda s: diagnostics.energies(cfg, self.sp, s, self.axis_name))
        self.ptcldist = jax.jit(
            lambda s: diagnostics.ptcldist(cfg, self.sp, s))
        self.full_rho = jax.jit(
            lambda s: self.deposit_charge(s.x, s.p, s.w, s.live))

    def _psum(self, x):
        if self.axis_name is not None:
            return jax.lax.psum(x, self.axis_name)
        return x

    # ---- pieces ----

    def _gather(self, x, electric):
        """E at particle positions, stacked species.  EXPLICIT shapes apply
        the stored COO S (reference MatMult(S, E),
        src/pic1dp_interaction.F90:213-220); otherwise matrix-free take."""
        cfg = self.cfg
        if cfg.shape == ParticleShape.EXPLICIT:
            s_mat = shape_ops.ShapeMatrix.assemble(x, cfg.lx, cfg.nx)
            return s_mat.gather(electric, method=self.gather_method,
                                chunk=cfg.deposit_chunk)
        flat = gather_ops.gather(
            x.reshape(-1), electric, cfg.lx, cfg.nx,
            method=self.gather_method, chunk=cfg.deposit_chunk,
        )
        return flat.reshape(x.shape)

    def deposit_charge(self, x, p, w, live):
        """Charge density on the grid (reference interaction_collect_charge,
        src/pic1dp_interaction.F90:33-155)."""
        cfg = self.cfg
        val = w if cfg.deltaf else p
        val = jnp.where(live, val, 0.0) * self.sp.charge
        if cfg.shape == ParticleShape.EXPLICIT:
            # per-nx winner, same crossover as the position-path AUTO
            # resolution: flat one-hot below nx=2048, XLA scatter above
            # (docs/performance.md SpMV table)
            coo_method = ("segment"
                          if self.deposit_method == DepositMethod.SEGMENT
                          else "onehot")
            grid = shape_ops.ShapeMatrix.assemble(x, cfg.lx, cfg.nx).deposit(
                val, method=coo_method, chunk=cfg.deposit_chunk)
        else:
            grid = deposit_ops.deposit(
                x.reshape(-1), val.reshape(-1), cfg.lx, cfg.nx,
                method=self.deposit_method.value
                if self.deposit_method in (DepositMethod.SEGMENT,
                                           DepositMethod.TWOLEVEL)
                else "onehot",
                chunk=cfg.deposit_chunk,
            )
        grid = self._psum(grid)
        rho = grid * (cfg.nx / cfg.lx)
        if not cfg.deltaf:
            # subtract equilibrium charge density (reference :142-148)
            rho = rho - jnp.sum(self.sp.charge * self.sp.density)
        return rho

    def _push(self, x, v, p, w, x_bak, v_bak, w_bak, electric, dt_eff):
        """One RK substep particle push: grid-path gather composed with the
        shared update body (_push_math holds the load-bearing ordering)."""
        e_p = self._gather(x, electric)
        return self._push_math(e_p, x, v, p, w, x_bak, v_bak, w_bak, dt_eff)

    def solve_field(self, rho):
        return self.spectral.solve(rho)

    # ---- matrix-free spectral hot path (cfg.shape == MATRIX_FREE) ----
    #
    # The reference's iptclshape=4 recomputes the shape on the fly instead of
    # storing S (src/pic1dp_particle.F90:133-138); the TPU-native analogue
    # goes further: the hot loop composes hat interpolation with the partial
    # DFT so no nx-grid is ever touched (see ops/spectral.py).  The grid path
    # below (_step_grid) is the explicit-S analogue and the cross-check.

    def _deposit_val(self, p, w, live):
        """Per-particle deposit value with charge and live mask folded in."""
        val = w if self.cfg.deltaf else p
        return jnp.where(live, val, 0.0) * self.sp.charge

    def _trig(self, x):
        return spectral_ops.mode_trig(x, self.cfg.lx, self.cfg.nx, self.cfg.modes)

    def _project_and_solve(self, trig, p, w, live):
        """Deposit in mode space + field solve; returns (mode_re, mode_im)
        of E.  The psum is the reference's deposition MPI_Allreduce."""
        p_c, p_s = spectral_ops.project_modes(trig, self._deposit_val(p, w, live))
        p_c, p_s = self._psum((p_c, p_s))
        return spectral_ops.solve_modes_from_projections(
            p_c, p_s, self.spectral.grad_inv, self.cfg.lx), (p_c, p_s)

    def _push_math(self, e_p, x, v, p, w, x_bak, v_bak, w_bak, dt_eff):
        """The push update given the gathered field (same ordering as _push)."""
        cfg = self.cfg
        sp = self.sp
        q_over_m = sp.charge / sp.mass
        x_new = wrap_x(x_bak + dt_eff * v, cfg.lx)
        if cfg.deltaf:
            drive = (p * e_p) if cfg.linear else ((p - w) * e_p)
            kern = dist.minus_dlnf0_dv(cfg.equilibrium, sp, v)
            w_new = w_bak + dt_eff * drive * kern * q_over_m
        else:
            w_new = w
        v_new = v if cfg.linear else v_bak + dt_eff * e_p * q_over_m
        return x_new, v_new, w_new

    def _step_spectral(self, state: SimState) -> SimState:
        """One RK2 step, matrix-free: trig at the substep-1 deposit positions
        is reused for the substep-2 gather."""
        cfg = self.cfg
        dt = jnp.asarray(cfg.dt, self.dtype)
        x0, v0, w0 = state.x, state.v, state.w
        p, live = state.p, state.live

        # substep 1: gather at x0 from the step-start field, half push
        t0 = self._trig(x0)
        e_p0 = spectral_ops.efield_at(t0, state.mode_re, state.mode_im)
        x1, v1, w1 = self._push_math(e_p0, x0, v0, p, w0, x0, v0, w0, 0.5 * dt)
        t1 = self._trig(x1)
        (mre1, mim1), _ = self._project_and_solve(t1, p, w1, live)

        # substep 2: gather at x1 from the midpoint field (trig reused)
        e_p1 = spectral_ops.efield_at(t1, mre1, mim1)
        x2, v2, w2 = self._push_math(e_p1, x1, v1, p, w1, x0, v0, w0, dt)
        t2 = self._trig(x2)
        (mre2, mim2), (p_c, p_s) = self._project_and_solve(t2, p, w2, live)

        electric = self.spectral.e_grid(mre2, mim2)
        rho = self.spectral.rho_grid_from_projections(p_c, p_s, cfg.lx)
        return SimState(x=x2, v=v2, p=p, w=w2, live=live,
                        rho=rho, electric=electric, mode_re=mre2, mode_im=mim2)

    # ---- jitted entry points ----

    def _initial_field(self, state: SimState) -> SimState:
        """Deposit + solve for the freshly loaded state
        (reference src/pic1dp.F90:70-72)."""
        if self.cfg.shape == ParticleShape.MATRIX_FREE:
            trig = self._trig(state.x)
            (mre, mim), (p_c, p_s) = self._project_and_solve(
                trig, state.p, state.w, state.live)
            electric = self.spectral.e_grid(mre, mim)
            rho = self.spectral.rho_grid_from_projections(p_c, p_s, self.cfg.lx)
        else:
            rho = self.deposit_charge(state.x, state.p, state.w, state.live)
            electric, mre, mim = self.solve_field(rho)
        return SimState(x=state.x, v=state.v, p=state.p, w=state.w,
                        live=state.live, rho=rho, electric=electric,
                        mode_re=mre, mode_im=mim)

    def _step(self, state: SimState) -> SimState:
        """One full RK2 step (two substeps), no particle optimization."""
        if self.cfg.shape == ParticleShape.MATRIX_FREE:
            # The fused kernel needs the PER-TRACE particle length (the
            # per-device shard under shard_map) 1024-aligned (2048 with
            # bf16_weights); fall back to the XLA spectral path otherwise
            # instead of crashing.
            if self.deposit_method == DepositMethod.PALLAS:
                if state.x.shape[-1] % self._pallas_align == 0:
                    return self._step_spectral_pallas(state)
                self._warn_pallas_fallback(state.x.shape[-1])
            return self._step_spectral(state)
        return self._step_grid(state)

    def _warn_pallas_fallback(self, length: int) -> None:
        """Trace-time fallback gate: the Pallas path was requested (or
        AUTO-resolved) but this trace's per-device particle length misses the
        capacity granularity, so the run takes the XLA spectral path instead.
        For plain-precision configs the fallback is physics-equivalent and
        only warns once.  With bf16_weights the fallback SKIPS the intra-step
        w1 quantization — the same config would produce different rounding
        depending on per-shard alignment — so it RAISES unless
        cfg.allow_pallas_fallback opts in explicitly."""
        quantized = self.cfg.p_dtype != self.cfg.dtype
        if quantized and not self.cfg.allow_pallas_fallback:
            raise ValueError(
                f"bf16_weights requested but the per-trace particle length "
                f"{length} is not a multiple of {self._pallas_align}, so the "
                f"fused Pallas kernels (which carry the w1-stream "
                f"quantization) cannot run; the XLA fallback would silently "
                f"change the physics rounding. Pad nparticle_max so every "
                f"per-device shard is a multiple of {self._pallas_align}, or "
                f"set allow_pallas_fallback=True to accept the unquantized "
                f"fallback explicitly.")
        if getattr(self, "_pallas_fallback_warned", False):
            return
        self._pallas_fallback_warned = True
        import warnings

        extra = ("; bf16_weights' w1-stream quantization is inactive on "
                 "this path" if quantized else "")
        warnings.warn(
            f"Pallas step requested but the per-trace particle length "
            f"{length} is not a multiple of {self._pallas_align}; falling "
            f"back to the XLA spectral path{extra}. Pad nparticle_max (per "
            f"device) to a multiple of {self._pallas_align} to enable the "
            f"fused kernels.", RuntimeWarning, stacklevel=3)

    def _get_fused(self):
        import os

        from pic1dp_tpu.ops.pallas_kernels import FusedStepper

        if self._fused is None:
            # PIC1DP_PALLAS_ROWS: block-row sweep knob for on-chip tuning
            # (default 256, the v5e optimum: same-day sweep at 2^24 AND 2^26
            # markers; 128 loses ~8% at 2^26 — docs/performance.md round 4)
            self._fused = FusedStepper(
                self.cfg, axis_name=self.axis_name, packed=self._packed,
                stream_v1=self._stream_v1,
                max_rows=int(os.environ.get("PIC1DP_PALLAS_ROWS", "256")))
        return self._fused

    def _step_spectral_pallas(self, state: SimState) -> SimState:
        """Matrix-free RK2 step with both substeps as fused Pallas kernels
        (ops/pallas_kernels.py); mode solve between them is scalar work.
        The midpoint positions/velocities (x1, v1) never leave VMEM —
        substep 2 recomputes them bitwise-identically from the step-start
        state and mode scalars; only the midpoint weights w1 are streamed
        (recomputing those too measures slower, see docs/performance.md)."""
        import dataclasses

        fused = self._get_fused()
        if fused.packed:
            # single-step entry: pack p||w1 for this step only (make_multi_
            # step carries the packed stream across the whole scan instead).
            # Bitwise-identical physics either way — the packed kernels
            # quantize with the same RTNE as .astype(bfloat16).
            from pic1dp_tpu.ops.pallas_kernels import pack_pw

            carry = dataclasses.replace(state, p=pack_pw(state.p))
            out = self._step_packed_carry(carry)
            return dataclasses.replace(out, p=state.p)
        return self._step_pallas_body(state, state.p)

    def _step_packed_carry(self, state: SimState) -> SimState:
        """One packed-carry RK2 step: state.p holds the packed p||w1 f32
        stream (ops/pallas_kernels.pack_pw); the returned state carries the
        refreshed stream (same p halves) so a lax.scan never re-packs."""
        return self._step_pallas_body(state, state.p, packed_carry=True)

    def _step_pallas_body(self, state: SimState, p_stream,
                          packed_carry: bool = False) -> SimState:
        fused = self._get_fused()
        cfg = self.cfg
        x0, v0, w0 = state.x, state.v, state.w
        live = state.live

        w1, v1, (pc1, ps1) = fused.substep1(
            x0, v0, p_stream, w0, state.mode_re, state.mode_im)
        pc1, ps1 = self._psum((pc1, ps1))
        mre1, mim1 = spectral_ops.solve_modes_from_projections(
            pc1, ps1, self.spectral.grad_inv, cfg.lx)

        # packed mode: substep 1's output IS the refreshed p||w1 stream,
        # consumed by substep 2 in the p slot (the original was donated)
        p2 = w1 if fused.packed else p_stream
        x2, v2, w2, (pc2, ps2) = fused.substep2(
            x0, v0, p2, w0, None if fused.packed else w1,
            state.mode_re, state.mode_im, mre1, mim1, v1=v1)
        pc2, ps2 = self._psum((pc2, ps2))
        mre2, mim2 = spectral_ops.solve_modes_from_projections(
            pc2, ps2, self.spectral.grad_inv, cfg.lx)

        electric = self.spectral.e_grid(mre2, mim2)
        rho = self.spectral.rho_grid_from_projections(pc2, ps2, cfg.lx)
        p_out = p2 if packed_carry else state.p
        return SimState(x=x2, v=v2, p=p_out, w=w2, live=live,
                        rho=rho, electric=electric, mode_re=mre2, mode_im=mim2)

    def _step_grid(self, state: SimState) -> SimState:
        """Grid-histogram RK2 step (explicit-shape analogue, cross-check
        path for iptclshape 1-3, reference src/pic1dp_particle.F90:275-350)."""
        cfg = self.cfg
        dt = jnp.asarray(cfg.dt, self.dtype)
        x0, v0, w0 = state.x, state.v, state.w
        p, live = state.p, state.live

        # substep 1: half step from (x0, v0, w0)
        x1, v1, w1 = self._push(x0, v0, p, w0, x0, v0, w0, state.electric, 0.5 * dt)
        rho1 = self.deposit_charge(x1, p, w1, live)
        e1, _, _ = self.solve_field(rho1)

        # substep 2: full step from the same backups, midpoint quantities
        x2, v2, w2 = self._push(x1, v1, p, w1, x0, v0, w0, e1, dt)
        rho2 = self.deposit_charge(x2, p, w2, live)
        e2, mre, mim = self.solve_field(rho2)

        return SimState(x=x2, v=v2, p=p, w=w2, live=live,
                        rho=rho2, electric=e2, mode_re=mre, mode_im=mim)

    def _packed_scan_ok(self, n_trace: int) -> bool:
        """Packed-carry scan eligibility for a per-trace particle length."""
        return (self._packed
                and self.cfg.shape == ParticleShape.MATRIX_FREE
                and self.deposit_method == DepositMethod.PALLAS
                and n_trace % self._pallas_align == 0)

    def multi_step_body(self, state: SimState, k: int) -> SimState:
        """k-step advance via lax.scan — the traced body shared by
        make_multi_step (single device) and ShardedStepper.make_multi_step
        (called inside shard_map, where `state` carries the per-device
        shards, so the packed/flat eligibility checks below see the
        per-device length — exactly what the kernels see).

        With packed bf16 weights the scan carries the packed p||w1 stream:
        packed once before the loop, p restored after — the per-step body
        then streams 12 N f32 with every write aliased in place.

        On the Pallas path the carry's particle arrays are FLATTENED to
        (ns*N,) for the scan: a (ns, N) array on TPU is tiled over its last
        two dims, so ns > 1 sublane-pads the species dim and every kernel
        call pays a physical relayout to the (rows, 128) blocking (measured
        2.71x step time at ns = 2 on chip, MULTISPECIES_r05.json); flat
        buffers reshape layout-free.  The
        flatten/unflatten happens once per dispatch, not per step."""
        import dataclasses

        import os

        def body(state, _):
            return self._step(state), None

        def body_packed(state, _):
            return self._step_packed_carry(state), None

        # PIC1DP_FLAT_CARRY=0: A/B knob that keeps the stacked (ns, N)
        # carry, reproducing the sublane-relayout penalty the flat layout
        # removes (bench/multispecies.py measures both)
        use_flat = (self.deposit_method == DepositMethod.PALLAS
                    and self.cfg.shape == ParticleShape.MATRIX_FREE
                    and bool(int(os.environ.get("PIC1DP_FLAT_CARRY", "1"))))

        def flatten(state):
            return dataclasses.replace(
                state, x=state.x.reshape(-1), v=state.v.reshape(-1),
                p=state.p.reshape(-1), w=state.w.reshape(-1))

        def unflatten(state, like):
            return dataclasses.replace(
                state, x=state.x.reshape(like.x.shape),
                v=state.v.reshape(like.v.shape),
                p=state.p.reshape(like.p.shape),
                w=state.w.reshape(like.w.shape))

        # flat only when this trace's per-device length really takes
        # the Pallas path (misaligned lengths fall back to the XLA
        # spectral step, which needs the (ns, N) stacking)
        flat = use_flat and state.x.shape[-1] % self._pallas_align == 0
        if self._packed_scan_ok(state.x.shape[-1]):
            from pic1dp_tpu.ops.pallas_kernels import pack_pw

            carry = dataclasses.replace(state, p=pack_pw(state.p))
            if flat:
                carry = flatten(carry)
            out, _ = jax.lax.scan(body_packed, carry, None, length=k)
            if flat:
                out = unflatten(out, state)
            return dataclasses.replace(out, p=state.p)
        carry = flatten(state) if flat else state
        out, _ = jax.lax.scan(body, carry, None, length=k)
        return unflatten(out, state) if flat else out

    def make_multi_step(self, k: int):
        """Jitted k-step advance: one dispatch, one compiled loop —
        amortizes host->device launch latency (the reference's analogue is
        simply its Fortran time loop, src/pic1dp.F90:78-109)."""
        return jax.jit(functools.partial(self.multi_step_body, k=k))

    def push_pair(self, state: SimState):
        """Both RK substeps' pushes WITHOUT the final deposit/solve; used by
        the optimization path, which runs merge/remove/split after the second
        push and before the final charge collection (reference
        src/pic1dp.F90:79-90 with particle_optimize acting on irk == 2).

        Returns the state after substep 2's push with stale field quantities.
        """
        cfg = self.cfg
        dt = jnp.asarray(cfg.dt, self.dtype)
        x0, v0, w0 = state.x, state.v, state.w
        p, live = state.p, state.live
        if cfg.shape == ParticleShape.MATRIX_FREE:
            t0 = self._trig(x0)
            e_p0 = spectral_ops.efield_at(t0, state.mode_re, state.mode_im)
            x1, v1, w1 = self._push_math(e_p0, x0, v0, p, w0, x0, v0, w0, 0.5 * dt)
            t1 = self._trig(x1)
            (mre1, mim1), (p_c, p_s) = self._project_and_solve(t1, p, w1, live)
            e_p1 = spectral_ops.efield_at(t1, mre1, mim1)
            x2, v2, w2 = self._push_math(e_p1, x1, v1, p, w1, x0, v0, w0, dt)
            rho1 = self.spectral.rho_grid_from_projections(p_c, p_s, cfg.lx)
            e1 = self.spectral.e_grid(mre1, mim1)
        else:
            x1, v1, w1 = self._push(x0, v0, p, w0, x0, v0, w0, state.electric, 0.5 * dt)
            rho1 = self.deposit_charge(x1, p, w1, live)
            e1, _, _ = self.solve_field(rho1)
            x2, v2, w2 = self._push(x1, v1, p, w1, x0, v0, w0, e1, dt)
        return SimState(x=x2, v=v2, p=p, w=w2, live=live,
                        rho=rho1, electric=e1, mode_re=state.mode_re,
                        mode_im=state.mode_im)

    def collect_and_solve(self, state: SimState) -> SimState:
        """Final deposit + solve after optimization."""
        return self._initial_field(state)

    def apply_optimizations(self, state: SimState, key, merge=None,
                            remove=None, split=None) -> SimState:
        from pic1dp_tpu.core import optimize as opt_mod

        return opt_mod.apply_optimizations(
            self.cfg, self.sp, state, key, merge=merge, remove=remove,
            split=split, axis_name=self.axis_name)
