"""Marker optimization: merge, remove, split.

Reference: src/pic1dp_particle.F90 — particle_merge (:411-522),
particle_remove (:530-627), particle_split (:635-746), orchestrated by
particle_optimize (:752-813).  All three are driven by the |delta f|(v)
profile from particle_compute_dist_pertb_abs_v (:356-403) and are delta-f
only (:762).

The reference's algorithms are sequential (streaming bins, backfilling holes,
decrementing live counts).  XLA needs static shapes and no data-dependent
loops, so each operation is re-derived as a masked, sort-based batch
transform over the fixed-capacity particle arrays:

  * merge: eligible particles are keyed by (ix, iv, sign w) and sorted; equal
    keys are paired positionally, each pair collapses into its first member
    (|w|-weighted x, v; summed p, w — reference :485-507) and the second dies.
  * remove: a per-particle dice decides removal; survivors rescale p, w
    (reference :594-614).  Fully parallel by construction.
  * split: eligible (resonant) particles spawn 2*ngroup children with
    velocities v +/- N(0,1)*(2 v_max / nv)*dv_sig_frac and weights divided by
    2*ngroup (reference :697-728); children fill dead slots assigned by rank,
    capacity-guarded like the reference (:655-675).

Merged/paired choices differ from the reference's streaming order when a bin
receives >2 eligible particles between resets, and dice are drawn from the
jax.random stream rather than multirand — statistically equivalent, not
bit-identical (the operations are Monte-Carlo noise control, not physics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pic1dp_tpu import distributions as dist
from pic1dp_tpu.config import Config
from pic1dp_tpu.core.diagnostics import dist_pertb_abs_v
from pic1dp_tpu.core.state import SimState
from pic1dp_tpu.ops.interp import hat_v_clipped


def _df_at_particles(profile_s: jnp.ndarray, v: jnp.ndarray, v_max: float, nv: int):
    """Interpolate one species' |delta f|(v) profile to particle velocities
    with boundary clamping (reference :452-466)."""
    iv0, iv1, w0, w1 = hat_v_clipped(v, v_max, nv)
    return w0 * jnp.take(profile_s, iv0) + w1 * jnp.take(profile_s, iv1)


def _profile(cfg: Config, state: SimState,
             axis_name: str | None = None) -> jnp.ndarray:
    """Globally reduced |delta f|(v) profile; the psum is the reference's
    MPI_Allreduce (src/pic1dp_particle.F90:392-395)."""
    prof = dist_pertb_abs_v(state.v, state.w, state.live, cfg.v_max, cfg.nv,
                            chunk=min(cfg.deposit_chunk, state.x.shape[1]))
    if axis_name is not None:
        prof = jax.lax.psum(prof, axis_name)
    return prof


def merge_particles(cfg: Config, state: SimState, thsh: float,
                    axis_name: str | None = None) -> SimState:
    """Merge pairs of non-important particles (reference :411-522).  Pairing
    is shard-local, like the reference's per-rank bins."""
    profile = _profile(cfg, state, axis_name)
    ns, n = state.x.shape

    def per_species(x, v, p, w, live, prof):
        df = _df_at_particles(prof, v, cfg.v_max, cfg.nv)
        df_thsh = jnp.max(prof) * thsh
        elig = live & (df < df_thsh)

        s = x * (cfg.nx / cfg.lx)
        ix = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, cfg.nx - 1)
        sv = (v + cfg.v_max) * ((cfg.nv - 1) / (2.0 * cfg.v_max))
        iv = jnp.clip(jnp.floor(sv).astype(jnp.int32), 0, cfg.nv - 1)
        iw = (w > 0.0).astype(jnp.int32)
        binid = (iw * cfg.nv + iv) * cfg.nx + ix
        nbins = 2 * cfg.nv * cfg.nx
        key = jnp.where(elig, binid, nbins)  # ineligible sorts to the end

        order = jnp.argsort(key, stable=True)
        ksort = key[order]
        # position within each equal-key run
        same_prev = jnp.concatenate([jnp.array([False]), ksort[1:] == ksort[:-1]])
        # run-position parity via segmented cumsum of same_prev resets
        runpos = jnp.arange(n) - jax.lax.associative_scan(
            jnp.maximum, jnp.where(same_prev, -1, jnp.arange(n)))
        same_next = jnp.concatenate([ksort[1:] == ksort[:-1], jnp.array([False])])
        is_first = (runpos % 2 == 0) & same_next & (ksort < nbins)
        is_second = (runpos % 2 == 1) & (ksort < nbins)

        i1 = order                          # sorted -> original index
        i2 = jnp.roll(order, -1)            # partner (valid where is_first)

        wa = w[i1]
        wb = w[i2]
        # same-sign bins make wa + wb == 0 only when both are exactly 0
        # (possible at t=0 with zero seed amplitude); keep those unmerged-safe
        denom = jnp.where(wa + wb != 0.0, wa + wb, 1.0)
        x_m = (wa * x[i1] + wb * x[i2]) / denom
        v_m = (wa * v[i1] + wb * v[i2]) / denom
        p_m = p[i1] + p[i2]
        w_m = wa + wb

        x = x.at[i1].set(jnp.where(is_first, x_m, x[i1]))
        v = v.at[i1].set(jnp.where(is_first, v_m, v[i1]))
        p = p.at[i1].set(jnp.where(is_first, p_m, p[i1]))
        w = w.at[i1].set(jnp.where(is_first, w_m, w[i1]))
        live = live.at[i1].set(jnp.where(is_second, False, live[i1]))
        return x, v, p, w, live

    x, v, p, w, live = jax.vmap(per_species)(
        state.x, state.v, state.p, state.w, state.live, profile)
    return SimState(x=x, v=v, p=p, w=w, live=live, rho=state.rho,
                    electric=state.electric, mode_re=state.mode_re,
                    mode_im=state.mode_im)


def remove_particles(cfg: Config, state: SimState, key: jax.Array,
                     thsh: float, axis_name: str | None = None) -> SimState:
    """Remove unimportant particles, rescaling survivors (reference :530-627)."""
    profile = _profile(cfg, state, axis_name)
    opt = cfg.optimization
    dice = jax.random.uniform(key, state.x.shape, state.x.dtype)

    def per_species(v, p, w, live, prof, dice_s):
        df = _df_at_particles(prof, v, cfg.v_max, cfg.nv)
        mx = jnp.max(prof)
        # identically-zero |delta f| profile (e.g. zero seed amplitude):
        # importance sampling is undefined — make remove a no-op instead of
        # the 0/0 NaN cascade
        df_norm = df / jnp.where(mx > 0.0, mx, 1.0)
        if opt.typeremove == 1:
            elig = live & (df < mx * thsh)
            removed = elig & (dice_s < opt.remove_frac)
            keep_scale = jnp.where(elig & ~removed,
                                   1.0 / (1.0 - opt.remove_frac), 1.0)
        else:
            elig = live & (mx > 0.0)
            removed = elig & (dice_s > df_norm)
            keep = elig & ~removed
            keep_scale = jnp.where(keep,
                                   1.0 / jnp.where(keep & (df_norm > 0.0),
                                                   df_norm, 1.0), 1.0)
        p = p * keep_scale
        w = w * keep_scale
        return p, w, live & ~removed

    p, w, live = jax.vmap(per_species)(
        state.v, state.p, state.w, state.live, profile, dice)
    return SimState(x=state.x, v=state.v, p=p, w=w, live=live, rho=state.rho,
                    electric=state.electric, mode_re=state.mode_re,
                    mode_im=state.mode_im)


def split_particles(cfg: Config, state: SimState, key: jax.Array,
                    thsh: float, axis_name: str | None = None) -> SimState:
    """Split resonant particles into 2*ngroup children (reference :635-746).
    Children fill shard-local dead slots, like the reference's per-rank
    capacity guard."""
    profile = _profile(cfg, state, axis_name)
    g = cfg.optimization.split_ngroup
    dv_sig = 2.0 * cfg.v_max / cfg.nv * cfg.optimization.split_dv_sig_frac
    ns, n = state.x.shape
    grand = jax.random.normal(key, (ns, n, g), state.x.dtype) * dv_sig

    def per_species(x, v, p, w, live, prof, gr):
        df = _df_at_particles(prof, v, cfg.v_max, cfg.nv)
        df_thsh = jnp.max(prof) * thsh
        elig = live & (df > df_thsh)

        nfree = jnp.sum(~live)
        rank = jnp.cumsum(elig) - 1                    # split order by index
        per_parent = 2 * g - 1                         # new slots per parent
        capacity_ok = (rank + 1) * per_parent <= nfree
        do_split = elig & capacity_ok

        # j-th dead slot index, in index order
        idx = jnp.arange(n)
        dead_order = jnp.argsort(jnp.where(live, n + idx, idx), stable=True)

        x_orig, v_orig = x, v
        p_child = p / (2.0 * g)
        w_child = w / (2.0 * g) if cfg.deltaf else w

        # scatter the 2g-1 sibling children into dead slots; sibling j holds
        # v + gr[j//2] (j even) or v - gr[j//2] (j odd), matching the
        # reference's slot order +g1, -g1, ..., +g_{g-1}, -g_{g-1}, +g_g
        # (reference :706-728)
        base = rank * per_parent
        for j in range(per_parent):
            igroup = j // 2
            sign = 1.0 if j % 2 == 0 else -1.0
            slot = jnp.where(do_split,
                             dead_order[jnp.clip(base + j, 0, n - 1)], n)
            v_child = v_orig + sign * gr[igroup]
            x = x.at[slot].set(x_orig, mode="drop")
            v = v.at[slot].set(v_child, mode="drop")
            p = p.at[slot].set(p_child, mode="drop")
            w = w.at[slot].set(w_child, mode="drop")
            live = live.at[slot].set(True, mode="drop")

        # parent slot becomes the last 'minus' child, -g_g (reference :716-724)
        v = jnp.where(do_split, v_orig - gr[g - 1], v)
        p = jnp.where(do_split, p_child, p)
        if cfg.deltaf:
            w = jnp.where(do_split, w_child, w)
        return x, v, p, w, live

    x, v, p, w, live = jax.vmap(per_species)(
        state.x, state.v, state.p, state.w, state.live, profile,
        grand.transpose(0, 2, 1))
    return SimState(x=x, v=v, p=p, w=w, live=live, rho=state.rho,
                    electric=state.electric, mode_re=state.mode_re,
                    mode_im=state.mode_im)


def apply_optimizations(cfg: Config, sp: dist.SpeciesParams, state: SimState,
                        key: jax.Array, merge: float | None = None,
                        remove: float | None = None,
                        split: float | None = None,
                        axis_name: str | None = None) -> SimState:
    """Run scheduled optimizations in the reference's order: merge, remove,
    split — recomputing the |delta f|(v) profile before each (reference
    particle_optimize, src/pic1dp_particle.F90:766-809).  The threshold
    arguments are fractions of max |delta f|(v); None disables the op."""
    if axis_name is not None:
        # decorrelate the per-shard dice streams
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    # p may be stored reduced-precision (cfg.bf16_weights); the rare
    # optimization arithmetic (pair merges, survivor rescales) runs at full
    # precision and re-quantizes once at the end.  All particle dtypes are
    # restored on exit — f64 draws under jax_enable_x64 (CPU tests) must not
    # leak into an f32 state and change the jitted step's signature.
    in_dtypes = {f: getattr(state, f).dtype for f in ("x", "v", "p", "w")}
    if in_dtypes["p"] != in_dtypes["w"]:
        state = dataclasses.replace(state, p=state.p.astype(state.w.dtype))
    k1, k2 = jax.random.split(key)
    if merge is not None:
        state = merge_particles(cfg, state, merge, axis_name)
    if remove is not None:
        state = remove_particles(cfg, state, k1, remove, axis_name)
    if split is not None:
        state = split_particles(cfg, state, k2, split, axis_name)
    # Re-establish the dead-slot invariant p = w = 0 (core/state.py): merge/
    # remove flip live bits without clearing the arrays.
    p = jnp.where(state.live, state.p, 0.0).astype(in_dtypes["p"])
    w = jnp.where(state.live, state.w, 0.0).astype(in_dtypes["w"])
    return SimState(x=state.x.astype(in_dtypes["x"]),
                    v=state.v.astype(in_dtypes["v"]), p=p, w=w,
                    live=state.live,
                    rho=state.rho, electric=state.electric,
                    mode_re=state.mode_re, mode_im=state.mode_im)
