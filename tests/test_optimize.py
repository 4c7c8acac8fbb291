"""Unit tests for the marker merge/remove/split subsystem (reference
src/pic1dp_particle.F90:411-813), plus an end-to-end scheduled-optimization
run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pic1dp_tpu import Simulation
from pic1dp_tpu.config import OptimizationConfig, landau_damping
from pic1dp_tpu.core import optimize
from pic1dp_tpu.core.loading import load_particles
from pic1dp_tpu.core.step import Stepper


def _loaded(n=8192, **over):
    cfg = landau_damping(nx=32, nparticle=n, amp=1e-2, dtype="float64",
                         verbosity=0, **over)
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(3)))
    # a few steps so w develops structure in v
    for _ in range(10):
        state = st.step(state)
    return cfg, st, state


class TestMerge:
    def test_conserves_moments_and_reduces_count(self):
        cfg, st, state = _loaded()
        merged = optimize.merge_particles(cfg, state, thsh=0.5)
        n0 = int(jnp.sum(state.live))
        n1 = int(jnp.sum(merged.live))
        assert n1 < n0
        # merging pairs conserves sum(p) and sum(w) exactly (dead slots are
        # NOT zeroed until apply_optimizations, so mask explicitly)
        for f in ("p", "w"):
            a = np.asarray(jnp.sum(jnp.where(state.live, getattr(state, f), 0.0)))
            b = np.asarray(jnp.sum(jnp.where(merged.live, getattr(merged, f), 0.0)))
            np.testing.assert_allclose(b, a, rtol=1e-12, err_msg=f)

    def test_only_below_threshold_particles_touched(self):
        cfg, st, state = _loaded()
        merged = optimize.merge_particles(cfg, state, thsh=0.3)
        prof = optimize._profile(cfg, state)
        df = optimize._df_at_particles(prof[0], state.v[0], cfg.v_max, cfg.nv)
        important = np.asarray(state.live[0] & (df >= jnp.max(prof[0]) * 0.3))
        np.testing.assert_array_equal(np.asarray(merged.x[0])[important],
                                      np.asarray(state.x[0])[important])
        np.testing.assert_array_equal(np.asarray(merged.live[0])[important],
                                      True)


class TestRemove:
    def test_importance_sampling_rescales_survivors(self):
        cfg, st, state = _loaded()
        out = optimize.remove_particles(cfg, state, jax.random.PRNGKey(7),
                                        thsh=0.0)
        n0, n1 = int(jnp.sum(state.live)), int(jnp.sum(out.live))
        assert n1 < n0
        # survivors: p and w scaled by the same factor 1/df_norm >= 1
        live_both = np.asarray(state.live[0] & out.live[0])
        pr = np.asarray(out.p[0] / state.p[0])[live_both]
        wr = np.asarray(out.w[0] / state.w[0])[live_both]
        np.testing.assert_allclose(pr, wr, rtol=1e-10)
        assert np.all(pr >= 1.0 - 1e-12)
        # positions untouched
        np.testing.assert_array_equal(np.asarray(out.x), np.asarray(state.x))

    def test_threshold_mode(self):
        cfg, st, state = _loaded()
        cfg1 = dataclasses.replace(
            cfg, optimization=OptimizationConfig(typeremove=1, remove_frac=0.5))
        out = optimize.remove_particles(cfg1, state, jax.random.PRNGKey(8),
                                        thsh=0.4)
        prof = optimize._profile(cfg1, state)
        df = optimize._df_at_particles(prof[0], state.v[0], cfg1.v_max, cfg1.nv)
        above = np.asarray(state.live[0] & (df >= jnp.max(prof[0]) * 0.4))
        # important particles are never removed in threshold mode
        np.testing.assert_array_equal(np.asarray(out.live[0])[above], True)
        scale = np.asarray(out.p[0] / state.p[0])[above]
        np.testing.assert_allclose(scale, 1.0, rtol=1e-12)


class TestSplit:
    def test_conserves_moments_and_increases_count(self):
        # leave free capacity: init only half the slots
        cfg, st, state = _loaded()
        # kill half the particles to make room, zeroing their p/w
        live = state.live & (jnp.arange(state.live.shape[1]) % 2 == 0)
        state = dataclasses.replace(state, live=live,
                                    p=jnp.where(live, state.p, 0.0),
                                    w=jnp.where(live, state.w, 0.0))
        out = optimize.split_particles(cfg, state, jax.random.PRNGKey(9),
                                       thsh=0.5)
        n0, n1 = int(jnp.sum(state.live)), int(jnp.sum(out.live))
        assert n1 > n0
        g = cfg.optimization.split_ngroup
        assert (n1 - n0) % (2 * g - 1) == 0
        for f in ("p", "w"):
            a = np.asarray(jnp.sum(jnp.where(state.live, getattr(state, f), 0.0)))
            b = np.asarray(jnp.sum(jnp.where(out.live, getattr(out, f), 0.0)))
            np.testing.assert_allclose(b, a, rtol=1e-12, err_msg=f)
        # children share the parent's x
        assert int(jnp.sum(out.live)) <= state.live.shape[1]

    def test_capacity_guard(self):
        cfg, st, state = _loaded()  # all slots live -> no room at all
        out = optimize.split_particles(cfg, state, jax.random.PRNGKey(10),
                                       thsh=0.01)
        assert int(jnp.sum(out.live)) == int(jnp.sum(state.live))
        np.testing.assert_array_equal(np.asarray(out.v), np.asarray(state.v))


def test_scheduled_optimization_run():
    """End-to-end: a Landau run with scheduled merge+remove+split keeps
    physics sane (finite energies, particle count changes at the scheduled
    times, dead-slot invariant restored)."""
    cfg = landau_damping(nx=32, nparticle=8192, amp=1e-2, time_max=4.0,
                         output_interval=0.5, dtype="float64", verbosity=0)
    cfg = dataclasses.replace(cfg, optimization=OptimizationConfig(
        tmerge=(1.0,), thshmerge=(0.4,),
        tremove=(2.0,), thshremove=(),
        tsplit=(3.0,), thshsplit=(0.6,)))
    sim = Simulation(cfg)
    counts, snaps = [], []

    def cb(s):
        snaps.append(s)
        counts.append(int(np.sum(np.asarray(sim.state.nparticles()))))

    sim.run(snapshot_callback=cb)
    assert len(set(counts)) > 1, "optimizations never changed the count"
    assert all(np.isfinite(s["field_energy"]) for s in snaps)
    # dead-slot invariant after optimizations
    dead = ~np.asarray(sim.state.live)
    assert np.all(np.asarray(sim.state.p)[dead] == 0.0)
    assert np.all(np.asarray(sim.state.w)[dead] == 0.0)
    assert sim._imerge == 1 and sim._iremove == 1 and sim._isplit == 1


def test_remove_zero_profile_is_noop():
    """Identically-zero |delta f| (zero seed amplitude) must not NaN the
    weights in importance-sampling remove mode."""
    cfg = landau_damping(nx=32, nparticle=4096, amp=0.0, dtype="float64",
                         verbosity=0)
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(0)))
    out = optimize.remove_particles(cfg, state, jax.random.PRNGKey(1), 0.0)
    assert np.all(np.isfinite(np.asarray(out.p)))
    np.testing.assert_array_equal(np.asarray(out.p), np.asarray(state.p))
    np.testing.assert_array_equal(np.asarray(out.live), np.asarray(state.live))


def test_optimizations_preserve_bf16_p_dtype():
    """apply_optimizations upcasts the reduced-precision p for the merge/
    remove/split arithmetic and re-quantizes once at the end — the state
    dtype (and so the jitted step's signature) must survive a scheduled
    optimization unchanged."""
    cfg = landau_damping(nx=32, nparticle=8192, amp=1e-2, dtype="float32",
                         verbosity=0)
    cfg = dataclasses.replace(cfg, bf16_weights=True)
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(3)))
    for _ in range(5):
        state = st.step(state)
    out = st.apply_optimizations(state, jax.random.PRNGKey(4),
                                 merge=0.5, remove=0.3, split=2.0)
    assert str(out.p.dtype) == "bfloat16"
    assert str(out.w.dtype) == "float32"
    # dead-slot invariant survives the round trip
    dead = ~np.asarray(out.live)
    assert np.all(np.asarray(out.p, np.float64)[dead] == 0.0)
    assert np.all(np.asarray(out.w)[dead] == 0.0)
