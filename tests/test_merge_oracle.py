"""Merge-semantics equivalence vs the reference's streaming algorithm.

The reference merges with capacity-2 streaming bins: particles are scanned
in slot order, eligible ones (|delta f| at the particle below thsh * max)
are binned by (ix, iv, sign w); the second arrival in a bin merges into the
FIRST member's slot (w-weighted x, v; summed p, w), the freed slot is
backfilled with the last live particle (which is then re-processed), and the
bin resets (src/pic1dp_particle.F90:411-522).  The repo's batch merge
(pic1dp_tpu/core/optimize.py::merge_particles) sorts by bin key and pairs
positionally instead.

Equivalences pinned here:

1. When backfilling cannot interfere (the tail of the array is ineligible),
   stream order == index order, so the pairings are identical and the two
   algorithms produce the SAME multiset of live particles — for <= 2 AND
   > 2 eligible particles per bin.
2. In general (random data, backfill interference allowed), the pairing may
   differ but is constrained: every eligible particle visits its bin exactly
   once, so merges-per-bin = floor(arrivals / 2) regardless of order; and a
   merged particle stays inside its (ix, iv, sign) cell (w-weighted convex
   combination of same-cell members).  Hence the live count, the per-bin
   sums of p and w, and the w-weighted x / v first moments must all match
   exactly — a test that fails if the batch merge ever biases the
   distribution.
"""

import dataclasses

import jax
import numpy as np

from pic1dp_tpu.config import landau_damping
from pic1dp_tpu.core import optimize as opt
from pic1dp_tpu.core.state import SimState


# ---------------------------------------------------------------------------
# numpy oracle: the reference's streaming capacity-2 bin merge
# (behavioral reimplementation of src/pic1dp_particle.F90:411-522)
# ---------------------------------------------------------------------------

def _df_at(profile, v, v_max, nv):
    """|delta f| interpolated to one particle with edge clamping
    (reference :455-466)."""
    s = (v + v_max) / (2.0 * v_max) * (nv - 1)
    iv = int(np.floor(s))
    if iv < 0:
        return profile[0]
    if iv >= nv - 1:
        return profile[nv - 1]
    frac_hi = s - iv
    return profile[iv] * (1.0 - frac_hi) + profile[iv + 1] * frac_hi


def reference_merge(x, v, p, w, profile, thsh, lx, nx, v_max, nv):
    """Streaming merge on compacted arrays; returns the compacted arrays of
    the surviving particles (np' <= np)."""
    x, v, p, w = (np.array(a, dtype=np.float64) for a in (x, v, p, w))
    n = len(x)
    df_thsh = profile.max() * thsh
    # bins hold the slot index of their single waiting member, or -1
    waiting = -np.ones((nx, nv, 2), dtype=np.int64)
    ip = 0
    while ip < n:
        df = _df_at(profile, v[ip], v_max, nv)
        if df >= df_thsh:
            ip += 1
            continue
        xp = x[ip] % lx
        if xp < 0.0:
            xp += lx
        x[ip] = xp
        ix = int(np.floor(xp / lx * nx))
        s = (v[ip] + v_max) / (2.0 * v_max) * (nv - 1)
        iv = min(max(int(np.floor(s)), 0), nv - 1)
        iw = 1 if w[ip] > 0.0 else 0
        if waiting[ix, iv, iw] < 0:
            waiting[ix, iv, iw] = ip
            ip += 1
        else:
            ip1 = waiting[ix, iv, iw]
            tot = w[ip1] + w[ip]
            x[ip1] = (w[ip1] * x[ip1] + w[ip] * x[ip]) / tot
            v[ip1] = (w[ip1] * v[ip1] + w[ip] * v[ip]) / tot
            p[ip1] += p[ip]
            w[ip1] += w[ip]
            # backfill the freed slot with the last particle; re-process it
            if ip < n - 1:
                x[ip], v[ip], p[ip], w[ip] = x[n - 1], v[n - 1], p[n - 1], w[n - 1]
            n -= 1
            waiting[ix, iv, iw] = -1
    return x[:n], v[:n], p[:n], w[:n]


# ---------------------------------------------------------------------------
# shared scaffolding
# ---------------------------------------------------------------------------

def _make_state(cfg, x, v, p, w):
    n = len(x)
    z = np.zeros
    return SimState(
        x=np.asarray([x]), v=np.asarray([v]), p=np.asarray([p]),
        w=np.asarray([w]), live=np.ones((1, n), bool),
        rho=z(cfg.nx), electric=z(cfg.nx),
        mode_re=z(cfg.nmode), mode_im=z(cfg.nmode))


def _batch_merge(cfg, state, thsh):
    out = jax.jit(lambda s: opt.merge_particles(cfg, s, thsh))(state)
    live = np.asarray(out.live[0])
    return tuple(np.asarray(getattr(out, f)[0])[live] for f in "xvpw")


def _profile_of(cfg, state):
    from pic1dp_tpu.core.diagnostics import dist_pertb_abs_v

    return np.asarray(dist_pertb_abs_v(
        np.asarray(state.v), np.asarray(state.w), np.asarray(state.live),
        cfg.v_max, cfg.nv, chunk=state.x.shape[1]))[0]


def _sorted_tuples(arrs):
    return np.array(sorted(zip(*(np.round(a, 12) for a in arrs))))


def _cells(cfg, x, v, w):
    ix = np.clip(np.floor(x / cfg.lx * cfg.nx).astype(int), 0, cfg.nx - 1)
    s = (v + cfg.v_max) / (2 * cfg.v_max) * (cfg.nv - 1)
    iv = np.clip(np.floor(s).astype(int), 0, cfg.nv - 1)
    return (np.where(w > 0, 1, 0) * cfg.nv + iv) * cfg.nx + ix


def _per_bin_sums(cfg, x, v, p, w):
    cells = _cells(cfg, x, v, w)
    nbins = 2 * cfg.nv * cfg.nx
    return (np.bincount(cells, weights=p, minlength=nbins),
            np.bincount(cells, weights=w, minlength=nbins),
            np.bincount(cells, weights=w * x, minlength=nbins),
            np.bincount(cells, weights=w * v, minlength=nbins))


def _random_particles(rng, n, cfg, w_scale=1.0):
    x = rng.uniform(0, cfg.lx, n)
    v = rng.uniform(-cfg.v_max, cfg.v_max, n)
    p = rng.uniform(0.5, 1.5, n)
    w = rng.normal(0, w_scale, n)
    return x, v, p, w


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _cfg():
    return landau_damping(nx=8, nparticle=1024, dtype="float64", verbosity=0,
                          nv=8)


def test_merge_identical_when_no_backfill_interference():
    """Ineligible tail => stream order == index order => the batch merge and
    the reference stream produce the same multiset of live particles, with
    both <= 2 and > 2 eligible particles per bin."""
    cfg = _cfg()
    rng = np.random.default_rng(3)
    n = 256
    x, v, p, w = _random_particles(rng, n, cfg)
    # make the tail ineligible: huge |w| at a far velocity cell dominates
    # the profile there, so df at those particles is >= the threshold
    v[-64:] = cfg.v_max * 0.99
    w[-64:] = 50.0
    state = _make_state(cfg, x, v, p, w)
    profile = _profile_of(cfg, state)
    thsh = 0.5

    xo, vo, po, wo = reference_merge(
        x, v, p, w, profile, thsh, cfg.lx, cfg.nx, cfg.v_max, cfg.nv)
    xb, vb, pb, wb = _batch_merge(cfg, state, thsh)

    assert len(xo) < n, "test must actually merge something"
    assert len(xo) == len(xb)
    a = _sorted_tuples((xo, vo, po, wo))
    b = _sorted_tuples((xb, vb, pb, wb))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-11)
    # > 2 per bin genuinely occurred (coarse 8x8 grid, 192 eligible markers)
    cells = _cells(cfg, x[:-64], v[:-64], w[:-64])
    assert np.max(np.bincount(cells)) > 2


def test_merge_invariants_under_backfill_interference():
    """Fully random data (backfilled particles may re-enter bins mid-stream):
    pairings may differ, but the live count, per-bin p/w sums, and w-weighted
    x/v moments must match the reference exactly."""
    cfg = _cfg()
    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = 512
        x, v, p, w = _random_particles(rng, n, cfg)
        state = _make_state(cfg, x, v, p, w)
        profile = _profile_of(cfg, state)
        thsh = 0.9  # nearly everything eligible -> heavy backfill traffic

        xo, vo, po, wo = reference_merge(
            x, v, p, w, profile, thsh, cfg.lx, cfg.nx, cfg.v_max, cfg.nv)
        xb, vb, pb, wb = _batch_merge(cfg, state, thsh)

        assert len(xo) < n
        assert len(xo) == len(xb), (seed, len(xo), len(xb))
        for qo, qb in zip(_per_bin_sums(cfg, xo, vo, po, wo),
                          _per_bin_sums(cfg, xb, vb, pb, wb)):
            np.testing.assert_allclose(qo, qb, rtol=0, atol=1e-11)


def test_merge_conserves_totals():
    """Both algorithms conserve total p, total w, and the w-weighted x / v
    first moments exactly (each pair merge is constructed to)."""
    cfg = _cfg()
    rng = np.random.default_rng(11)
    x, v, p, w = _random_particles(rng, 512, cfg)
    state = _make_state(cfg, x, v, p, w)
    profile = _profile_of(cfg, state)
    xb, vb, pb, wb = _batch_merge(cfg, state, 0.9)
    np.testing.assert_allclose(pb.sum(), p.sum(), rtol=1e-12)
    np.testing.assert_allclose(wb.sum(), w.sum(), rtol=1e-12)
    np.testing.assert_allclose((wb * xb).sum(), (w * x).sum(), rtol=1e-11)
    np.testing.assert_allclose((wb * vb).sum(), (w * v).sum(), rtol=1e-11)
