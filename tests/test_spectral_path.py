"""The matrix-free spectral hot path (cfg.shape = MATRIX_FREE) must agree
with the explicit grid-histogram path (EXPLICIT) to float64 roundoff: hat
deposition followed by the partial DFT is linear, so accumulating mode
projections per particle is the same operator as deposit-to-grid +
MatMultTranspose (reference src/pic1dp_interaction.F90:96-135 +
src/pic1dp_field.F90:230-240), differing only in summation order."""

import dataclasses

import jax
import numpy as np
import pytest

from pic1dp_tpu.config import ParticleShape, bump_on_tail_default, landau_damping
from pic1dp_tpu.core.loading import load_particles
from pic1dp_tpu.core.step import Stepper


def _cases():
    yield "bump_on_tail", bump_on_tail_default(
        nx=192, nparticle_max=40000, dtype="float64", verbosity=0)
    yield "landau", landau_damping(
        nx=64, nparticle=30000, dtype="float64", verbosity=0)
    yield "landau_linear", dataclasses.replace(
        landau_damping(nx=64, nparticle=30000, dtype="float64", verbosity=0),
        linear=True)
    yield "multimode", dataclasses.replace(
        landau_damping(nx=64, nparticle=30000, dtype="float64", verbosity=0),
        modes=(1, 2, 3), init_modes=(1, 2), init_amp_cos=(1e-5, 0.0),
        init_amp_sin=(1e-4, 5e-5))


@pytest.mark.parametrize("name,cfg", list(_cases()), ids=lambda c: c if isinstance(c, str) else "")
def test_spectral_matches_grid(name, cfg):
    cfg_grid = dataclasses.replace(cfg, shape=ParticleShape.EXPLICIT)
    st_s = Stepper(cfg)
    st_g = Stepper(cfg_grid)
    state = st_s.initial_field(load_particles(cfg, jax.random.PRNGKey(0)))
    a = b = state
    for _ in range(5):
        a = st_s.step(a)
        b = st_g.step(b)
    for field in ("x", "v", "w", "mode_re", "mode_im", "electric"):
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        scale = np.max(np.abs(vb)) + 1e-300
        np.testing.assert_allclose(va / scale, vb / scale, atol=1e-12,
                                   err_msg=f"{name}:{field}")


def test_push_pair_spectral_matches_grid():
    cfg = landau_damping(nx=64, nparticle=30000, dtype="float64", verbosity=0)
    cfg_grid = dataclasses.replace(cfg, shape=ParticleShape.EXPLICIT)
    st_s, st_g = Stepper(cfg), Stepper(cfg_grid)
    state = st_s.initial_field(load_particles(cfg, jax.random.PRNGKey(1)))
    a = jax.jit(st_s.push_pair)(state)
    b = jax.jit(st_g.push_pair)(state)
    for field in ("x", "v", "w"):
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        scale = np.max(np.abs(vb)) + 1e-300
        np.testing.assert_allclose(va / scale, vb / scale, atol=1e-12)


def test_multi_step_matches_python_loop():
    cfg = landau_damping(nx=64, nparticle=20000, dtype="float64", verbosity=0)
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(2)))
    a = st.make_multi_step(4)(state)
    b = state
    for _ in range(4):
        b = st.step(b)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=0)
    np.testing.assert_allclose(np.asarray(a.electric), np.asarray(b.electric),
                               atol=1e-300)
