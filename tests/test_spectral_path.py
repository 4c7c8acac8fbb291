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


def _pallas_cases():
    """Every fused-kernel stream variant: (has_v, has_w) x equilibria."""
    from pic1dp_tpu.config import two_stream

    bot = bump_on_tail_default(nx=192, nparticle_max=4096, dtype="float64",
                               verbosity=0)
    lan = landau_damping(nx=64, nparticle=4096, dtype="float64", verbosity=0)
    yield "bot_nonlinear_deltaf", bot                        # v + w streams
    yield "landau_linear", dataclasses.replace(lan, linear=True)   # w only
    yield "landau_fullf", dataclasses.replace(
        landau_damping(nx=64, nparticle=4096, amp=1e-2, dtype="float64",
                       verbosity=0), deltaf=False)           # v only
    yield "two_stream2", two_stream(nx=64, nparticle=4096, dtype="float64",
                                    verbosity=0)
    yield "multimode", dataclasses.replace(
        lan, modes=(1, 2, 3), init_modes=(1, 2), init_amp_cos=(1e-5, 0.0),
        init_amp_sin=(1e-4, 5e-5))
    # 2 species with DIFFERENT parameters: exercises the species-fused
    # kernel's per-block constant selects (charge, mass, v0, temperature
    # all distinct so no select degenerates to a baked float)
    from pic1dp_tpu.config import Equilibrium, SpeciesConfig
    yield "two_species_maxwellian", dataclasses.replace(
        two_stream(nx=64, nparticle=4096, dtype="float64", verbosity=0),
        equilibrium=Equilibrium.MAXWELLIAN,
        species=(SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.0,
                               density=0.6, v0=2.5),
                 SpeciesConfig(charge=-0.5, mass=2.0, temperature=0.5,
                               density=0.4, v0=-3.0)))
    # mixed bump-on-tail pair with one degenerate (beamless) species: the
    # fused kernel must take the clamped-log_ratio branch for species 1
    # while species 0 keeps the full two-Gaussian ratio form
    yield "two_species_bump_mixed", dataclasses.replace(
        bump_on_tail_default(nx=64, nparticle_max=4096, dtype="float64",
                             verbosity=0),
        species=(SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.0,
                               temperature2=0.25, density=0.9, v0=4.0),
                 SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.5,
                               temperature2=0.25, density=1.0, v0=0.0)))


@pytest.mark.parametrize("name,cfg", list(_pallas_cases()),
                         ids=lambda c: c if isinstance(c, str) else "")
def test_pallas_matches_spectral(name, cfg):
    """The fused Pallas substeps (interpret mode on CPU) must reproduce the
    XLA spectral path bitwise-closely for every (linear, deltaf, equilibrium)
    stream variant — including the in-kernel recomputation of the midpoint
    positions and the single-exponential -f0'/f0 forms."""
    from pic1dp_tpu.config import DepositMethod

    cfg_p = dataclasses.replace(cfg, deposit_method=DepositMethod.PALLAS)
    st_x = Stepper(cfg)
    st_p = Stepper(cfg_p)
    assert st_p.deposit_method == DepositMethod.PALLAS
    state = st_x.initial_field(load_particles(cfg, jax.random.PRNGKey(3)))
    a, b = state, state
    for _ in range(3):
        a = st_x.step(a)
        b = st_p.step(b)
    for field in ("x", "v", "w", "mode_re", "mode_im"):
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        scale = np.max(np.abs(va)) + 1e-300
        np.testing.assert_allclose(vb / scale, va / scale, atol=1e-12,
                                   err_msg=f"{name}:{field}")


@pytest.mark.parametrize("modes", [(1,), (1, 2, 3)],
                         ids=["single", "multimode-recurrence"])
def test_pallas_f32_poly_trig_matches_xla(modes):
    """The f32 hot path replaces Mosaic's generic sin/cos with exact-quadrant
    degree-5 polynomials (max err ~2e-7, a few f32 ulp; extra modes via the
    angle-addition recurrence, ~3e-7 error per mode unit).  Against the XLA
    f32 spectral path the per-step divergence must stay at trig-roundoff
    level."""
    from pic1dp_tpu.config import DepositMethod

    cfg = bump_on_tail_default(nx=192, nparticle_max=8192, dtype="float32",
                               verbosity=0)
    if len(modes) > 1:
        cfg = dataclasses.replace(cfg, modes=modes, init_modes=(1, 2),
                                  init_amp_cos=(1e-5, 0.0),
                                  init_amp_sin=(1e-4, 5e-5))
    cfg_p = dataclasses.replace(cfg, deposit_method=DepositMethod.PALLAS)
    st_x, st_p = Stepper(cfg), Stepper(cfg_p)
    state = st_x.initial_field(load_particles(cfg, jax.random.PRNGKey(5)))
    a, b = state, state
    for _ in range(5):
        a = st_x.step(a)
        b = st_p.step(b)
    np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v),
                               rtol=0, atol=1e-5)
    scale = np.max(np.abs(np.asarray(a.w))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.w) / scale,
                               np.asarray(a.w) / scale, rtol=0, atol=1e-4)


def test_pallas_bump_on_tail_degenerate_density():
    """density=1.0 (pure core) / 0.0 (pure beam) collapse the two-Gaussian
    ratio form to a single Maxwellian; the log in the ratio constant must
    not domain-error and the kernel must match the XLA path."""
    from pic1dp_tpu.config import DepositMethod, SpeciesConfig

    for density in (1.0, 0.0):
        cfg = bump_on_tail_default(nx=64, nparticle_max=2048, dtype="float64",
                                   verbosity=0)
        sp = dataclasses.replace(cfg.species[0], density=density)
        cfg = dataclasses.replace(cfg, species=(sp,))
        cfg_p = dataclasses.replace(cfg, deposit_method=DepositMethod.PALLAS)
        st_x, st_p = Stepper(cfg), Stepper(cfg_p)
        state = st_x.initial_field(load_particles(cfg, jax.random.PRNGKey(7)))
        a = st_x.step(st_x.step(state))
        b = st_p.step(st_p.step(state))
        scale = np.max(np.abs(np.asarray(a.w))) + 1e-300
        np.testing.assert_allclose(np.asarray(b.w) / scale,
                                   np.asarray(a.w) / scale, atol=1e-12,
                                   err_msg=f"density={density}")


def test_bf16_weights_matches_f32():
    """cfg.bf16_weights quantizes ONLY the p storage and the intra-step w1
    stream (docs/performance.md error budget): after one step x must be
    bitwise-identical to the f32 run (the position update never touches p or
    w1), v agrees to field-perturbation level, and w within the ~0.4%/step
    quantization budget.  Dtypes: p bfloat16, everything else f32."""
    from pic1dp_tpu.config import DepositMethod

    cfg = bump_on_tail_default(nx=192, nparticle_max=4096, dtype="float32",
                               deposit_method=DepositMethod.PALLAS,
                               verbosity=0)
    cfg_b = dataclasses.replace(cfg, bf16_weights=True)
    st, st_b = Stepper(cfg), Stepper(cfg_b)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(11)))
    state_b = st_b.initial_field(load_particles(cfg_b, jax.random.PRNGKey(11)))
    assert str(state_b.p.dtype) == "bfloat16"
    assert str(state_b.w.dtype) == "float32"
    # identical markers modulo the p quantization
    np.testing.assert_array_equal(np.asarray(state_b.x), np.asarray(state.x))
    np.testing.assert_allclose(
        np.asarray(state_b.p, np.float64), np.asarray(state.p, np.float64),
        rtol=5e-3)

    a, b = st.step(state), st_b.step(state_b)
    assert str(b.p.dtype) == "bfloat16" and str(b.w.dtype) == "float32"
    np.testing.assert_array_equal(np.asarray(b.x), np.asarray(a.x))
    np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v),
                               rtol=0, atol=1e-5)
    for _ in range(2):
        a, b = st.step(a), st_b.step(b)
    scale = np.max(np.abs(np.asarray(a.w))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.w) / scale,
                               np.asarray(a.w) / scale, rtol=0, atol=2e-2)
    scale = np.max(np.abs(np.asarray(a.mode_re))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.mode_re) / scale,
                               np.asarray(a.mode_re) / scale,
                               rtol=0, atol=2e-2)


def test_packed_matches_separate_bf16_streams():
    """The packed p||w1 f32 layout (ops/pallas_kernels.pack_pw) must be
    BITWISE identical to the separate bf16-stream layout: the in-register
    RTNE (bits + 0x7fff + lsb) is exactly .astype(bfloat16), and the p
    halves are the p bits.  Same quantized physics, different DMA layout."""
    from pic1dp_tpu.config import DepositMethod

    cfg = bump_on_tail_default(nx=192, nparticle_max=4096, dtype="float32",
                               deposit_method=DepositMethod.PALLAS,
                               bf16_weights=True, verbosity=0)
    st_packed = Stepper(cfg)
    assert st_packed._packed
    import os

    os.environ["PIC1DP_PACKED"] = "0"
    try:
        st_sep = Stepper(cfg)
    finally:
        del os.environ["PIC1DP_PACKED"]
    assert not st_sep._packed
    state = st_packed.initial_field(load_particles(cfg, jax.random.PRNGKey(17)))
    a, b = state, state
    for _ in range(3):
        a = st_packed.step(a)
        b = st_sep.step(b)
    for field in ("x", "v", "w", "mode_re", "mode_im"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            err_msg=field)
    assert str(a.p.dtype) == "bfloat16"  # single-step entry restores p


def test_packed_multi_step_matches_per_step():
    """The packed-carry lax.scan (pack once, stream refreshed in place)
    must equal per-step stepping exactly — extends the chunked-vs-per-step
    pin (test_tools.py) to the bf16_weights configuration."""
    from pic1dp_tpu.config import DepositMethod

    cfg = bump_on_tail_default(nx=192, nparticle_max=4096, dtype="float32",
                               deposit_method=DepositMethod.PALLAS,
                               bf16_weights=True, verbosity=0)
    st = Stepper(cfg)
    assert st._packed and st._packed_scan_ok(cfg.nparticle_max)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(19)))
    a = st.make_multi_step(4)(state)
    b = state
    for _ in range(4):
        b = st.step(b)
    for field in ("x", "v", "p", "w", "mode_re", "mode_im"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            err_msg=field)


def test_flat_carry_multi_step_matches_per_step_two_species():
    """make_multi_step flattens the Pallas scan carry to (ns*N,) — a
    (ns, N) array on TPU sublane-pads the species dim and pays a physical
    relayout per kernel call (2.6x step time at ns = 2, docs/performance.md
    round 4).  The flat scan must equal per-step (ns, N) stepping exactly,
    including the multi-species packed stream."""
    import dataclasses

    from pic1dp_tpu.config import DepositMethod, Equilibrium, SpeciesConfig

    sp = SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.0, density=0.5,
                       v0=2.0)
    cfg = dataclasses.replace(
        bump_on_tail_default(nx=64, nparticle_max=4096, dtype="float32",
                             deposit_method=DepositMethod.PALLAS,
                             bf16_weights=True, verbosity=0),
        equilibrium=Equilibrium.MAXWELLIAN,
        species=(sp, dataclasses.replace(sp, v0=-2.0))).validate()
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(23)))
    assert state.x.shape == (2, 4096)
    a = st.make_multi_step(3)(state)
    b = state
    for _ in range(3):
        b = st.step(b)
    for field in ("x", "v", "p", "w", "mode_re", "mode_im"):
        va = np.asarray(getattr(a, field))
        np.testing.assert_array_equal(va, np.asarray(getattr(b, field)),
                                      err_msg=field)
        assert va.shape == np.asarray(getattr(state, field)).shape


def test_bf16_weights_xla_fallback_matches():
    """Capacities that miss the 2048 granularity fall back to the XLA
    spectral path, which reads the bf16 p through ordinary promotion — the
    run must still work and stay close to its f32 twin."""
    cfg = bump_on_tail_default(nx=64, nparticle_max=3072, dtype="float32",
                               verbosity=0)
    cfg_b = dataclasses.replace(cfg, bf16_weights=True)
    st, st_b = Stepper(cfg), Stepper(cfg_b)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(13)))
    state_b = st_b.initial_field(load_particles(cfg_b, jax.random.PRNGKey(13)))
    a, b = st.step(state), st_b.step(state_b)
    assert str(b.p.dtype) == "bfloat16"
    np.testing.assert_array_equal(np.asarray(b.x), np.asarray(a.x))
    scale = np.max(np.abs(np.asarray(a.w))) + 1e-30
    np.testing.assert_allclose(np.asarray(b.w) / scale,
                               np.asarray(a.w) / scale, rtol=0, atol=1e-2)


def test_sincos_turns_raw_accuracy():
    """_sincos_turns_raw (fused range-reduction quadrant trig, the VPU-bound
    hot-loop chain) must match exact cos/sin(2*pi*t) to the same <~1 f32 ulp
    bound as the original _sincos_turns for every realizable hot-loop angle
    tm = m*ix0/nx (integer ix0), plus a dense irrational-t sweep."""
    import jax.numpy as jnp
    import numpy as np

    from pic1dp_tpu.ops.pallas_kernels import _sincos_turns, _sincos_turns_raw

    cases = []
    for nx in (64, 192, 1024):
        for m in (1, 2, 3, 4, 7, 8):
            ix0 = np.arange(nx, dtype=np.float32)
            cases.append(ix0 * np.float32(m / nx))
    cases.append(np.linspace(0.0, 7.999, 40001).astype(np.float32))
    tm = np.concatenate(cases)
    c_raw, s_raw = (np.asarray(v) for v in _sincos_turns_raw(jnp.asarray(tm)))
    # f64 reference at the EXACT f32 argument
    ref_c = np.cos(2.0 * np.pi * tm.astype(np.float64))
    ref_s = np.sin(2.0 * np.pi * tm.astype(np.float64))
    ulp = 1.2e-7
    assert np.max(np.abs(c_raw - ref_c)) < 2 * ulp
    assert np.max(np.abs(s_raw - ref_s)) < 2 * ulp
    # no worse than the original two-floor chain on its own domain
    t_in = tm - np.floor(tm)
    c_old, s_old = (np.asarray(v)
                    for v in _sincos_turns(jnp.asarray(t_in.astype(np.float32))))
    assert np.max(np.abs(c_raw - ref_c)) <= np.max(np.abs(c_old - ref_c)) + ulp
    assert np.max(np.abs(s_raw - ref_s)) <= np.max(np.abs(s_old - ref_s)) + ulp


def test_bf16_misaligned_pallas_raises_without_optin():
    """A bf16_weights config whose per-trace particle length misses the 2048
    granularity must FAIL loudly instead of silently taking the XLA fallback
    (which skips the w1-stream quantization — same config, different physics
    rounding per shard size).  allow_pallas_fallback=True opts into the
    fallback explicitly, with the warning."""
    import pytest

    from pic1dp_tpu.config import DepositMethod

    cfg = bump_on_tail_default(nx=64, nparticle_max=3072, dtype="float32",
                               deposit_method=DepositMethod.PALLAS,
                               bf16_weights=True, verbosity=0)
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(5)))
    with pytest.raises(ValueError, match="allow_pallas_fallback"):
        st.step(state)
    # multi-step scan path hits the same gate
    with pytest.raises(ValueError, match="allow_pallas_fallback"):
        st.make_multi_step(2)(state)

    cfg_ok = dataclasses.replace(cfg, allow_pallas_fallback=True)
    st_ok = Stepper(cfg_ok)
    state_ok = st_ok.initial_field(load_particles(cfg_ok, jax.random.PRNGKey(5)))
    with pytest.warns(RuntimeWarning, match="falling back"):
        out = st_ok.step(state_ok)
    assert np.isfinite(np.asarray(out.w)).all()


def test_stacked_carry_knob_matches_flat():
    """PIC1DP_FLAT_CARRY=0 (the multispecies-bench A/B knob that keeps the
    stacked (ns, N) scan carry) must be physics-identical to the default
    flat (ns*N,) carry — the 2.71x difference is layout cost only."""
    import os

    from pic1dp_tpu.config import DepositMethod, Equilibrium, SpeciesConfig

    sp = SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.0, density=0.5,
                       v0=2.0)
    from pic1dp_tpu.config import bump_on_tail_default as _bot

    cfg = dataclasses.replace(
        _bot(nx=64, nparticle_max=2048, dtype="float32",
             deposit_method=DepositMethod.PALLAS, verbosity=0),
        equilibrium=Equilibrium.MAXWELLIAN,
        species=(sp, dataclasses.replace(sp, v0=-2.0))).validate()
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(3)))
    a = st.make_multi_step(3)(state)
    os.environ["PIC1DP_FLAT_CARRY"] = "0"
    try:
        b = Stepper(cfg).make_multi_step(3)(state)
    finally:
        del os.environ["PIC1DP_FLAT_CARRY"]
    for field in ("x", "v", "w", "mode_re", "mode_im"):
        np.testing.assert_array_equal(np.asarray(getattr(a, field)),
                                      np.asarray(getattr(b, field)),
                                      err_msg=field)


def test_bf16_shifted_multispecies_warns():
    """bf16_weights + multiple strongly shifted species has a measured
    post-saturation divergence (docs/performance.md round 5) — Stepper
    construction must warn; the equivalent composite single-species config
    must NOT."""
    import warnings

    from pic1dp_tpu.config import (DepositMethod, Equilibrium, SpeciesConfig,
                                   two_stream)

    sp = SpeciesConfig(charge=-1.0, mass=1.0, temperature=1.0, density=0.5,
                       v0=3.0)
    cfg = dataclasses.replace(
        two_stream(nparticle=4096, dtype="float32", verbosity=0,
                   deposit_method=DepositMethod.PALLAS),
        equilibrium=Equilibrium.MAXWELLIAN,
        species=(sp, dataclasses.replace(sp, v0=-3.0)),
        bf16_weights=True).validate()
    with pytest.warns(RuntimeWarning, match="strongly shifted"):
        Stepper(cfg)
    cfg_comp = two_stream(nparticle=4096, dtype="float32", verbosity=0,
                          deposit_method=DepositMethod.PALLAS,
                          bf16_weights=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Stepper(cfg_comp)  # composite single-species: no warning


def test_f32_config_stays_f32_under_x64():
    """TPU-equivalence guarantee: with jax_enable_x64 on (the CPU test
    environment), a dtype=float32 config must produce float32 state through
    the XLA spectral path — otherwise the "f32 path" tested on CPU is not
    the f32 path that runs on TPU (the reference's PetscReal is a single
    global kind, src/pic1dp_global.F90:28-31; ours must be just as airtight).
    Guards against np.float64 scalar constants promoting a jitted chain
    (the round-1 mode_trig bug)."""
    assert jax.config.jax_enable_x64
    cfg = bump_on_tail_default(nx=192, nparticle_max=4096, dtype="float32",
                               verbosity=0)
    st = Stepper(cfg)
    state = st.initial_field(load_particles(cfg, jax.random.PRNGKey(17)))
    for _ in range(2):
        state = st.step(state)
    for field in ("x", "v", "p", "w", "mode_re", "mode_im", "electric", "rho"):
        assert str(getattr(state, field).dtype) == "float32", field
    # the fused push pair (used by the scheduled-optimization path) too
    out = jax.jit(st.push_pair)(state)
    for field in ("x", "v", "p", "w"):
        assert str(getattr(out, field).dtype) == "float32", field


def test_twolevel_stepper_matches_spectral():
    """A MATRIX_FREE run forced onto the TWOLEVEL grid-deposit/gather pair
    agrees with the spectral hot path to f64 roundoff — the factorized
    one-hot is the same S / S^T operator."""
    from pic1dp_tpu.config import DepositMethod

    cfg = landau_damping(nx=256, nparticle=30000, dtype="float64",
                         verbosity=0)
    cfg_tl = dataclasses.replace(cfg, deposit_method=DepositMethod.TWOLEVEL)
    st_s, st_t = Stepper(cfg), Stepper(cfg_tl)
    assert st_t.deposit_method == DepositMethod.TWOLEVEL
    state = st_s.initial_field(load_particles(cfg, jax.random.PRNGKey(2)))
    a = b = state
    for _ in range(5):
        a = st_s.step(a)
        b = st_t.step(b)
    for field in ("x", "v", "w", "mode_re", "mode_im", "electric"):
        va, vb = np.asarray(getattr(a, field)), np.asarray(getattr(b, field))
        scale = np.max(np.abs(vb)) + 1e-300
        np.testing.assert_allclose(va / scale, vb / scale, atol=1e-12,
                                   err_msg=field)


def test_stream_v1_bitwise_matches_recompute(monkeypatch):
    """stream_v1 (the round-3 default: substep 1 streams the midpoint
    velocities, substep 2 reads them instead of re-deriving) must be
    BITWISE identical to the recompute layout — the streamed value is the
    same expression over the same inputs with the same baked constants
    (ops/pallas_kernels.py make_substep_call docstring)."""
    from pic1dp_tpu.config import DepositMethod

    cfg = bump_on_tail_default(nx=192, nparticle_max=4096, dtype="float32",
                               deposit_method=DepositMethod.PALLAS,
                               verbosity=0)
    monkeypatch.setenv("PIC1DP_STREAM_V1", "1")
    st_v1 = Stepper(cfg)
    assert st_v1._stream_v1
    monkeypatch.setenv("PIC1DP_STREAM_V1", "0")
    st_rc = Stepper(cfg)
    monkeypatch.delenv("PIC1DP_STREAM_V1")
    assert not st_rc._stream_v1
    state = st_v1.initial_field(load_particles(cfg, jax.random.PRNGKey(19)))
    a, b = state, state
    for _ in range(3):
        a = st_v1.step(a)
        b = st_rc.step(b)
    for field in ("x", "v", "w", "mode_re", "mode_im"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            err_msg=field)
