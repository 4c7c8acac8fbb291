"""Known-answer tests for the multirand-compatible RNG engines.

The reference runs multirand_selftest at startup comparing head/tail windows
against hard-coded sequences from canonical seeds (reference
src/multirand.F90:390-553); here the same golden data is a real unit test for
all three engines, plus distribution/buffering semantics checks.
"""

import numpy as np
import pytest

from pic1dp_tpu.rng.multirand import MultiRand


class TestGoldenSequences:
    @pytest.mark.parametrize("algorithm", [1, 2, 3])
    def test_selftest_passes(self, algorithm):
        eng = MultiRand(algorithm=algorithm, seed_type=1, warmup=0)
        assert eng.selftest() == []

    def test_kiss64_head_values(self):
        eng = MultiRand(algorithm=1, seed_type=1, warmup=0)
        eng.seeds = [0] * 20635
        eng.seeds[0:4] = [1234567890987654321, 362436362436362436,
                          1066149217761810, 123456123456123456]
        draws = [eng.int64_signed() for _ in range(3)]
        assert draws == [8932985056925012148, 5710300428094272059,
                         -104233206776033023]


class TestSeeding:
    def test_constant_seed_reproducible(self):
        a = MultiRand(algorithm=3, seed_type=1, mype=0, warmup=5)
        b = MultiRand(algorithm=3, seed_type=1, mype=0, warmup=5)
        assert [a.int64() for _ in range(20)] == [b.int64() for _ in range(20)]

    def test_rank_decorrelation(self):
        a = MultiRand(algorithm=3, seed_type=1, mype=0, warmup=5)
        b = MultiRand(algorithm=3, seed_type=1, mype=1, warmup=5)
        assert [a.int64() for _ in range(10)] != [b.int64() for _ in range(10)]

    def test_urandom_seeding_runs(self):
        eng = MultiRand(algorithm=1, seed_type=3, warmup=1)
        assert isinstance(eng.int64(), int)


class TestDistributions:
    def test_real64_range_and_mean(self):
        eng = MultiRand(algorithm=1, seed_type=1, warmup=1)
        arr = eng.real_array(4000)
        assert np.all((arr >= 0.0) & (arr <= 1.0))
        assert abs(arr.mean() - 0.5) < 0.03

    def test_gaussian_moments(self):
        eng = MultiRand(algorithm=1, seed_type=1, warmup=1)
        arr = eng.gaussian_array(4001)  # odd length exercises the carry buffer
        assert abs(arr.mean()) < 0.06
        assert abs(arr.std() - 1.0) < 0.05

    def test_gaussian_buffer_continuity(self):
        """An odd-length array leaves its pair partner buffered; the next
        draw must consume it (reference src/multirand.F90:846-881)."""
        a = MultiRand(algorithm=1, seed_type=1, warmup=1)
        b = MultiRand(algorithm=1, seed_type=1, warmup=1)
        whole = a.gaussian_array(6)
        part = np.concatenate([b.gaussian_array(3), b.gaussian_array(3)])
        np.testing.assert_allclose(whole, part, rtol=1e-15)

    def test_real_sequence_matches_engine_draws(self):
        a = MultiRand(algorithm=2, seed_type=1, warmup=1)
        b = MultiRand(algorithm=2, seed_type=1, warmup=1)
        arr = a.real_array(5)
        manual = np.array([b.real64() for _ in range(5)])
        np.testing.assert_array_equal(arr, manual)


class Test32BitVariants:
    """64 -> 2x32 split buffering (reference src/multirand.F90:576-637,
    :712-777, :806-914): low word first, the unconsumed high word carries
    over to the next 32-bit draw."""

    def test_int32_pairs_reconstruct_int64(self):
        a = MultiRand(algorithm=3, seed_type=1, warmup=1)
        b = MultiRand(algorithm=3, seed_type=1, warmup=1)
        i64 = a.int64()
        lo, hi = b.int32(), b.int32()
        assert ((hi & 0xFFFFFFFF) << 32 | (lo & 0xFFFFFFFF)) == i64
        # the third 32-bit draw starts a fresh 64-bit word
        assert (b.int32() & 0xFFFFFFFF) == (a.int64() & 0xFFFFFFFF)

    def test_real32_range_and_mean(self):
        eng = MultiRand(algorithm=1, seed_type=1, warmup=1)
        arr = eng.real_array32(4001)  # odd length exercises the carry
        assert arr.dtype == np.float32
        assert np.all((arr >= 0.0) & (arr <= 1.0))
        assert abs(arr.mean() - 0.5) < 0.03

    def test_real32_buffer_continuity(self):
        a = MultiRand(algorithm=2, seed_type=1, warmup=1)
        b = MultiRand(algorithm=2, seed_type=1, warmup=1)
        whole = a.real_array32(7)
        part = np.concatenate([[b.real32() for _ in range(3)],
                               b.real_array32(4)]).astype(np.float32)
        np.testing.assert_array_equal(whole, part)

    def test_gaussian32_moments_and_continuity(self):
        eng = MultiRand(algorithm=1, seed_type=1, warmup=1)
        arr = eng.gaussian_array32(4001)
        assert arr.dtype == np.float32
        assert abs(arr.mean()) < 0.06
        assert abs(arr.std() - 1.0) < 0.05
        a = MultiRand(algorithm=3, seed_type=1, warmup=1)
        b = MultiRand(algorithm=3, seed_type=1, warmup=1)
        whole = a.gaussian_array32(6)
        part = np.concatenate([b.gaussian_array32(3), b.gaussian_array32(3)])
        np.testing.assert_array_equal(whole, part)

    def test_int32_and_real32_share_the_carry_buffer(self):
        """real_array32 consumes a carry left by int32 (reference :741-745)."""
        a = MultiRand(algorithm=1, seed_type=1, warmup=1)
        b = MultiRand(algorithm=1, seed_type=1, warmup=1)
        lo = a.int32()              # leaves the high word buffered
        first = a.real_array32(2)[0]
        from pic1dp_tpu.rng.multirand import _i32

        b_i64 = b.int64()
        assert (lo & 0xFFFFFFFF) == (b_i64 & 0xFFFFFFFF)
        expect = np.float32(np.float32(_i32(b_i64 >> 32))
                            / np.float32(4294967295.0) + np.float32(0.5))
        assert first == expect


class TestNativeEngine:
    """The C++ engine (rng/native) must reproduce the Python oracle: integer
    and uniform streams bit-exactly; Gaussians to <= 1 ulp (libm log rounding
    differs between C++ and numpy)."""

    @pytest.fixture(scope="class")
    def native(self):
        from pic1dp_tpu.rng import native

        if not native.available():
            pytest.skip(f"no native build: {native.build_error()}")
        return native

    @pytest.mark.parametrize("algorithm", [1, 2, 3])
    def test_matches_python(self, native, algorithm):
        a = native.NativeMultiRand(algorithm=algorithm, seed_type=1, mype=3,
                                   warmup=5)
        b = MultiRand(algorithm=algorithm, seed_type=1, mype=3, warmup=5)
        assert [a.int64() for _ in range(10)] == [b.int64() for _ in range(10)]
        np.testing.assert_array_equal(a.real_array(1001), b.real_array(1001))
        np.testing.assert_allclose(a.gaussian_array(501), b.gaussian_array(501),
                                   rtol=1e-13, atol=1e-15)
        # odd-length call leaves a buffered partner; next call must consume it
        np.testing.assert_allclose(a.gaussian_array(500), b.gaussian_array(500),
                                   rtol=1e-13, atol=1e-15)

    def test_no_rank_vs_rank(self, native):
        a = native.NativeMultiRand(3, 1, None, 5)
        b = MultiRand(3, 1, None, 5)
        assert [a.int64() for _ in range(5)] == [b.int64() for _ in range(5)]


class TestReferenceUnload:
    def test_tail_unload_per_rank(self):
        """Live set must follow the reference's unload: each rank drops the
        LAST (nmax-ninit)/npe slots of its block, remainder on rank 0
        (reference src/pic1dp_particle.F90:239-248)."""
        import dataclasses

        from pic1dp_tpu.config import RngConfig, landau_damping
        from pic1dp_tpu.core.loading import load_particles

        cfg = landau_damping(nx=32, nparticle=1000, dtype="float64",
                             verbosity=0)
        cfg = dataclasses.replace(
            cfg, rng=RngConfig(backend="multirand"),
            species=(dataclasses.replace(cfg.species[0], nparticle_init=900),))
        state = load_particles(cfg, emulate_ranks=4)
        live = np.asarray(state.live[0])
        # 4 ranks x 250 slots; surplus 100 -> 25/rank, remainder 0
        blocks = live.reshape(4, 250)
        for r in range(4):
            assert blocks[r, :225].all() and not blocks[r, 225:].any(), r
        assert live.sum() == 900

    def test_selftest_knob_runs(self):
        from pic1dp_tpu.rng.native import make_multirand

        eng = make_multirand(algorithm=3, seed_type=1, mype=0, warmup=5,
                             selftest=True)
        assert eng.int64() > 0
