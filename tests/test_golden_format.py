"""Golden-byte pin of the pic1dp.out on-disk format.

The repo's writer/reader pair (io/writer.py, analysis/output_data.py) is
round-tripped elsewhere (tests/test_tools.py) — but a pair can drift
together.  This module pins the ABSOLUTE byte layout against the reference's
format, independent of both:

  * `_golden_bytes()` builds a one-snapshot stream from the format spec
    alone (raw big-endian struct packing; no pic1dp_tpu imports):
    PetscViewerBinaryWriteInt -> raw >i4, WriteReal/WriteScalar -> raw >f8,
    VecView -> >i4 classid 1211214 + >i4 length + >f8 data, record order of
    reference src/pic1dp_output.F90:68-92 (header), :173-187 (field
    snapshot), :456-474 (six distribution arrays per species), as consumed
    by reference tools/XPetscBinaryIO.py:23-71 + tools/OutputData.py:28-79.
  * `tests/fixtures/golden_pic1dp.out` is the same stream committed as a
    binary file, so the expected bytes cannot drift with this test.

Tests: fixture == spec bytes; SnapshotWriter reproduces them byte-for-byte
from the same logical inputs; OutputData parses them to the known values.
"""

import os
import struct

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_pic1dp.out")

# ---- the golden case: 1 species, 2 kept modes (1, 3), tiny grids ----
NSPECIES, NX, NV, NX_OPD, NV_OPD = 1, 4, 8, 2, 3
MODES = (1, 3)
LX, V_MAX = 6.283185307179586, 5.0
TIME, E_FIELD = 0.25, 1.5e-3
MARKER, TOTAL, PERTB = 2.0, 3.0, 0.5
MODE_RE, MODE_IM = (0.1, -0.2), (0.3, 0.4)
ELECTRIC = (1.0, -1.0, 0.5, -0.5)
RHO = (0.25, 0.5, -0.25, -0.5)
# xv arrays flattened iv * nx_opd + ix (reference src/pic1dp_output.F90:
# 252-298 fills (ix, iv) but writes the Fortran array column-major, which
# equals C row-major over (iv, ix))
MARKR_XV = tuple(0.1 * i for i in range(1, 7))
TOTAL_XV = tuple(0.1 * i for i in range(7, 13))
PERTB_XV = tuple(0.1 * i for i in range(13, 19))
MARKR_V, TOTAL_V, PERTB_V = (0.1, 0.2, 0.3), (0.4, 0.5, 0.6), (0.7, 0.8, 0.9)

VEC_CLASSID = 1211214  # PETSc VEC_FILE_CLASSID


def _golden_bytes() -> bytes:
    """The byte stream, from the format spec only (no pic1dp_tpu imports)."""
    def ints(*v):
        return struct.pack(f">{len(v)}i", *v)

    def reals(*v):
        return struct.pack(f">{len(v)}d", *v)

    def vec(values):
        return ints(VEC_CLASSID, len(values)) + reals(*values)

    out = ints(NSPECIES, len(MODES), NX, NV, NX_OPD, NV_OPD, *MODES)
    out += reals(LX, V_MAX)
    # one snapshot
    out += reals(TIME, E_FIELD, MARKER, TOTAL, PERTB)
    out += vec(MODE_RE) + vec(MODE_IM) + vec(ELECTRIC) + vec(RHO)
    out += reals(*MARKR_XV) + reals(*TOTAL_XV) + reals(*PERTB_XV)
    out += reals(*MARKR_V) + reals(*TOTAL_V) + reals(*PERTB_V)
    return out


def test_fixture_matches_spec_bytes():
    with open(FIXTURE, "rb") as fh:
        assert fh.read() == _golden_bytes()


def test_writer_reproduces_golden_bytes(tmp_path):
    """io/writer.py must emit the exact reference byte stream from the same
    logical inputs — endianness, classid, record order all pinned."""
    from pic1dp_tpu.config import Config, SpeciesConfig
    from pic1dp_tpu.core.diagnostics import Energies, PtclDist
    from pic1dp_tpu.io.writer import SnapshotWriter

    cfg = Config(species=(SpeciesConfig(),), modes=MODES, nx=NX, nv=NV,
                 nx_opd=NX_OPD, nv_opd=NV_OPD, lx=LX, v_max=V_MAX)
    w = SnapshotWriter(cfg, str(tmp_path))
    eng = Energies(field=np.float64(E_FIELD),
                   marker=np.array([MARKER]), total=np.array([TOTAL]),
                   pertb=np.array([PERTB]))
    ptcl = PtclDist(
        markr_xv=np.asarray(MARKR_XV).reshape(1, NV_OPD, NX_OPD),
        total_xv=np.asarray(TOTAL_XV).reshape(1, NV_OPD, NX_OPD),
        pertb_xv=np.asarray(PERTB_XV).reshape(1, NV_OPD, NX_OPD),
        markr_v=np.asarray(MARKR_V).reshape(1, NV_OPD),
        total_v=np.asarray(TOTAL_V).reshape(1, NV_OPD),
        pertb_v=np.asarray(PERTB_V).reshape(1, NV_OPD))
    w.write_snapshot(TIME, eng, np.asarray(MODE_RE), np.asarray(MODE_IM),
                     np.asarray(ELECTRIC), np.asarray(RHO), ptcl)
    w.close()
    with open(tmp_path / "pic1dp.out", "rb") as fh:
        produced = fh.read()
    assert produced == _golden_bytes()


def test_reader_parses_golden_fixture():
    """analysis/output_data.py must decode the committed fixture to the
    known values (header fields, scalar rows, modes, fields, dists)."""
    from pic1dp_tpu.analysis.output_data import OutputData

    od = OutputData(FIXTURE)
    assert (od.nspecies, od.nmode, od.nx, od.nv) == (NSPECIES, 2, NX, NV)
    assert (od.nx_pd, od.nv_pd) == (NX_OPD, NV_OPD)
    assert tuple(od.mode) == MODES
    assert od.lx == LX and od.v_max == V_MAX
    assert od.ntime == 1

    sc = od.get_scalar_t()
    # rows: time, field, (marker, total, pertb), (summed marker/total/pertb)
    np.testing.assert_allclose(
        sc[:, 0], [TIME, E_FIELD, MARKER, TOTAL, PERTB,
                   MARKER, TOTAL, PERTB], rtol=0, atol=0)

    mt = od.get_mode_t()
    np.testing.assert_allclose(mt[:, 0], [*MODE_RE, *MODE_IM], rtol=0)

    fx = od.get_field_x(0)
    np.testing.assert_allclose(fx[0], [*ELECTRIC, ELECTRIC[0]], rtol=0)
    np.testing.assert_allclose(fx[1], [*RHO, RHO[0]], rtol=0)

    xv = od.get_ptcldist_xv(0, 0, 2, periodicbound=False)
    np.testing.assert_allclose(
        xv, np.asarray(PERTB_XV).reshape(NV_OPD, NX_OPD), rtol=0)
    xv_p = od.get_ptcldist_xv(0, 0, 0)  # periodic closure column appended
    np.testing.assert_allclose(
        xv_p[:, :NX_OPD], np.asarray(MARKR_XV).reshape(NV_OPD, NX_OPD),
        rtol=0)
    np.testing.assert_allclose(xv_p[:, NX_OPD], xv_p[:, 0], rtol=0)

    fv = od.get_ptcldist_v(0, 0, 1)
    np.testing.assert_allclose(fv, TOTAL_V, rtol=0)
