"""Verbosity-level gating parity (reference src/pic1dp_input.F90:240-246,
src/pic1dp_output.F90:483-548): 0 silent, 1 compact percent lines,
2 per-event "finished itime" lines, 3 adds the diagnostic variable dump."""

import dataclasses

from pic1dp_tpu import Simulation
from pic1dp_tpu.config import OptimizationConfig, bump_on_tail_default


def _run(verbosity, capsys, optimize=False):
    opt = OptimizationConfig(tmerge=(0.6,), thshmerge=(0.3,)) if optimize \
        else OptimizationConfig()
    cfg = bump_on_tail_default(nx=64, nparticle_max=8192, time_max=1.0,
                               output_interval=0.5, dtype="float64",
                               verbosity=verbosity, optimization=opt)
    Simulation(cfg).run()
    return capsys.readouterr().err


def test_verbosity_0_silent(capsys):
    assert _run(0, capsys) == ""


def test_verbosity_1_compact(capsys):
    err = _run(1, capsys, optimize=True)
    assert "pic1dp_tpu version" in err
    assert "progrss  itime     time  int E^2 dx" in err
    # compact percent lines, e.g. "t 50.0%      10     0.500   4.5e-09"
    assert any(ln.lstrip().startswith(("i", "t")) and "%" in ln
               for ln in err.splitlines())
    assert ": optimization performed, current # of particles" in err
    assert "Info: finished" not in err


def test_verbosity_2_event_lines(capsys):
    err = _run(2, capsys, optimize=True)
    assert "Info: finished itime =" in err
    assert "Info: particle_optimize performed" in err
    assert "progrss" not in err          # header is level-1 only
    assert "Info: diagnostics:" not in err


def test_verbosity_3_diagnostic_dump(capsys):
    err = _run(3, capsys)
    assert "Info: finished itime =" in err
    assert "Info: diagnostics:" in err
    assert "live markers" in err and "mode_re" in err
