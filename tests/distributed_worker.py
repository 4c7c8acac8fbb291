"""Worker process for the 2-process jax.distributed test
(tests/test_parallel.py::test_two_process_distributed_run).

Each worker owns 2 virtual CPU devices; the global mesh spans 4 devices over
2 processes, so the particle arrays are genuinely non-addressable from
either process — exercising launch.initialize, the process-0 writer gating,
and the per-process `.procK.npz` checkpoint path the way a real pod-slice
run would (reference equivalent: `mpiexec -n NPE_RUN ./pic1dp`,
run/Makefile:38-48).

Usage: python tests/distributed_worker.py <proc_id> <num_procs> <port> <outdir>
"""

import os
import sys

# launched by script path, so sys.path[0] is tests/ — add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pic1dp_tpu.parallel import launch  # noqa: E402

launch.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=nprocs, process_id=proc)

import numpy as np  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert jax.process_index() == proc
assert jax.device_count() == 2 * nprocs
assert len(jax.local_devices()) == 2

from pic1dp_tpu import Simulation  # noqa: E402
from pic1dp_tpu.config import landau_damping  # noqa: E402

cfg = landau_damping(nx=32, nparticle=8192, time_max=1.0,
                     output_interval=0.5, dtype="float64", verbosity=0)
mesh = launch.global_mesh()
sim = Simulation(cfg, out_path=outdir, mesh=mesh, checkpoint_path=outdir)
snaps = []
sim.run(snapshot_callback=snaps.append)

# writer gating: only process 0 serializes (launch.is_io_process)
assert (sim.writer is not None) == (proc == 0), (proc, sim.writer)
assert len(snaps) == 3  # t = 0, 0.5, 1.0 on every process

# the particle arrays span both processes: truly non-addressable globals
assert not sim.state.x.is_fully_addressable

# per-process sharded checkpoint + restore round trip
ck = sim.save_checkpoint()
assert ck.endswith(f".proc{proc}.npz"), ck
sim2 = Simulation(cfg, mesh=mesh, checkpoint_path=outdir)
sim2.restore_checkpoint(os.path.join(outdir, "checkpoint.npz"))
assert sim2.itime == sim.itime and sim2.time == sim.time
for f in ("x", "v", "w", "live"):
    a = getattr(sim.state, f).addressable_shards
    b = getattr(sim2.state, f).addressable_shards
    assert len(a) == len(b) == 2
    for u, v in zip(a, b):
        assert u.index == v.index
        np.testing.assert_array_equal(np.asarray(u.data), np.asarray(v.data))

# the restored state steps correctly under the cross-process mesh
sim2.step_once()
e = float(np.asarray(sim2.stepper.energies(sim2.state).field))
assert np.isfinite(e) and e > 0.0

print(f"DISTOK {proc} {e:.17e}", flush=True)
