"""On-chip A/B: fused substep kernels with vs without i/o aliasing.

Round-2 landed in-place aliasing as a win (-23% step time) but the round-3
stream-only ceilings (bench/kernel_probe.py) show the ss2 access pattern
runs 754 GB/s UN-aliased vs 478 GB/s aliased at rows=128 — Mosaic appears
to serialize the block pipeline on aliased buffers (block i+1's input DMA
waits on block i's output DMA to the same HBM buffer).  This probe times
the REAL substep kernels both ways, for the two production layouts, plus a
full multi-step scan (the bench-identical measurement) for each setting.

Usage: python bench/probe_alias.py [n_log2=24]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 2 ** nlog

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from pic1dp_tpu.config import DepositMethod, bump_on_tail_default
    from pic1dp_tpu.core.loading import load_particles
    from pic1dp_tpu.core.step import Stepper

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}  n=2^{nlog}")

    def scan_step_time(cfg, steps=8, trials=5):
        """ms/step of the real multi-step scan, two-point slope with
        ROBUST minima: min(t_b) - min(t_a) over independent trials.  The
        paired form min_i(t_b_i - t_a_i) underestimates badly when one
        t_a sample catches a tunnel hiccup (+15 ms on an 8-step call is
        common over axon) — the glitchy pair wins the min and deflates the
        slope.  Latency noise is strictly additive, so per-side minima
        converge to the true times and their difference is sound."""
        stepper = Stepper(cfg)
        state = load_particles(cfg, jax.random.PRNGKey(12345))
        state = stepper.initial_field(state)
        jax.block_until_ready(state.electric)
        ma, mb = stepper.make_multi_step(steps), stepper.make_multi_step(3 * steps)
        np.asarray(ma(state).electric)
        np.asarray(mb(state).electric)
        tas, tbs = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(ma(state).electric)
            tas.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(mb(state).electric)
            tbs.append(time.perf_counter() - t0)
        log(f"    raw ta(ms): {[f'{t * 1e3:.1f}' for t in tas]}  "
            f"tb(ms): {[f'{t * 1e3:.1f}' for t in tbs]}")
        return (min(tbs) - min(tas)) / (2 * steps) * 1e3

    # (alias, packed, stream_v1, rows)
    cases = [("1", False, True, 128), ("1", True, True, 128),
             ("1", False, False, 128), ("0", False, True, 128),
             ("0", True, True, 128), ("0", False, False, 128)]
    if len(sys.argv) > 2 and sys.argv[2] == "round2":
        # follow-up sweep around the round-1 winner (packed+v1, alias=1)
        cases = [("1", True, False, 128),   # packed, recompute v1: 12N floats
                 ("1", True, True, 64), ("1", True, True, 256)]
    elif len(sys.argv) > 2 and sys.argv[2] == "size":
        # the per-marker rate degrades ~17% from 2^24 to 2^26 (bench vs
        # probe round 1); rows sweep at the large size to see if bigger
        # blocks amortize whatever degrades
        cases = [("1", True, True, 128), ("1", True, True, 256),
                 ("1", True, True, 512), ("0", True, True, 256)]

    log("-- real multi-step scan (bench-identical), ms/step --")
    for alias, packed, v1, rows in cases:
        os.environ["PIC1DP_PALLAS_ALIAS"] = alias
        os.environ["PIC1DP_PACKED"] = "1" if packed else "0"
        os.environ["PIC1DP_STREAM_V1"] = "1" if v1 else "0"
        os.environ["PIC1DP_PALLAS_ROWS"] = str(rows)
        cfg = bump_on_tail_default(
            nx=1024, nparticle_max=n, dtype="float32",
            deposit_method=DepositMethod.PALLAS, verbosity=0,
            bf16_weights=packed)
        t = scan_step_time(cfg)
        name = ("packed" if packed else "f32") + ("+v1" if v1 else "")
        rate = 2.0 * n / (t * 1e-3)
        log(f"alias={alias} rows={rows:<3} {name:>10}: {t:7.3f} ms/step  "
            f"{rate:.3e} pushes/s")


if __name__ == "__main__":
    main()
