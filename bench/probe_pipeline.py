"""Manual emit_pipeline vs default grid pipeline for the substep-2 stream
pattern (VERDICT round-2 item 1b).

The real substep kernels run ~570 GB/s effective of the 819 GB/s paper
number.  This probe asks whether the gap is the DEFAULT pallas pipeline's
(fixed double-buffering, one in-flight block per stream) by timing the same
4-read + 3-write (+small accumulator) pattern three ways:

  1. default grid pipeline (the production kernels' scheme);
  2. pltpu.emit_pipeline nested in a single-invocation pallas_call with
     HBM (ANY) refs — Mosaic's own multi-buffered manual pipeline;
  3. emit_pipeline with a 2x larger block (fewer, bigger DMAs).

Each with and without input/output aliasing.  Usage:
    python bench/probe_pipeline.py [n_log2=24]
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}  n=2^{nlog}")
    nrows = n // 128

    key = jax.random.PRNGKey(0)
    arrs = [jax.random.normal(k, (nrows, 128), jnp.float32)
            for k in jax.random.split(key, 4)]

    def slope(build, args, k=8):
        fa, fb = build(k), build(3 * k)
        np.asarray(fa(*args))
        np.asarray(fb(*args))
        tas, tbs = [], []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fa(*args))
            tas.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(fb(*args))
            tbs.append(time.perf_counter() - t0)
        return max((min(tbs) - min(tas)) / (2 * k), 1e-12)

    N_READ, N_WRITE = 4, 3

    def body_math(ins, outs):
        acc = ins[0][:]
        for r in ins[1:]:
            acc = acc + r[:]
        for j, o in enumerate(outs):
            o[:] = acc * (1.0 + 0.25 * j)
        return acc

    def default_pipeline(alias, rows):
        def kern(*refs):
            ins, outs, acc_ref = refs[:N_READ], refs[N_READ:-1], refs[-1]
            acc = body_math(ins, outs)

            @pl.when(pl.program_id(0) == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            acc_ref[:] += jnp.sum(acc.reshape(rows // 8, 8, 128), axis=0)

        blk = pl.BlockSpec((rows, 128), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
        acc_blk = pl.BlockSpec((8, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(grid=(nrows // rows,),
                                  in_specs=[blk] * N_READ,
                                  out_specs=tuple([blk] * N_WRITE + [acc_blk])),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(N_WRITE)]
                            + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
            input_output_aliases=dict(alias),
        )

    def manual_pipeline(alias, rows):
        blk = pl.BlockSpec((rows, 128), lambda b: (b, 0))

        def outer(*refs):
            ins, outs, acc_ref = refs[:N_READ], refs[N_READ:-1], refs[-1]
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def inner(*brefs):
                bins, bouts = brefs[:N_READ], brefs[N_READ:]
                acc = body_math(bins, bouts)
                acc_ref[:] += jnp.sum(acc.reshape(rows // 8, 8, 128), axis=0)

            pipeline = pltpu.emit_pipeline(
                inner, grid=(nrows // rows,),
                in_specs=[blk] * N_READ, out_specs=[blk] * N_WRITE)
            pipeline(*ins, *outs)

        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        return pl.pallas_call(
            outer,
            in_specs=[any_spec] * N_READ,
            out_specs=tuple([any_spec] * N_WRITE
                            + [pl.BlockSpec(memory_space=pltpu.VMEM)]),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(N_WRITE)]
                            + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
            input_output_aliases=dict(alias),
        )

    def run_case(label, call):
        def build(k):
            @jax.jit
            def run(*arrs):
                def body(c, _):
                    outs = call(arrs[0] + c, *arrs[1:])
                    return 1e-30 * jnp.sum(outs[-1]), None
                out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                      length=k)
                return out
            return run

        t = slope(build, tuple(arrs))
        traffic = (N_READ + N_WRITE + 2) * n * 4  # +2: the carry-temp stream
        log(f"{label}: {t * 1e3:7.3f} ms  {traffic / t / 1e9:6.1f} GB/s")
        return t

    ALIAS = {0: 0, 1: 1, 3: 2}
    run_case("default  rows=128 aliased ", default_pipeline(ALIAS, 128))
    run_case("default  rows=128 no-alias", default_pipeline({}, 128))
    run_case("manual   rows=128 aliased ", manual_pipeline(ALIAS, 128))
    run_case("manual   rows=128 no-alias", manual_pipeline({}, 128))
    run_case("manual   rows=256 aliased ", manual_pipeline(ALIAS, 256))
    run_case("manual   rows=512 aliased ", manual_pipeline(ALIAS, 512))


if __name__ == "__main__":
    main()
