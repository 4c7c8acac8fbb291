"""Does the Pallas pipeline overlap VPU compute with stream DMA?

bench/probe_compute.py's marginals are LINEAR from the first added unit
(poly x1 marginal ~= x4 marginal), which suggests compute time adds 1:1 on
top of a DMA-bound baseline instead of hiding in the transfer slack.  If
Mosaic's default grid pipeline serializes compute after DMA per block,
a manual pltpu.emit_pipeline with deeper buffering might overlap better on
compute-heavy bodies (round 4 only established parity for PURE streams).

Times the 4-read + 3-write pattern with K trig chains per element under:
  default grid pipeline (rows 128 / 256 / 512)
  emit_pipeline (rows 128 / 256 / 512)
in a slot-stable in-place aliased scan.  If overlap worked, the trig-x4
time would approach max(DMA, compute) instead of DMA + compute.

Usage: python bench/probe_overlap.py [n_log2=24]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, flush=True)


N_READ, N_WRITE = 4, 3


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 2 ** nlog
    nrows = n // 128

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pic1dp_tpu.ops.pallas_kernels import _trig_block
    from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    interpret = jax.default_backend() != "tpu"
    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}  n=2^{nlog}")

    LX, NX = 2.0 * np.pi / 0.36, 1024
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, N_READ)
    arrs = [jax.random.uniform(ks[0], (nrows, 128), jnp.float32) * LX] + [
        jax.random.normal(k, (nrows, 128), jnp.float32) for k in ks[1:]]

    def body_math(ins, outs, k_trig):
        acc = ins[0][...]
        for r in ins[1:]:
            acc = acc + r[...]
        extra = 0.0
        for j in range(k_trig):
            cs = _trig_block(ins[0][...] + 1e-6 * j, LX, NX, (1,), jnp.float32)
            extra = extra + cs[0][0] + cs[0][1]
        for j, o in enumerate(outs):
            o[...] = acc * (1.0 + 0.25 * j) + 1e-12 * extra
        return acc

    def default_call(rows, k_trig):
        def kern(*refs):
            ins, outs, acc_ref = refs[:N_READ], refs[N_READ:-1], refs[-1]
            acc = body_math(ins, outs, k_trig)

            @pl.when(pl.program_id(0) == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            acc_ref[...] += jnp.sum(acc.reshape(rows // 8, 8, 128), axis=0)

        blk = pl.BlockSpec((rows, 128), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
        acc_blk = pl.BlockSpec((8, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(
                grid=(nrows // rows,),
                in_specs=[blk] * N_READ,
                out_specs=tuple([blk] * N_WRITE + [acc_blk])),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(N_WRITE)]
                            + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
            input_output_aliases={0: 0, 1: 1, 3: 2},
            interpret=interpret,
        )

    def manual_call(rows, k_trig):
        blk = pl.BlockSpec((rows, 128), lambda b: (b, 0))

        def outer(*refs):
            ins, outs, acc_ref = refs[:N_READ], refs[N_READ:-1], refs[-1]
            acc_ref[...] = jnp.zeros_like(acc_ref)

            def inner(*brefs):
                bins, bouts = brefs[:N_READ], brefs[N_READ:]
                acc = body_math(bins, bouts, k_trig)
                acc_ref[...] += jnp.sum(acc.reshape(rows // 8, 8, 128),
                                        axis=0)

            pltpu.emit_pipeline(
                inner, grid=(nrows // rows,),
                in_specs=[blk] * N_READ, out_specs=[blk] * N_WRITE)(
                    *ins, *outs)

        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        return pl.pallas_call(
            outer,
            in_specs=[any_spec] * N_READ,
            out_specs=tuple([any_spec] * N_WRITE
                            + [pl.BlockSpec(memory_space=pltpu.VMEM)]),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(N_WRITE)]
                            + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
            input_output_aliases={0: 0, 1: 1, 3: 2},
            interpret=interpret,
        )

    def scan_time(call, k=8, trials=4):
        def build(length):
            @jax.jit
            def run(*a4):
                def body(c, _):
                    s = c[:4]
                    o0, o1, o2, acc = call(*s)
                    return (o0, o1, s[2], o2, acc), None
                c, _ = jax.lax.scan(
                    body, a4 + (jnp.zeros((8, 128), jnp.float32),), None,
                    length=length)
                return c
            return run

        fa, fb = build(k), build(3 * k)
        np.asarray(jax.tree.leaves(fa(*arrs))[-1])
        np.asarray(jax.tree.leaves(fb(*arrs))[-1])
        tas, tbs = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fa(*arrs))[-1])
            tas.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fb(*arrs))[-1])
            tbs.append(time.perf_counter() - t0)
        return max((min(tbs) - min(tas)) / (2 * k), 1e-12)

    for rows in (128, 256, 512):
        for k_trig in (0, 4):
            td = scan_time(default_call(rows, k_trig))
            tm = scan_time(manual_call(rows, k_trig))
            log(f"rows={rows:<3} trig x{k_trig}: default {td * 1e3:7.3f} ms"
                f"   emit_pipeline {tm * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
