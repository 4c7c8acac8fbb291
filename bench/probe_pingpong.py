"""Can the scan run the fused kernels UN-aliased without paying carry copies?

Round-4 finding (bench/probe_pipeline.py, docs/performance.md): the substep-2
stream pattern reaches 770-785 GB/s un-aliased vs ~500 GB/s with the in-place
input_output_aliases the production scan uses to avoid XLA carry copies —
i.e. ~40% of step time is the aliasing compromise, not a pipeline ceiling.

This probe times the same 4-read + 3-write (+accumulator) pattern inside a
REAL lax.scan (so carry-copy effects are included) under the candidate
carry layouts that could give every kernel a disjoint read/write buffer set.
Stream roles mirror substep 2: reads (x, v, pw, w), writes (x2, v2, w2) with
x2 <- x's buffer, v2 <- v's, w2 <- w's; pw (stream 2) is read-only.

  inplace   — production baseline: single buffers, outputs aliased over
              inputs (read block i / write block i of the SAME buffer).
  noalias   — fresh outputs, no hints (XLA copies the carry; round-3 data).
  pingpong  — each stream is ONE double-length (2, nrows, 128) buffer;
              a scalar-prefetched half index h makes the kernel read half h
              and write half 1-h of the same (whole-buffer-aliased) buffer;
              the scan carries h and flips it.  Read/write ADDRESSES are
              disjoint; the BUFFER is shared.  Distinguishes whether the
              aliased-pipeline serialization is address-level (pingpong
              recovers the un-aliased rate) or buffer-level (it doesn't).
  pp2       — two separate buffer sets A/B, body runs TWO steps (A->B then
              B->A) with each kernel's outputs forced into the *other* set's
              dead buffers via dummy ANY-memory-space operands aliased to the
              outputs (no DMA is issued for ANY inputs the kernel never
              touches).  Buffers are fully distinct per kernel; carry slots
              return to their own buffers after the unrolled pair, so the
              while state needs no copies.
  pp2-free  — same two-step body with NO aliasing hints at all: measures
              whether XLA buffer assignment alone places the fresh outputs
              into the dead opposite-set carry buffers.

The scan carries the (8, 128) accumulator tile of the last call alongside
the streams, and the timer fetches THAT (np.asarray of a 4 KB value that
depends on every iteration) — a big-array fetch adds seconds of tunnel
transfer variance that drowned the slope in the first version of this probe.

Usage: python bench/probe_pingpong.py [n_log2=24] [rows=256]
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
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n = 2 ** nlog
    nrows = n // 128

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}  n=2^{nlog}  rows={rows}")

    key = jax.random.PRNGKey(0)
    arrs = [jax.random.normal(k, (nrows, 128), jnp.float32)
            for k in jax.random.split(key, N_READ)]
    arrs2 = [jnp.stack([a, a]) for a in arrs]  # (2, nrows, 128) pingpong

    def body_math(ins, outs):
        acc = ins[0][...]
        for r in ins[1:]:
            acc = acc + r[...]
        for j, o in enumerate(outs):
            o[...] = (acc * (1.0 + 0.25 * j)).reshape(o.shape)
        return acc

    def slope(build, args, steps_per_scan, k=8, trials=4):
        """ms per pattern-step; fetches the tiny acc leaf (tree leaf -1)."""
        fa, fb = build(k), build(3 * k)
        np.asarray(jax.tree.leaves(fa(*args))[-1])
        np.asarray(jax.tree.leaves(fb(*args))[-1])
        tas, tbs = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fa(*args))[-1])
            tas.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jax.tree.leaves(fb(*args))[-1])
            tbs.append(time.perf_counter() - t0)
        log(f"    raw ta(ms): {[f'{t * 1e3:.1f}' for t in tas]}  "
            f"tb(ms): {[f'{t * 1e3:.1f}' for t in tbs]}")
        return max((min(tbs) - min(tas)) / (2 * k * steps_per_scan), 1e-12)

    acc_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    def flat_kernel(*refs):
        ins = refs[:N_READ]
        outs = refs[N_READ:N_READ + N_WRITE]
        acc_ref = refs[-1]
        acc = body_math(ins, outs)

        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.sum(acc.reshape(rows // 8, 8, 128), axis=0)

    blk = pl.BlockSpec((rows, 128), lambda b: (b, 0),
                       memory_space=pltpu.VMEM)
    acc_blk = pl.BlockSpec((8, 128), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)

    def flat_call(alias, n_dummy=0):
        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

        def kern(*refs):
            flat_kernel(*refs[:N_READ], *refs[N_READ + n_dummy:])

        return pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(
                grid=(nrows // rows,),
                in_specs=[blk] * N_READ + [any_spec] * n_dummy,
                out_specs=tuple([blk] * N_WRITE + [acc_blk])),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(N_WRITE)] + [acc_shape]),
            input_output_aliases=dict(alias),
            interpret=interpret,
        )

    def run_flat_scan(label, alias):
        call = flat_call(alias)

        def build(k):
            @jax.jit
            def run(*a4):
                def body(c, _):
                    s = c[:4]
                    o0, o1, o2, acc = call(*s)
                    # slot-stable roles: x<-o0, v<-o1, pw stays, w<-o2
                    return (o0, o1, s[2], o2, acc), None
                c, _ = jax.lax.scan(
                    body, a4 + (jnp.zeros((8, 128), jnp.float32),), None,
                    length=k)
                return c
            return run

        report(label, slope(build, tuple(arrs), 1))

    # ---- pingpong: (2, nrows, 128) buffers + scalar-prefetched half ----

    def pingpong_call():
        def kern(h_ref, *refs):
            flat_kernel(*refs)

        in_blk = pl.BlockSpec((1, rows, 128),
                              lambda b, h: (h[0], b, 0),
                              memory_space=pltpu.VMEM)
        out_blk = pl.BlockSpec((1, rows, 128),
                               lambda b, h: (1 - h[0], b, 0),
                               memory_space=pltpu.VMEM)
        acc_blk_h = pl.BlockSpec((8, 128), lambda b, h: (0, 0),
                                 memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nrows // rows,),
                in_specs=[in_blk] * N_READ,
                out_specs=tuple([out_blk] * N_WRITE + [acc_blk_h])),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((2, nrows, 128), jnp.float32)
                 for _ in range(N_WRITE)] + [acc_shape]),
            # alias indices count the scalar operand: streams are 1..4;
            # written streams are 1 (x), 2 (v), 4 (w)
            input_output_aliases={1: 0, 2: 1, 4: 2},
            interpret=interpret,
        )

    def run_pingpong(label):
        call = pingpong_call()

        def build(k):
            @jax.jit
            def run(*a4):
                def body(c, _):
                    h, b0, b1, b2, b3, _acc = c
                    o0, o1, o2, acc = call(h, b0, b1, b2, b3)
                    return (1 - h, o0, o1, b2, o2, acc), None
                c, _ = jax.lax.scan(
                    body,
                    (jnp.zeros((1,), jnp.int32),) + a4
                    + (jnp.zeros((8, 128), jnp.float32),),
                    None, length=k)
                return c
            return run

        report(label, slope(build, tuple(arrs2), 1))

    # ---- pp2: two buffer sets, unrolled pair, dummy-operand aliases ----

    def run_pp2(label, hint: bool):
        call = flat_call(
            {N_READ + k: k for k in range(N_WRITE)} if hint else {},
            n_dummy=N_WRITE if hint else 0)

        def one(step_in, dest):
            args = tuple(step_in) + ((dest[0], dest[1], dest[2]) if hint
                                     else ())
            o0, o1, o2, acc = call(*args)
            return (o0, o1, step_in[2], o2), acc

        def build(k):
            @jax.jit
            def run(*a4):
                b4 = tuple(jnp.zeros_like(a) for a in a4)

                def body(c, _):
                    sa, sb = c[:4], c[4:8]
                    mid, _ = one(sa, (sb[0], sb[1], sb[3]))
                    end, acc = one(mid, (sa[0], sa[1], sa[3]))
                    # slot-stable: read-only stream 2 keeps its own buffer
                    # in each set
                    return (end[0], end[1], sa[2], end[3],
                            mid[0], mid[1], sb[2], mid[3], acc), None
                c, _ = jax.lax.scan(
                    body, a4 + b4 + (jnp.zeros((8, 128), jnp.float32),),
                    None, length=k)
                return c
            return run

        report(label, slope(build, tuple(arrs), 2, k=4))

    def report(label, t):
        traffic = (N_READ + N_WRITE) * n * 4
        log(f"{label:<28}: {t * 1e3:7.3f} ms  {traffic / t / 1e9:6.1f} GB/s")

    run_flat_scan("inplace  (production)", {0: 0, 1: 1, 3: 2})
    run_flat_scan("noalias  (carry copies)", {})
    run_pingpong("pingpong (half-alternate)")
    run_pp2("pp2-hint (dummy-op alias)", hint=True)
    run_pp2("pp2-free (no hints)", hint=False)


if __name__ == "__main__":
    main()
