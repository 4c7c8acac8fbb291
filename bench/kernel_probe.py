"""On-chip fused-kernel decomposition + streaming-ceiling probe.

Answers "is the substep kernel at its DMA roofline?" with measurements
(VERDICT round 2 item 1: close the bandwidth gap or prove the ceiling):

  1. times substep-1 / substep-2 kernels for the f32 and packed-bf16
     layouts with the two-point scan-slope method;
  2. times STREAM-ONLY microkernels with the exact same block pipeline and
     aliasing pattern as each substep (4 reads + 1 aliased write for
     substep 1; 4 reads + 3 aliased writes for substep 2) but trivial
     compute — their rate IS the attainable ceiling for that access
     pattern;
  3. reports effective GB/s for each and the compute overhang
     (kernel time - stream-only time).

Usage: python bench/kernel_probe.py [n_log2=24]
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
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 24)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from pic1dp_tpu.config import DepositMethod, bump_on_tail_default
    from pic1dp_tpu.ops.pallas_kernels import FusedStepper, pack_pw

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}  n=2^{n.bit_length()-1}")

    key = jax.random.PRNGKey(0)
    cfg = bump_on_tail_default(nx=1024, nparticle_max=n, dtype="float32",
                               deposit_method=DepositMethod.PALLAS,
                               verbosity=0)
    kx, kv, kp, kw = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (1, n), jnp.float32, 0.0, cfg.lx)
    v = jax.random.normal(kv, (1, n), jnp.float32) * 2.0
    p = jnp.abs(jax.random.normal(kp, (1, n), jnp.float32)) * 1e-4
    w = jax.random.normal(kw, (1, n), jnp.float32) * 1e-6
    mre = jnp.asarray([1e-4], jnp.float32)
    mim = jnp.asarray([5e-5], jnp.float32)

    def slope(build, args, k=8):
        # per-side minima: robust to additive tunnel hiccups, which the
        # paired min_i(tb_i - ta_i) form is not (a +15 ms glitch on one ta
        # deflates that pair's slope and wins the min)
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

    # ---- 1. real substep kernels, f32 vs packed (x stream_v1) ----
    def kernel_rows(packed, stream_v1=False):
        import dataclasses

        c = dataclasses.replace(cfg, bf16_weights=packed)
        fused = FusedStepper(c, interpret=False, packed=packed,
                             stream_v1=stream_v1)
        p_in = pack_pw(p) if packed else p

        def build_ss1(k):
            @jax.jit
            def run(x, v, p, w, mre, mim):
                def body(carry, _):
                    cc, pw = carry
                    w1, _v1, (pc, ps) = fused.substep1(x + cc, v, pw, w,
                                                       mre, mim)
                    pw = w1 if packed else pw
                    s = jnp.sum(pc) + jnp.sum(ps)
                    return (1e-30 * s.astype(x.dtype), pw), None
                (out, _), _ = jax.lax.scan(body, (jnp.zeros((), x.dtype), p),
                                           None, length=k)
                return out
            return run

        w1, v1, _ = jax.jit(lambda *a: fused.substep1(*a))(
            x, v, p_in, w, mre, mim)

        def build_ss2(k):
            @jax.jit
            def run(x, v, p, w, w1, v1, mre, mim):
                def body(cc, _):
                    _x2, _v2, _w2, (pc, ps) = fused.substep2(
                        x + cc, v, w1 if packed else p, w,
                        None if packed else w1, mre, mim, mre, mim, v1=v1)
                    s = jnp.sum(pc) + jnp.sum(ps)
                    return 1e-30 * s.astype(x.dtype), None
                out, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                                      length=k)
                return out
            return run

        if v1 is None:
            v1 = w1
        t1 = slope(build_ss1, (x, v, p_in, w, mre, mim))
        t2 = slope(build_ss2, (x, v, p_in, w, w1, v1, mre, mim))
        name = ("packed" if packed else "f32") + ("+v1" if stream_v1 else "")
        fl1 = (6 if stream_v1 else 5) * n * 4
        fl2 = ((8 if stream_v1 else 7) if packed
               else (9 if stream_v1 else 8)) * n * 4
        log(f"{name:>10} ss1: {t1 * 1e3:7.3f} ms  {fl1 / t1 / 1e9:6.1f} GB/s"
            f"   ss2: {t2 * 1e3:7.3f} ms  {fl2 / t2 / 1e9:6.1f} GB/s"
            f"   step: {(t1 + t2) * 1e3:7.3f} ms")
        return t1, t2

    # ---- 2. stream-only microkernels (same shape/alias pattern) ----
    # Honest traffic accounting: the scan carry enters through ONE input
    # (defeats loop-invariant hoisting of the opaque pallas_call) and exits
    # through a tiny (8,128) block-sum accumulator output (mimics the real
    # kernels' projection tile) — HBM traffic is exactly the streams.
    def stream_only(n_read, n_write, alias, label, rows=128, mult=1.0):
        nrows = n // 128

        def kern(*refs):
            ins = refs[:n_read]
            outs = refs[n_read:n_read + n_write]
            acc_ref = refs[-1]
            acc = ins[0][:]
            for r in ins[1:]:
                acc = acc + r[:]
            for j, o in enumerate(outs):
                o[:] = acc * (1.0 + 0.25 * j)

            @pl.when(pl.program_id(0) == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            r = acc.shape[0]
            acc_ref[:] += jnp.sum(acc.reshape(r // 8, 8, 128), axis=0)

        blk = pl.BlockSpec((rows, 128), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
        acc_blk = pl.BlockSpec((8, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(grid=(nrows // rows,),
                                  in_specs=[blk] * n_read,
                                  out_specs=tuple([blk] * n_write
                                                  + [acc_blk])),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(n_write)]
                            + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
            input_output_aliases=dict(alias),
        )

        arrs = [jnp.asarray(a[0].reshape(nrows, 128))
                for a in (x, v, p, w)][:n_read]

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
        # the `arrs[0] + c` temp adds one read+write of N outside the kernel
        traffic = (n_read + n_write + 2) * n * 4
        log(f"{label}: {t * 1e3:7.3f} ms  {traffic / t / 1e9:6.1f} GB/s "
            f"({n_read}r+{n_write}w+carrytemp, rows={rows}, "
            f"alias={dict(alias)})")
        return t

    log("-- real kernels --")
    f1, f2 = kernel_rows(packed=False)
    p1, p2 = kernel_rows(packed=True)
    kernel_rows(packed=False, stream_v1=True)
    kernel_rows(packed=True, stream_v1=True)

    log("-- stream-only ceilings (same block pipeline; GB/s incl. the "
        "carry-temp stream) --")
    s1a = stream_only(4, 1, {3: 0}, "ss1-pattern aliased   ")
    s2a = stream_only(4, 3, {0: 0, 1: 1, 3: 2}, "ss2-pattern aliased   ")
    s2n = stream_only(4, 3, {}, "ss2-pattern no-alias  ")
    for rows in (256, 512):
        stream_only(4, 3, {0: 0, 1: 1, 3: 2}, f"ss2-pattern rows={rows:<4}",
                    rows=rows)
    # stream-count scaling: if time tracks total streams the pipeline is
    # volume-bound; if flat, it is issue/latency-bound
    s31 = stream_only(3, 1, {2: 0}, "3r+1w aliased         ")
    s53 = stream_only(4, 4, {0: 0, 1: 1, 2: 2, 3: 3}, "4r+4w aliased         ")

    log("-- compute overhang (kernel - stream-only, ms; stream-only "
        "includes +2N carry temp the real loops also pay once) --")
    log(f"f32    ss1: {(f1 - s1a) * 1e3:+7.3f}   ss2: {(f2 - s2a) * 1e3:+7.3f}")
    log(f"packed ss1: {(p1 - s1a) * 1e3:+7.3f}   ss2: {(p2 - s2a) * 1e3:+7.3f}")


if __name__ == "__main__":
    main()
