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
        fa, fb = build(k), build(3 * k)
        np.asarray(fa(*args))
        np.asarray(fb(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fa(*args))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(fb(*args))
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / (2 * k))
        return max(best, 1e-12)

    # ---- 1. real substep kernels, f32 vs packed ----
    def kernel_rows(packed):
        import dataclasses

        c = dataclasses.replace(cfg, bf16_weights=packed)
        fused = FusedStepper(c, interpret=False, packed=packed)
        p_in = pack_pw(p) if packed else p

        def build_ss1(k):
            @jax.jit
            def run(x, v, p, w, mre, mim):
                def body(carry, _):
                    cc, pw = carry
                    w1, (pc, ps) = fused.substep1(x + cc, v, pw, w, mre, mim)
                    pw = w1 if packed else pw
                    s = jnp.sum(pc) + jnp.sum(ps)
                    return (1e-30 * s.astype(x.dtype), pw), None
                (out, _), _ = jax.lax.scan(body, (jnp.zeros((), x.dtype), p),
                                           None, length=k)
                return out
            return run

        w1 = jax.jit(lambda *a: fused.substep1(*a)[0])(x, v, p_in, w, mre, mim)

        def build_ss2(k):
            @jax.jit
            def run(x, v, p, w, w1, mre, mim):
                def body(cc, _):
                    _x2, _v2, _w2, (pc, ps) = fused.substep2(
                        x + cc, v, w1 if packed else p, w,
                        None if packed else w1, mre, mim, mre, mim)
                    s = jnp.sum(pc) + jnp.sum(ps)
                    return 1e-30 * s.astype(x.dtype), None
                out, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                                      length=k)
                return out
            return run

        t1 = slope(build_ss1, (x, v, p_in, w, mre, mim))
        t2 = slope(build_ss2, (x, v, p_in, w, w1, mre, mim))
        name = "packed" if packed else "f32"
        fl1 = 5 * n * 4  # ss1: 4 reads + 1 write, all f32-width
        fl2 = (7 if packed else 8) * n * 4
        log(f"{name:>7} ss1: {t1 * 1e3:7.3f} ms  {fl1 / t1 / 1e9:6.1f} GB/s"
            f"   ss2: {t2 * 1e3:7.3f} ms  {fl2 / t2 / 1e9:6.1f} GB/s"
            f"   step: {(t1 + t2) * 1e3:7.3f} ms")
        return t1, t2

    # ---- 2. stream-only microkernels (same shape/alias pattern) ----
    def stream_only(n_read, n_write, alias, label):
        nrows = n // 128
        rows = 128

        def kern(*refs):
            ins, outs = refs[:n_read], refs[n_read:]
            acc = ins[0][:]
            for r in ins[1:]:
                acc = acc + r[:]
            for o in outs:
                o[:] = acc
                acc = acc + 1.0

        blk = pl.BlockSpec((rows, 128), lambda b: (b, 0),
                           memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern,
            grid_spec=pl.GridSpec(grid=(nrows // rows,),
                                  in_specs=[blk] * n_read,
                                  out_specs=tuple([blk] * n_write)),
            out_shape=tuple([jax.ShapeDtypeStruct((nrows, 128), jnp.float32)
                             for _ in range(n_write)]),
            input_output_aliases=dict(alias),
        )

        arrs = [jnp.asarray(a[0].reshape(nrows, 128)) for a in (x, v, p, w)][:n_read]

        def build(k):
            @jax.jit
            def run(*arrs):
                def body(c, _):
                    outs = call(*[a + c for a in arrs])
                    return 1e-30 * jnp.sum(outs[0]), None
                out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                      length=k)
                return out
            return run

        t = slope(build, tuple(arrs))
        traffic = (n_read + n_write) * n * 4
        log(f"{label}: {t * 1e3:7.3f} ms  {traffic / t / 1e9:6.1f} GB/s "
            f"({n_read}r+{n_write}w, alias={dict(alias)})")
        return t

    log("-- real kernels --")
    f1, f2 = kernel_rows(packed=False)
    p1, p2 = kernel_rows(packed=True)

    log("-- stream-only ceilings (same block pipeline) --")
    s1a = stream_only(4, 1, {3: 0}, "ss1-pattern aliased   ")
    s1n = stream_only(4, 1, {}, "ss1-pattern no-alias  ")
    s2a = stream_only(4, 3, {0: 0, 1: 1, 3: 2}, "ss2-pattern aliased   ")
    s2n = stream_only(4, 3, {}, "ss2-pattern no-alias  ")

    log("-- compute overhang (kernel - stream-only, ms) --")
    log(f"f32    ss1: {(f1 - s1a) * 1e3:+7.3f}   ss2: {(f2 - s2a) * 1e3:+7.3f}")
    log(f"packed ss1: {(p1 - s1a) * 1e3:+7.3f}   ss2: {(p2 - s2a) * 1e3:+7.3f}")


if __name__ == "__main__":
    main()
