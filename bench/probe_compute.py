"""Marginal VPU cost of each production compute unit inside the fast scan.

probe_pingpong.py established that the correctly-wired in-place scan streams
the substep-2 pattern at ~830 GB/s (no aliasing penalty — the round-4 "40%
aliasing headroom" was an artifact of donated closed-over constants in the
old probe).  The production kernels run ~533 GB/s effective, so the gap is
un-hidden VPU work.  This probe measures which unit costs what: it times the
same 4-read + 3-write in-place aliased scan with K copies of each compute
unit added to the body (units imported from ops/pallas_kernels, i.e. the
REAL production code), and reports the marginal ms per unit at 2^24:

  trig  — full gather/deposit trig chain: _trig_block (index math, quadrant
          polynomials, angle-add) + the hat-interpolated (C, S) fold, the
          unit each substep runs twice (gather at current x, deposit at
          pushed x);
  exp   — the bump-on-tail single-exponential -f0'/f0 ratio drive;
  wrap  — _fast_wrap (periodic position wrap);
  poly  — bare _sincos_turns (no index math / hat fold), to split the trig
          chain's polynomial vs bookkeeping cost.

Usage: python bench/probe_compute.py [n_log2=24] [rows=256]
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

    from pic1dp_tpu.ops.pallas_kernels import (_fast_wrap, _sincos_turns,
                                               _trig_block)
    from pic1dp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}  n=2^{nlog}  rows={rows}")

    LX, NX = 2.0 * np.pi / 0.36, 1024

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, N_READ)
    # stream 0 plays "x": keep it in [0, lx) so the trig unit sees
    # production-range data
    arrs = [jax.random.uniform(ks[0], (nrows, 128), jnp.float32) * LX] + [
        jax.random.normal(k, (nrows, 128), jnp.float32) for k in ks[1:]]

    def unit_trig(x, salt):
        cs = _trig_block(x + 1e-6 * salt, LX, NX, (1,), jnp.float32)
        c_m, s_m = cs[0]
        return c_m + s_m

    def unit_poly(x, salt):
        t = x * np.float32(1.0 / LX) + 1e-6 * salt
        c, s = _sincos_turns(t - jnp.floor(t))
        return c + s

    def unit_exp(v, salt):
        # bump-on-tail ratio form constants (density .9, T2/T .25, v0 4.5)
        v = v + 1e-6 * salt
        arg = jnp.clip(v * v * 0.5 - (v - 4.5) ** 2 * 2.0 - 1.0, -60.0, 60.0)
        r = jnp.exp(arg)
        return (v + r * ((v - 4.5) * 4.0)) / (1.0 + r)

    def unit_wrap(x, salt):
        return _fast_wrap(x + salt, LX)

    UNITS = {"trig": unit_trig, "poly": unit_poly, "exp": unit_exp,
             "wrap": unit_wrap}

    def make_call(unit, k_units):
        def kern(*refs):
            ins = refs[:N_READ]
            outs = refs[N_READ:N_READ + N_WRITE]
            acc_ref = refs[-1]
            acc = ins[0][...]
            for r in ins[1:]:
                acc = acc + r[...]
            extra = 0.0
            for j in range(k_units):
                extra = extra + UNITS[unit](ins[0][...], float(j))
            for j, o in enumerate(outs):
                o[...] = acc * (1.0 + 0.25 * j) + 1e-12 * extra

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

    base = scan_time(make_call("trig", 0))
    traffic = (N_READ + N_WRITE) * n * 4
    log(f"baseline (streams only)     : {base * 1e3:7.3f} ms  "
        f"{traffic / base / 1e9:6.1f} GB/s")
    for unit in ("poly", "trig", "exp", "wrap"):
        for k_units in (1, 2, 4):
            t = scan_time(make_call(unit, k_units))
            log(f"{unit:>5} x{k_units}: {t * 1e3:7.3f} ms  "
                f"(marginal {(t - base) / k_units * 1e3:+7.3f} ms/unit)")


if __name__ == "__main__":
    main()
