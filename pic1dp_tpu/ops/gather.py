"""Field gather (S E in the vector-matrix formulation).

The reference interpolates the replicated electric field to particle positions
with the same hat weights used for deposition (reference
src/pic1dp_interaction.F90:239-258, or MatMult(S, E) for the explicit-matrix
strategies :213-220).

On TPU a random gather from a tiny (nx <= 4096) replicated grid vector is a
dynamic-gather; XLA handles it acceptably, and jnp.take is the baseline here.
The Pallas fused kernel replaces it with an in-VMEM one-hot matvec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pic1dp_tpu.ops.interp import hat_x


@functools.partial(jax.jit, static_argnames=("nx",))
def gather_take(x: jnp.ndarray, grid: jnp.ndarray, lx, nx: int) -> jnp.ndarray:
    """Interpolate grid (nx,) to positions x (N,), hat weights, periodic."""
    ix0, ix1, w0, w1 = hat_x(x, lx, nx)
    return w0 * jnp.take(grid, ix0) + w1 * jnp.take(grid, ix1)


@functools.partial(jax.jit, static_argnames=("nx", "chunk"))
def gather_onehot(x: jnp.ndarray, grid: jnp.ndarray, lx, nx: int,
                  chunk: int = 16384) -> jnp.ndarray:
    """One-hot contraction gather: E_p = H @ grid, chunked.  Avoids dynamic
    gather entirely (MXU matvec per chunk)."""
    n = x.shape[0]
    rem = (-n) % chunk
    xp = jnp.pad(x, (0, rem)) if rem else x
    nchunk = xp.shape[0] // chunk
    xc = xp.reshape(nchunk, chunk)
    iota = jnp.arange(nx, dtype=jnp.int32)

    def body(xs):
        ix0, ix1, w0, w1 = hat_x(xs, lx, nx)
        onehot = jnp.where(ix0[:, None] == iota, w0[:, None], 0.0) + \
                 jnp.where(ix1[:, None] == iota, w1[:, None], 0.0)
        return onehot @ grid

    out = jax.lax.map(body, xc).reshape(-1)
    return out[:n]


def gather(x, grid, lx, nx: int, method: str = "take", chunk: int = 16384):
    if method == "onehot":
        return gather_onehot(x, grid, lx, nx, chunk=min(chunk, x.shape[-1]) or 1)
    return gather_take(x, grid, lx, nx)
