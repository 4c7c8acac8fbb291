"""Spectral (partial-DFT) Poisson solver.

The reference solves Gauss's law dE/dx = rho by keeping only a configured set
of Fourier modes: it assembles an nx-by-nmode cosine matrix and an nx-by-nmode
(-sine) matrix as PETSc AIJ matrices (reference src/pic1dp_field.F90:176-210)
and applies them as distributed SpMV pairs per step (:218-270).

On TPU the same partial DFT is two tiny dense matmuls on the replicated field
(nx <= 4096, nmode ~ 1); everything here compiles to a handful of MXU/VPU ops
and fuses into the surrounding step.

Conventions (must match the reference bit-for-bit in structure so growth-rate
comparisons are apples-to-apples, reference src/pic1dp_field.F90:218-257):

    Fre[ix, m] = cos(2 pi mode_m ix / nx)
    Fim[ix, m] = -sin(2 pi mode_m ix / nx)
    mode_im = -(Fre^T rho) / nx           (:231-234)
    mode_re = +(Fim^T rho) / nx           (:236-239)
    mode_re *= grad_inv;  mode_im *= grad_inv,  grad_inv_m = lx/(2 pi mode_m)
                                          (:158-174, :242-248)
    E = 2 * (Fre @ mode_re + Fim @ mode_im)  (:250-257)

which is exactly E_k = rho_k / (i k) restricted to the kept modes, with the
factor 2 accounting for the conjugate half of the spectrum.  The mode_re /
mode_im vectors after the grad_inv multiply are the E-field Fourier components
written to the output stream (reference src/pic1dp_output.F90:177-181).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SpectralOperator(NamedTuple):
    """Precomputed partial-DFT matrices and inverse-gradient diagonal."""

    fre: jnp.ndarray        # (nx, nmode) cos
    fim: jnp.ndarray        # (nx, nmode) -sin
    grad_inv: jnp.ndarray   # (nmode,) 1 / k_m = lx / (2 pi mode_m)

    @classmethod
    def create(cls, nx: int, modes: tuple[int, ...], lx: float, dtype) -> "SpectralOperator":
        ix = np.arange(nx)[:, None]
        m = np.asarray(modes)[None, :]
        theta = 2.0 * np.pi / nx * m * ix
        fre = np.cos(theta)
        fim = -np.sin(theta)
        grad_inv = lx / (2.0 * np.pi * np.asarray(modes, dtype=np.float64))
        return cls(
            fre=jnp.asarray(fre, dtype=dtype),
            fim=jnp.asarray(fim, dtype=dtype),
            grad_inv=jnp.asarray(grad_inv, dtype=dtype),
        )

    def solve(self, rho: jnp.ndarray):
        """rho (nx,) -> (E (nx,), mode_re (nmode,), mode_im (nmode,))."""
        nx = self.fre.shape[0]
        dtype = rho.dtype
        mode_im = -(self.fre.T @ rho) / nx
        mode_re = (self.fim.T @ rho) / nx
        mode_re = mode_re * self.grad_inv
        mode_im = mode_im * self.grad_inv
        electric = 2.0 * (self.fre @ mode_re + self.fim @ mode_im)
        return electric.astype(dtype), mode_re, mode_im
