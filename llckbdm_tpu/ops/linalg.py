"""Dense structured linear algebra built on the Jacobi eigh core.

The backend has no QR/Cholesky/SVD/solve HLOs, so everything reduces to
matmuls (MXU) plus the Jacobi Hermitian eigendecomposition (ops.jacobi.eigh):

* :func:`lowner_orth`    — orthonormalize tall-skinny blocks (Lowner /
                           symmetric orthogonalization via the Gram matrix);
                           replaces tall-skinny QR.
* :func:`takagi_small`   — Takagi factorization M = W diag(s) W^T of a small
                           complex-symmetric matrix (M M^H eigh + phase fix).
* :func:`hermitian_solve`— solve (H + ridge) x = b for Hermitian PSD H via
                           eigh; replaces Cholesky.

All batched over leading dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import jacobi
from .cplx import (CArr, cabs, cangle, cmatmul, chermitian, cmul, conj,

                   cscale_cols, csub, cexp)



import functools as _functools
_es = _functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

def lowner_orth(y: CArr, rcond: float = 1e-10, sweeps: int = 8):
    """Orthonormalize the columns of y (..., m, k) -> q (..., m, k).

    q = y @ w @ diag(lam^-1/2) where y^H y = w diag(lam) w^H.  Columns of q
    beyond the numerical rank (lam <= lam_max * rcond) are zeroed.  Returns
    (q, lam) with lam sorted descending (lam = squared column norms along the
    principal axes — useful as a convergence/rank diagnostic).
    """
    g = cmatmul(chermitian(y), y)
    # enforce exact Hermitian symmetry before Jacobi
    g = CArr(0.5 * (g.re + jnp.swapaxes(g.re, -1, -2)),
             0.5 * (g.im - jnp.swapaxes(g.im, -1, -2)))
    lam, w = jacobi.eigh(g, sweeps=sweeps)
    lam_max = lam[..., :1]
    good = lam > lam_max * rcond
    inv = jnp.where(good, jax.lax.rsqrt(jnp.maximum(lam, 1e-30)), 0.0)
    q = cscale_cols(cmatmul(y, w), CArr(inv, jnp.zeros_like(inv)))
    return q, lam


def takagi_small(m: CArr, sweeps: int = 8):
    """Takagi factorization of a complex-symmetric (..., k, k) matrix.

    Returns (w, s): unitary w (..., k, k) and singular values s (..., k)
    sorted descending with  m ~= w diag(s) w^T.

    Method: m m^H is Hermitian PSD; eigh gives candidate vectors u with
    eigenvalues s^2.  For each simple singular value, m conj(u) = t u with
    |t| = s; rotating u by exp(i*angle(t)/2) makes t real positive, which is
    exactly the Takagi condition.  (Degenerate pairs are generically split by
    the KBDM spectra; exact ties would need an extra 2x2 rotation.)
    """
    mh = cmatmul(m, chermitian(m))
    mh = CArr(0.5 * (mh.re + jnp.swapaxes(mh.re, -1, -2)),
              0.5 * (mh.im - jnp.swapaxes(mh.im, -1, -2)))
    lam, u = jacobi.eigh(mh, sweeps=sweeps)
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    # t_k = u_k^H m conj(u_k)
    mu = cmatmul(m, conj(u))                     # (..., k, k)
    t = jnp.sum(cmul(conj(u), mu).re, axis=-2), \
        jnp.sum(cmul(conj(u), mu).im, axis=-2)
    t = CArr(*t)                                  # (..., k)
    half = CArr(jnp.zeros_like(t.re), 0.5 * cangle(t))
    phase = cexp(half)                            # e^{i angle(t)/2}
    w = cscale_cols(u, phase)
    return w, s


def hermitian_solve(h: CArr, b: CArr, ridge: float = 0.0,
                    rcond: float = 1e-12, sweeps: int = 8) -> CArr:
    """Solve (h + ridge*I) x = b for Hermitian PSD h (..., k, k), b (..., k).

    Uses eigh: x = w diag(1/(lam + ridge)) w^H b, with eigenvalues below
    lam_max * rcond truncated (pseudo-inverse behavior).
    """
    hsym = CArr(0.5 * (h.re + jnp.swapaxes(h.re, -1, -2)),
                0.5 * (h.im - jnp.swapaxes(h.im, -1, -2)))
    lam, w = jacobi.eigh(hsym, sweeps=sweeps)
    lam_max = jnp.maximum(lam[..., :1], 1e-30)
    good = lam > lam_max * rcond
    inv = jnp.where(good, 1.0 / (lam + ridge + 1e-30), 0.0)
    # x = w @ (inv * (w^H b))
    wb = _es('...ik,...i->...k', w.re, b.re) + \
         _es('...ik,...i->...k', w.im, b.im)
    wb_im = _es('...ik,...i->...k', w.re, b.im) - \
            _es('...ik,...i->...k', w.im, b.re)
    sr, si = inv * wb, inv * wb_im
    x_re = _es('...ik,...k->...i', w.re, sr) - \
           _es('...ik,...k->...i', w.im, si)
    x_im = _es('...ik,...k->...i', w.re, si) + \
           _es('...ik,...k->...i', w.im, sr)
    return CArr(x_re, x_im)
