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

On the TPU backend the eigh-based paths dispatch to the rows-only Pallas
kernels in ops.pallas_linalg (one-sided Jacobi SVD for Takagi's Gram
eigendecomposition, shifted CholeskyQR2 for orthonormalization, Cholesky
with Tikhonov shift for the Hermitian solve) — the eigh formulations below
remain the CPU path and the numerical cross-check.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import jacobi
from .jacobi import _tpu_backend
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


def _mean_diag(g: CArr) -> jax.Array:
    return jnp.mean(jnp.abs(jnp.diagonal(g.re, axis1=-2, axis2=-1)), axis=-1)


def takagi_small(m: CArr, sweeps: int = 8):
    """Takagi factorization of a complex-symmetric (..., k, k) matrix.

    Returns (w, s): unitary w (..., k, k) and singular values s (..., k)
    sorted descending with  m ~= w diag(s) w^T.

    Method: m m^H is Hermitian PSD; eigh gives candidate vectors u with
    eigenvalues s^2.  For each simple singular value, m conj(u) = t u with
    |t| = s; rotating u by exp(i*angle(t)/2) makes t real positive, which is
    exactly the Takagi condition.  (Degenerate pairs are generically split by
    the KBDM spectra; exact ties would need an extra 2x2 rotation.)

    On TPU the (s, u) pair comes from the one-sided Jacobi SVD kernel
    (pallas_linalg.gram_svd), which never forms m m^H at all.
    """
    if _tpu_backend():
        from . import pallas_linalg
        s, u = pallas_linalg.gram_svd(m, sweeps=sweeps)
    else:
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


def hermitian_solve(h: CArr, b: CArr, ridge=0.0,
                    rcond: float = 1e-12, sweeps: int = 8) -> CArr:
    """Solve (h + ridge*I) x = b for Hermitian PSD h (..., k, k), b (..., k).

    ridge may be a float or an array broadcastable to the batch shape
    (possibly with a trailing singleton axis, e.g. (..., 1)).

    CPU: eigh-based x = w diag(1/(lam + ridge)) w^H b with eigenvalues
    below lam_max * rcond truncated (pseudo-inverse).
    TPU: Cholesky with Tikhonov shift ridge + rcond * mean|diag| — same
    regularization role (bounded solve for near-singular h, e.g. duplicate
    poles); for well-separated spectra the two agree to f32 rounding.
    """
    hsym = CArr(0.5 * (h.re + jnp.swapaxes(h.re, -1, -2)),
                0.5 * (h.im - jnp.swapaxes(h.im, -1, -2)))
    if _tpu_backend():
        from . import pallas_linalg
        r = jnp.asarray(ridge, h.re.dtype)
        if r.ndim == b.re.ndim:           # (..., 1)-shaped relative ridge
            r = r[..., 0]
        shift = r + rcond * _mean_diag(hsym)
        return pallas_linalg.chol_solve(hsym, b, shift)
    lam, w = jacobi.eigh(hsym, sweeps=sweeps)
    lam_max = jnp.maximum(lam[..., :1], 1e-30)
    good = lam > lam_max * rcond
    # clamp lam at 0: for near-singular h the smallest eigenvalues are f32
    # rounding noise and can be slightly negative — 1/(lam + tiny ridge)
    # would blow up with the wrong sign
    inv = jnp.where(good, 1.0 / (jnp.maximum(lam, 0.0) + ridge + 1e-30), 0.0)
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
