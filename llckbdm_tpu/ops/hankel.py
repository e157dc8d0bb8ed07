"""Hankel operators for KBDM (device-native).

U0[i, j] = c[i + j], U1[i, j] = c[i + j + 1] (oracle: reference.kbdm).

Two forms are provided:

:func:`hankel_matrices` materializes the m x m pair.  For the m-sweep the
*largest* m is materialized once; every smaller m is its leading submatrix,
selected by the row/col masks built in solver.kbdm.kbdm_sweep.  This turns
the whole multi-m sweep into one batched masked computation (SURVEY.md §7:
"the m-sweep must be one batched launch, not 46").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cplx import CArr


def hankel_matrices(c: CArr, m: int, shift: int = 0) -> CArr:
    """Materialize the m x m Hankel matrix H[i, j] = c[i + j + shift].

    c has shape (..., n) with n >= 2m (+ shift).  Returns (..., m, m).
    """
    idx = jnp.arange(m)[:, None] + jnp.arange(m)[None, :] + shift
    return CArr(c.re[..., idx], c.im[..., idx])
