"""Hankel operators for KBDM (device-native).

U0[i, j] = c[i + j], U1[i, j] = c[i + j + 1] (oracle: reference.kbdm).

Two forms are provided:

* :func:`hankel_matrices` — materialize the m x m pair.  For the m-sweep the
  *largest* m is materialized once; every smaller m is its leading submatrix,
  selected by masking (see :func:`size_mask`).  This turns the whole
  multi-m sweep into one batched masked computation (SURVEY.md §7: "the
  m-sweep must be one batched launch, not 46").
* masked matmul helpers — y = U0[:m, :m] @ x computed with the m_max-size
  operator plus row/col masks, so XLA sees one static shape for all m.
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


def size_mask(m_values: jax.Array, m_max: int, dtype=jnp.float32) -> jax.Array:
    """(n_m, m_max) mask: row s has ones in positions < m_values[s].

    Used to emulate the m x m leading submatrix of the m_max Hankel operator
    in a batched sweep: mask both the input and output vectors.
    """
    pos = jnp.arange(m_max)
    return (pos[None, :] < m_values[:, None]).astype(dtype)
