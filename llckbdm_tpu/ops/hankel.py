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

    Lowered as ONE elementwise gather from the (..., n) signal.  Profiling
    note (v5e, V=512, m=256): ~8 ms real device time per launch — an
    m-way static-slice+stack variant ran only ~5 ms faster but cost 224 s
    of XLA compile, a bad trade.  (Isolated timings of this op through the
    axon tunnel read ~38 ms, of which ~30 ms is the per-dispatch RPC floor
    — see tools/profile_stages.py.)
    """
    idx = jnp.arange(m)[:, None] + jnp.arange(m)[None, :] + shift
    return CArr(c.re[..., idx], c.im[..., idx])
