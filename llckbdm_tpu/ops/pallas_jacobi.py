"""Pallas TPU kernel for the batched complex-symmetric Jacobi eigensolver.

Why a kernel (the "Pallas/XLA kernels ... speed-of-light per chip" north
star, BASELINE.json:5): the KBDM pipeline diagonalizes thousands of tiny
(16-64) matrices per launch.  The lax.scan formulation in ops/jacobi.py
dispatches every rotation as a separate fused op over the whole batch —
O(n^2 * sweeps) tiny HBM-round-trip steps that leave the chip >95% idle
(measured 50-65 ms per batched call on v5e).  Here the entire solve runs
inside ONE kernel with the batch laid out along the 128-wide lane axis:
matrix element (i, j) of batch b sits at [i, j, b], so every rotation is a
handful of (n, B)-shaped VPU ops touching only VMEM.

The structural trick that makes the kernel lane-friendly: the solver acts
on matrices with row/column symmetry (complex-symmetric A = A^T), so a
two-sided rotation J^T A J is computed ENTIRELY IN ROW FORM:

    rows i, j:    row transform, with the (i,i),(i,j),(j,i),(j,j) entries
                  replaced by the closed-form 2x2 two-sided values (folded
                  into the row vectors via sublane-iota masks);
    cols i, j:    written as the transpose of the final rows — a pure data
                  movement, no column arithmetic.

(A Hermitian eigh kernel in the same style was built and benchmarked —
tools/bench_eigh_variants.py — but its per-pair column write-back measured
SLOWER than the XLA scan on v5e, so the TPU hot path avoids Hermitian eigh
entirely via ops.pallas_linalg and the kernel was dropped.)

Pair schedule: the round-robin "circle method" in closed form (no schedule
tables): round r of n-1 has pairs
    k = 0:         (n-1, r)
    k = 1..n/2-1:  ((r + k) mod (n-1), (r - k) mod (n-1))
Rotations are applied sequentially pair-by-pair — required for eig_cs,
whose complex-orthogonal rotations are not norm-preserving (simultaneous
application was measured to diverge, see ops/jacobi.py) — but each step is
vectorized across the whole lane batch.

Rotation formulas match ops/jacobi.py exactly; that lax.scan implementation
remains the CPU fallback and the cross-check oracle.  The default CPU test
suite exercises this kernel via ``interpret=True``
(tests/test_pallas_kernels.py); the real-chip compile is asserted by the
tpu-marked tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import CArr

_LANE = 128
_VMEM_BUDGET = 10 * 2 ** 20  # leave headroom for double-buffered blocks


def _pick_block(n: int, batch: int, n_bufs: int) -> int:
    """Lane-block size: multiple of 128, sized to the VMEM budget."""
    per_lane = n_bufs * n * n * 4
    b = (_VMEM_BUDGET // per_lane // _LANE) * _LANE
    b = max(_LANE, min(512, b))
    if batch <= _LANE:
        return _LANE
    return min(b, ((batch + _LANE - 1) // _LANE) * _LANE)


def _rr_pair(r, k: int, n: int):
    """Closed-form round-robin pairing (round r traced, slot k static)."""
    m = n - 1
    if k == 0:
        return n - 1, r
    i = jax.lax.rem(r + k, m)
    j = jax.lax.rem(r - k + m, m)
    return i, j


def _to_lanes(x: jax.Array, n: int, b_blk: int):
    """(..., n, n) -> ((n, n, B_padded), batch_shape, batch)."""
    batch_shape = x.shape[:-2]
    flat = x.reshape(-1, n, n)
    b = flat.shape[0]
    lanes = jnp.moveaxis(flat, 0, -1)  # (n, n, b)
    pad = (-b) % b_blk
    if pad:
        lanes = jnp.pad(lanes, ((0, 0), (0, 0), (0, pad)))
    return lanes, batch_shape, b


# ---------------------------------------------------------------------------
# Complex-symmetric eigenvalues (the KBDM reduced problem)
# ---------------------------------------------------------------------------

def _eig_cs_kernel(ar_ref, ai_ref, mur_ref, mui_ref, off_ref, sr, si, *,
                   n: int, sweeps: int):
    sr[:] = ar_ref[:]
    si[:] = ai_ref[:]

    def cdiv(xr, xi, yr, yi):
        d = yr * yr + yi * yi + 1e-38
        return (xr * yr + xi * yi) / d, (xi * yr - xr * yi) / d

    def csqrt(xr, xi):
        r = jnp.sqrt(xr * xr + xi * xi)
        re = jnp.sqrt(jnp.maximum(0.5 * (r + xr), 0.0))
        im = jnp.sqrt(jnp.maximum(0.5 * (r - xr), 0.0))
        return re, jnp.where(xi < 0, -im, im)

    def cmul(xr, xi, yr, yi):
        return xr * yr - xi * yi, xr * yi + xi * yr

    def round_body(step, carry):
        r = jax.lax.rem(step, n - 1)
        for k in range(n // 2):
            i, j = _rr_pair(r, k, n)
            a_r, a_i = sr[i, i, :], si[i, i, :]
            d_r, d_i = sr[j, j, :], si[j, j, :]
            b_r, b_i = sr[i, j, :], si[i, j, :]
            babs = jnp.sqrt(b_r * b_r + b_i * b_i)
            dscale = jnp.sqrt(a_r * a_r + a_i * a_i
                              + d_r * d_r + d_i * d_i) + 1e-30
            skip = babs <= 1e-7 * dscale

            # tau = (d - a) / (2 b);  root = sqrt(tau^2 + 1)
            tr, ti = cdiv(d_r - a_r, d_i - a_i, 2.0 * b_r, 2.0 * b_i)
            t2r = tr * tr - ti * ti + 1.0
            t2i = 2.0 * tr * ti
            rr, ri = csqrt(t2r, t2i)
            d1 = jnp.sqrt((tr + rr) ** 2 + (ti + ri) ** 2)
            d2 = jnp.sqrt((tr - rr) ** 2 + (ti - ri) ** 2)
            use1 = d1 >= d2
            den_r = jnp.where(use1, tr + rr, tr - rr)
            den_i = jnp.where(use1, ti + ri, ti - ri)
            one = jnp.ones_like(den_r)
            zero = jnp.zeros_like(den_r)
            t_r, t_i = cdiv(one, zero, den_r, den_i)
            # c = 1/sqrt(1 + t^2), s = c t;  guard near-defective pairs
            ct2r = t_r * t_r - t_i * t_i + 1.0
            ct2i = 2.0 * t_r * t_i
            skip = skip | (jnp.sqrt(ct2r * ct2r + ct2i * ct2i) < 1e-12)
            sq_r, sq_i = csqrt(ct2r, ct2i)
            c_r, c_i = cdiv(one, zero, sq_r, sq_i)
            s_r, s_i = cmul(c_r, c_i, t_r, t_i)
            c_r = jnp.where(skip, 1.0, c_r)
            c_i = jnp.where(skip, 0.0, c_i)
            s_r = jnp.where(skip, 0.0, s_r)
            s_i = jnp.where(skip, 0.0, s_i)

            # Row update (J^T A): row_i' = c ri - s rj; row_j' = s ri + c rj
            ri_r, ri_i = sr[i, :, :], si[i, :, :]
            rj_r, rj_i = sr[j, :, :], si[j, :, :]
            ni_r = c_r * ri_r - c_i * ri_i - (s_r * rj_r - s_i * rj_i)
            ni_i = c_r * ri_i + c_i * ri_r - (s_r * rj_i + s_i * rj_r)
            nj_r = s_r * ri_r - s_i * ri_i + c_r * rj_r - c_i * rj_i
            nj_i = s_r * ri_i + s_i * ri_r + c_r * rj_i + c_i * rj_r

            # 2x2 entry fix (column transform restricted to rows i, j):
            # B2 = J^T [[a, b], [b, d]];  A' entries = B2 J.
            b00r, b00i = cmul(c_r, c_i, a_r, a_i)
            t1r, t1i = cmul(s_r, s_i, b_r, b_i)
            b00r, b00i = b00r - t1r, b00i - t1i
            b01r, b01i = cmul(c_r, c_i, b_r, b_i)
            t2ar, t2ai = cmul(s_r, s_i, d_r, d_i)
            b01r, b01i = b01r - t2ar, b01i - t2ai
            b10r, b10i = cmul(s_r, s_i, a_r, a_i)
            t3r, t3i = cmul(c_r, c_i, b_r, b_i)
            b10r, b10i = b10r + t3r, b10i + t3i
            b11r, b11i = cmul(s_r, s_i, b_r, b_i)
            t4r, t4i = cmul(c_r, c_i, d_r, d_i)
            b11r, b11i = b11r + t4r, b11i + t4i

            nii_r, nii_i = cmul(c_r, c_i, b00r, b00i)
            u1r, u1i = cmul(s_r, s_i, b01r, b01i)
            nii_r, nii_i = nii_r - u1r, nii_i - u1i
            nij_r, nij_i = cmul(s_r, s_i, b00r, b00i)
            u2r, u2i = cmul(c_r, c_i, b01r, b01i)
            nij_r, nij_i = nij_r + u2r, nij_i + u2i
            njj_r, njj_i = cmul(s_r, s_i, b10r, b10i)
            u3r, u3i = cmul(c_r, c_i, b11r, b11i)
            njj_r, njj_i = njj_r + u3r, njj_i + u3i

            # fold entry fixes into the rows, write rows, then columns =
            # transposed rows (complex-symmetric) to refresh other rows'
            # (·, i), (·, j) entries.
            pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            is_i, is_j = pos == i, pos == j
            ni_r = jnp.where(is_i, nii_r, jnp.where(is_j, nij_r, ni_r))
            ni_i = jnp.where(is_i, nii_i, jnp.where(is_j, nij_i, ni_i))
            nj_r = jnp.where(is_j, njj_r, jnp.where(is_i, nij_r, nj_r))
            nj_i = jnp.where(is_j, njj_i, jnp.where(is_i, nij_i, nj_i))
            sr[i, :, :] = ni_r
            si[i, :, :] = ni_i
            sr[j, :, :] = nj_r
            si[j, :, :] = nj_i
            sr[:, i, :] = ni_r
            si[:, i, :] = ni_i
            sr[:, j, :] = nj_r
            si[:, j, :] = nj_i
        return carry

    jax.lax.fori_loop(0, sweeps * (n - 1), round_body, 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    for q in range(n):
        mur_ref[q, :] = sr[q, q, :]
        mui_ref[q, :] = si[q, q, :]
        # convergence counter: per-row off-diagonal energy of the final
        # matrix (SURVEY.md §5 metrics row) — ~free, reuses the final rows.
        # The diagonal is EXCLUDED BY MASK, not subtracted afterwards:
        # sum(row^2) - diag^2 cancels to exactly 0 whenever the off-diag
        # energy is below ~eps_f32 * diag^2 (~1e-7 relative), which floored
        # the counter at "< ~3e-4 relative off-diag norm" and made tuning
        # the sweep budget impossible (round-4 review weak #1).
        row_r, row_i = sr[q, :, :], si[q, :, :]
        offmask = (pos != q).astype(row_r.dtype)
        off_ref[q, :] = jnp.sum((row_r * row_r + row_i * row_i) * offmask,
                                axis=0)


def eig_cs(a: CArr, sweeps: int = 10, interpret: bool = False) -> CArr:
    """Batched complex-symmetric eigenvalues (Pallas TPU kernel).

    a : CArr (..., n, n), a = a^T (NOT Hermitian).  Returns CArr (..., n) of
    eigenvalues (unordered) — same contract as ops.jacobi.eig_cs.
    """
    mu, _ = eig_cs_resid(a, sweeps=sweeps, interpret=interpret)
    return mu


def eig_cs_resid(a: CArr, sweeps: int = 10, interpret: bool = False):
    """eig_cs plus the final off-diagonal Frobenius norm per matrix
    (..., ) — the Jacobi convergence counter surfaced by bench.py."""
    n = a.re.shape[-1]
    pad_n = n % 2
    ar, ai = a.re, a.im
    if pad_n:
        padcfg = [(0, 0)] * (ar.ndim - 2) + [(0, 1), (0, 1)]
        ar, ai = jnp.pad(ar, padcfg), jnp.pad(ai, padcfg)
    ne = n + pad_n

    b_blk = _pick_block(ne, int(jnp.size(ar)) // (ne * ne), n_bufs=6)
    lr, batch_shape, batch = _to_lanes(ar, ne, b_blk)
    li, _, _ = _to_lanes(ai, ne, b_blk)
    grid = (lr.shape[-1] // b_blk,)

    spec = pl.BlockSpec((ne, ne, b_blk), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((ne, b_blk), lambda g: (0, g),
                           memory_space=pltpu.VMEM)
    mur, mui, off = pl.pallas_call(
        functools.partial(_eig_cs_kernel, n=ne, sweeps=sweeps),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((ne, lr.shape[-1]), lr.dtype),
                   jax.ShapeDtypeStruct((ne, lr.shape[-1]), lr.dtype),
                   jax.ShapeDtypeStruct((ne, lr.shape[-1]), lr.dtype)),
        in_specs=[spec, spec],
        out_specs=(mu_spec, mu_spec, mu_spec),
        scratch_shapes=[pltpu.VMEM((ne, ne, b_blk), lr.dtype)] * 2,
        interpret=interpret,
    )(lr, li)

    resid = jnp.sqrt(jnp.maximum(jnp.sum(off, axis=0), 0.0))
    resid = jnp.moveaxis(resid, -1, 0)[:batch].reshape(*batch_shape)
    mur = jnp.moveaxis(mur, -1, 0)[:batch, :n].reshape(*batch_shape, n)
    mui = jnp.moveaxis(mui, -1, 0)[:batch, :n].reshape(*batch_shape, n)
    return CArr(mur, mui), resid
