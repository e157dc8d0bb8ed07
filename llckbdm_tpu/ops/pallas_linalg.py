"""Pallas TPU kernels replacing Hermitian eigh on the hot path.

Measured on v5e (tools/bench_eigh_variants.py; roofline context in
BASELINE.md "Per-stage roofline"): per-pair COLUMN writes and in-kernel
transposes of the (n, n, lanes) layout relayout through sublanes and cost
~1 us each, which makes a two-sided Hermitian Jacobi kernel slower than the
XLA scan it replaces.  All kernels here are therefore ROWS-ONLY — the only
per-element primitives used are dynamic row load/store on the outer dim,
(B,)-shaped element extracts, and sublane reductions, all measured fast:

* :func:`gram_svd`   — eigendecomposition of m m^H WITHOUT forming it:
                       one-sided Jacobi on F = m^H.  A right column
                       rotation of F is a row op on the stored F^T, and F^T
                       rows are independent (no symmetry to maintain, hence
                       no column write-back).  Returns (s, v) with
                       m m^H = v diag(s^2) v^H — drop-in for the
                       eigh(m m^H) step of the Takagi factorization, with
                       better small-singular-value accuracy (the k x k Gram
                       is never formed, only 2 x 2 pairwise entries).
* :func:`cholqr_rinv`— shifted Cholesky of G + ridge*I and the upper
                       triangular inverse R^{-1}: the CholeskyQR2
                       orthonormalization building block replacing the
                       Lowner (eigh) orthogonalization.
* :func:`chol_solve` — (G + shift*I) x = b via Cholesky + two triangular
                       substitutions; replaces the eigh-based
                       hermitian_solve on TPU (Tikhonov regularization in
                       place of eigenvalue truncation — same role: keep the
                       solve bounded for near-duplicate poles).

All kernels put the batch in the 128-wide lane axis ((k, k, B) blocks) and
run the full factorization per grid step in VMEM.  The XLA (eigh-based)
implementations in ops.linalg remain the CPU path and the cross-check.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cplx import CArr

_LANE = 128


def _pick_block(n: int, n_bufs: int) -> int:
    budget = 10 * 2 ** 20
    per_lane = max(n_bufs * n * n * 4, 1)
    b = (budget // per_lane // _LANE) * _LANE
    return max(_LANE, min(512, b))


def _to_lanes(x: jax.Array, b_blk: int):
    """(..., k, k) or (..., k) -> lanes-last padded layout + restore info."""
    batch_shape = x.shape[:-2] if x.ndim >= 2 else ()
    core = x.shape[len(batch_shape):]
    flat = x.reshape(-1, *core)
    b = flat.shape[0]
    lanes = jnp.moveaxis(flat, 0, -1)
    pad = (-b) % b_blk
    if pad:
        cfg = [(0, 0)] * (lanes.ndim - 1) + [(0, pad)]
        lanes = jnp.pad(lanes, cfg)
    return lanes, batch_shape, b


# ---------------------------------------------------------------------------
# One-sided Jacobi SVD of F = m^H  (eigh(m m^H) replacement)
# ---------------------------------------------------------------------------

def _gram_svd_kernel(fr_ref, fi_ref, s_ref, vtr_ref, vti_ref, fr, fi, *,
                     k: int, sweeps: int):
    fr[:] = fr_ref[:]
    fi[:] = fi_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(fr_ref.dtype)
    vtr_ref[:] = jnp.broadcast_to(eye, vtr_ref.shape)
    vti_ref[:] = jnp.zeros_like(vti_ref)

    def round_body(step, carry):
        r = jax.lax.rem(step, k - 1)
        for q in range(k // 2):
            m = k - 1
            if q == 0:
                i, j = k - 1, r
            else:
                i = jax.lax.rem(r + q, m)
                j = jax.lax.rem(r - q + m, m)
            # pairwise Gram entries of columns i, j of F (= rows of F^T)
            fi_r, fi_i = fr[i, :, :], fi[i, :, :]
            fj_r, fj_i = fr[j, :, :], fi[j, :, :]
            gii = jnp.sum(fi_r * fi_r + fi_i * fi_i, axis=0)
            gjj = jnp.sum(fj_r * fj_r + fj_i * fj_i, axis=0)
            gr = jnp.sum(fi_r * fj_r + fi_i * fj_i, axis=0)
            gi = jnp.sum(fi_r * fj_i - fi_i * fj_r, axis=0)
            babs = jnp.sqrt(gr * gr + gi * gi)
            skip = babs <= 1e-7 * jnp.sqrt(gii * gjj) + 1e-30
            safe_b = jnp.where(skip, 1.0, babs)
            wr = jnp.where(skip, 1.0, gr / safe_b)
            wi = jnp.where(skip, 0.0, gi / safe_b)
            # |w| MUST be exactly 1 or the rotation scales the columns: for
            # tiny g the squares in babs underflow (gr ~ 1e-19 -> gr^2
            # denormal/flushed) and g/babs comes out with |w| up to ~1.2,
            # which blows up sigma over sweeps (measured).  Renormalize.
            wn = jax.lax.rsqrt(wr * wr + wi * wi)
            wr = wr * wn
            wi = wi * wn
            tau = (gjj - gii) / (2.0 * safe_b)
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(tau == 0.0, 1.0, t)
            c = jax.lax.rsqrt(1.0 + t * t)
            s = c * t
            c = jnp.where(skip, 1.0, c)
            s = jnp.where(skip, 0.0, s)
            # column rotation (F J): f_i' = c f_i - s conj(w) f_j;
            #                        f_j' = s f_i + c conj(w) f_j
            wfj_r = wr * fj_r + wi * fj_i
            wfj_i = wr * fj_i - wi * fj_r
            fr[i, :, :] = c * fi_r - s * wfj_r
            fi[i, :, :] = c * fi_i - s * wfj_i
            fr[j, :, :] = s * fi_r + c * wfj_r
            fi[j, :, :] = s * fi_i + c * wfj_i
            # accumulate V: V' = V J  ->  vt rows with the same coefficients
            vi_r, vi_i = vtr_ref[i, :, :], vti_ref[i, :, :]
            vj_r, vj_i = vtr_ref[j, :, :], vti_ref[j, :, :]
            wvj_r = wr * vj_r + wi * vj_i
            wvj_i = wr * vj_i - wi * vj_r
            vtr_ref[i, :, :] = c * vi_r - s * wvj_r
            vti_ref[i, :, :] = c * vi_i - s * wvj_i
            vtr_ref[j, :, :] = s * vi_r + c * wvj_r
            vti_ref[j, :, :] = s * vi_i + c * wvj_i
        return carry

    jax.lax.fori_loop(0, sweeps * (k - 1), round_body, 0)
    for l in range(k):
        fl_r, fl_i = fr[l, :, :], fi[l, :, :]
        s_ref[l, :] = jnp.sqrt(jnp.sum(fl_r * fl_r + fl_i * fl_i, axis=0))


def gram_svd(m: CArr, sweeps: int = 10, interpret: bool = False):
    """Eigendecomposition of m m^H via one-sided Jacobi on F = m^H.

    m : CArr (..., k, k).  Returns (s, v): singular values of m (...,k)
    sorted descending and unitary v (..., k, k) with
    m m^H ~= v diag(s^2) v^H.  Drop-in for
    ``lam, u = jacobi.eigh(m @ m^H)`` with ``lam = s**2, u = v``.
    """
    kk = m.re.shape[-1]
    pad_n = kk % 2
    # F^T = (m^H)^T = conj(m): stored rows are F's columns
    ftr, fti = m.re, -m.im
    if pad_n:
        cfg = [(0, 0)] * (ftr.ndim - 2) + [(0, 1), (0, 1)]
        ftr, fti = jnp.pad(ftr, cfg), jnp.pad(fti, cfg)
    ke = kk + pad_n

    b_blk = _pick_block(ke, n_bufs=8)
    lr, batch_shape, batch = _to_lanes(ftr, b_blk)
    li, _, _ = _to_lanes(fti, b_blk)
    grid = (lr.shape[-1] // b_blk,)
    spec = pl.BlockSpec((ke, ke, b_blk), lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((ke, b_blk), lambda g: (0, g),
                         memory_space=pltpu.VMEM)
    sig, vtr, vti = pl.pallas_call(
        functools.partial(_gram_svd_kernel, k=ke, sweeps=sweeps),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((ke, lr.shape[-1]), lr.dtype),
                   jax.ShapeDtypeStruct(lr.shape, lr.dtype),
                   jax.ShapeDtypeStruct(lr.shape, lr.dtype)),
        in_specs=[spec, spec],
        out_specs=(vspec, spec, spec),
        scratch_shapes=[pltpu.VMEM((ke, ke, b_blk), lr.dtype)] * 2,
        interpret=interpret,
    )(lr, li)

    sig = jnp.moveaxis(sig, -1, 0)[:batch]            # (B, ke)
    # v[b, r, c] = vt[c, r, b]
    v_re = jnp.transpose(vtr, (2, 1, 0))[:batch]
    v_im = jnp.transpose(vti, (2, 1, 0))[:batch]

    # Descending sort WITHOUT sort/gather ops: XLA take_along_axis on the
    # (B, k, k) eigenvector block costs ~180 ms at pipeline shapes on v5e
    # (and argsort another ~35 ms); an O(k^2) elementwise rank + one-hot
    # permutation applied as an MXU matmul is ~5x cheaper.
    gt = (sig[..., None, :] > sig[..., :, None])
    eq_before = ((sig[..., None, :] == sig[..., :, None])
                 & (jnp.arange(ke)[None, :] < jnp.arange(ke)[:, None]))
    rank = jnp.sum(gt | eq_before, axis=-1)           # (B, ke) in [0, ke)
    onehot = (rank[..., :, None]
              == jnp.arange(ke)[None, :]).astype(sig.dtype)  # (B, src, dst)
    sig = jnp.einsum("bsd,bs->bd", onehot, sig)[..., :kk]
    mm = lambda a: jnp.matmul(a, onehot,
                              preferred_element_type=a.dtype)[..., :kk, :kk]
    return (sig.reshape(*batch_shape, kk),
            CArr(mm(v_re).reshape(*batch_shape, kk, kk),
                 mm(v_im).reshape(*batch_shape, kk, kk)))


# ---------------------------------------------------------------------------
# Cholesky building blocks (rows-only, fully in-kernel)
# ---------------------------------------------------------------------------

def _chol_inplace(sr, si, shift, k: int):
    """In-place upper Cholesky G + shift*I = R^H R on (k, k, B) scratch.

    Entries below the diagonal are garbage afterwards (never read).
    shift : (B,) added to the diagonal first.

    The trailing-submatrix elimination is ONE masked rank-1 update of the
    whole (k, k, B) block per pivot — k full-block VPU ops total — instead
    of the per-row inner loop (k^2 small sequential steps), which measured
    ~12-15 ms per call at sweep shapes and dominated the whole subspace
    iteration (tools/ablate_sweep.py).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(sr.dtype)
    sr[:] = sr[:] + eye * shift[None, :]
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)

    def step(i, carry):
        d = jnp.maximum(sr[i, i, :], 1e-30)
        dinv = jax.lax.rsqrt(d)
        ri_r = sr[i, :, :] * dinv                      # (k, B) = R[i, :]
        ri_i = si[i, :, :] * dinv
        sr[i, :, :] = ri_r
        si[i, :, :] = ri_i
        # rows r > i:  row_r -= conj(R[i, r]) * R[i, :]
        below = jnp.where(rowpos > i, 1.0, 0.0).astype(sr.dtype)
        cr = ri_r[:, None, :]                          # coef per row r
        ci = ri_i[:, None, :]
        sr[:, :, :] = sr[:, :, :] - below * (cr * ri_r[None, :, :]
                                             + ci * ri_i[None, :, :])
        si[:, :, :] = si[:, :, :] - below * (cr * ri_i[None, :, :]
                                             - ci * ri_r[None, :, :])
        return carry
    jax.lax.fori_loop(0, k, step, 0)


def _cholqr_kernel(g_re_ref, g_im_ref, shift_ref, xr_ref, xi_ref, sr, si, *,
                   k: int):
    sr[:] = g_re_ref[:]
    si[:] = g_im_ref[:]
    _chol_inplace(sr, si, shift_ref[0, :], k)

    # upper triangular inverse X = R^{-1}:
    #   X[i, :] = (e_i - sum_{p>i} R[i, p] X[p, :]) / R[i, i]
    # The p-sum is ONE masked full-block multiply + sublane reduction per
    # step (vs a k-step inner loop; see _chol_inplace note).
    xr_ref[:] = jnp.zeros_like(xr_ref)
    xi_ref[:] = jnp.zeros_like(xi_ref)
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    ppos = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)

    def step(ii, carry):
        i = k - 1 - ii
        dinv = 1.0 / jnp.maximum(sr[i, i, :], 1e-30)
        below = jnp.where(ppos > i, 1.0, 0.0).astype(xr_ref.dtype)
        cr = sr[i, :, :][:, None, :] * below           # R[i, p] per row p
        ci = si[i, :, :][:, None, :] * below
        acc_r = jnp.where(pos == i, 1.0, 0.0).astype(xr_ref.dtype) \
            - jnp.sum(cr * xr_ref[:, :, :] - ci * xi_ref[:, :, :], axis=0)
        acc_i = -jnp.sum(cr * xi_ref[:, :, :] + ci * xr_ref[:, :, :], axis=0)
        xr_ref[i, :, :] = acc_r * dinv
        xi_ref[i, :, :] = acc_i * dinv
        return carry
    jax.lax.fori_loop(0, k, step, 0)


def cholqr_rinv(g: CArr, shift: jax.Array, interpret: bool = False) -> CArr:
    """R^{-1} (upper) with G + shift*I = R^H R, batched.

    g : CArr (..., k, k) Hermitian PSD;  shift : (...,) per-matrix diagonal
    shift (absolute).  Returns CArr (..., k, k) upper-triangular R^{-1};
    Q = y @ R^{-1} orthonormalizes y when G = y^H y (CholeskyQR).
    """
    k = g.re.shape[-1]
    b_blk = _pick_block(k, n_bufs=8)
    lr, batch_shape, batch = _to_lanes(g.re, b_blk)
    li, _, _ = _to_lanes(g.im, b_blk)
    sh = jnp.broadcast_to(jnp.asarray(shift, lr.dtype),
                          batch_shape if batch_shape else (1,)).reshape(-1)
    sh = jnp.pad(sh, (0, lr.shape[-1] - sh.shape[0]))[None, :]   # (1, Bpad)

    grid = (lr.shape[-1] // b_blk,)
    spec = pl.BlockSpec((k, k, b_blk), lambda g_: (0, 0, g_),
                        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, b_blk), lambda g_: (0, g_),
                         memory_space=pltpu.VMEM)
    xr, xi = pl.pallas_call(
        functools.partial(_cholqr_kernel, k=k),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct(lr.shape, lr.dtype),
                   jax.ShapeDtypeStruct(lr.shape, lr.dtype)),
        in_specs=[spec, spec, sspec],
        out_specs=(spec, spec),
        scratch_shapes=[pltpu.VMEM((k, k, b_blk), lr.dtype)] * 2,
        interpret=interpret,
    )(lr, li, sh)
    xr = jnp.moveaxis(xr, -1, 0)[:batch].reshape(*batch_shape, k, k)
    xi = jnp.moveaxis(xi, -1, 0)[:batch].reshape(*batch_shape, k, k)
    return CArr(xr, xi)


def _chol_solve_kernel(g_re_ref, g_im_ref, br_ref, bi_ref, shift_ref,
                       xr_ref, xi_ref, sr, si, yr, yi, *, k: int):
    sr[:] = g_re_ref[:]
    si[:] = g_im_ref[:]
    _chol_inplace(sr, si, shift_ref[0, :], k)

    # zero-init: later rows are read (masked) before being written, and
    # 0 * uninitialized could be NaN
    yr[:] = jnp.zeros_like(yr)
    yi[:] = jnp.zeros_like(yi)

    # Substitutions: each step's p-sum is ONE masked (k, B) multiply +
    # sublane reduction (vs a k-step inner loop; see _chol_inplace note).
    ppos = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    # forward: R^H y = b  (R^H lower, diag real):
    #   y[i] = (b[i] - sum_{p<i} conj(R[p, i]) y[p]) / R[i, i]
    def fwd(i, carry):
        above = jnp.where(ppos < i, 1.0, 0.0).astype(yr.dtype)
        col_r = sr[:, i, :] * above                # R[p, i] per row p
        col_i = si[:, i, :] * above
        acc_r = br_ref[i, :] - jnp.sum(col_r * yr[:, :]
                                       + col_i * yi[:, :], axis=0)
        acc_i = bi_ref[i, :] - jnp.sum(col_r * yi[:, :]
                                       - col_i * yr[:, :], axis=0)
        dinv = 1.0 / jnp.maximum(sr[i, i, :], 1e-30)
        yr[i, :] = acc_r * dinv
        yi[i, :] = acc_i * dinv
        return carry
    jax.lax.fori_loop(0, k, fwd, 0)

    # backward: R x = y:  x[i] = (y[i] - sum_{p>i} R[i, p] x[p]) / R[i, i]
    xr_ref[:] = jnp.zeros_like(xr_ref)
    xi_ref[:] = jnp.zeros_like(xi_ref)

    def bwd(ii, carry):
        i = k - 1 - ii
        below = jnp.where(ppos > i, 1.0, 0.0).astype(xr_ref.dtype)
        row_r = sr[i, :, :] * below                # (k, B) R[i, p] per p
        row_i = si[i, :, :] * below
        acc_r = yr[i, :] - jnp.sum(row_r * xr_ref[:, :]
                                   - row_i * xi_ref[:, :], axis=0)
        acc_i = yi[i, :] - jnp.sum(row_r * xi_ref[:, :]
                                   + row_i * xr_ref[:, :], axis=0)
        dinv = 1.0 / jnp.maximum(sr[i, i, :], 1e-30)
        xr_ref[i, :] = acc_r * dinv
        xi_ref[i, :] = acc_i * dinv
        return carry
    jax.lax.fori_loop(0, k, bwd, 0)


def chol_solve(g: CArr, b: CArr, shift: jax.Array,
               interpret: bool = False) -> CArr:
    """Solve (G + shift*I) x = b for Hermitian PSD G, batched.

    g : CArr (..., k, k);  b : CArr (..., k);  shift : (...,) absolute
    diagonal shift (Tikhonov).  Returns CArr (..., k).
    """
    k = g.re.shape[-1]
    b_blk = _pick_block(k, n_bufs=6)
    lr, batch_shape, batch = _to_lanes(g.re, b_blk)
    li, _, _ = _to_lanes(g.im, b_blk)
    bflat_r = jnp.moveaxis(b.re.reshape(-1, k), 0, -1)
    bflat_i = jnp.moveaxis(b.im.reshape(-1, k), 0, -1)
    pad = lr.shape[-1] - bflat_r.shape[-1]
    if pad:
        bflat_r = jnp.pad(bflat_r, ((0, 0), (0, pad)))
        bflat_i = jnp.pad(bflat_i, ((0, 0), (0, pad)))
    sh = jnp.broadcast_to(jnp.asarray(shift, lr.dtype),
                          batch_shape if batch_shape else (1,)).reshape(-1)
    sh = jnp.pad(sh, (0, lr.shape[-1] - sh.shape[0]))[None, :]

    grid = (lr.shape[-1] // b_blk,)
    spec = pl.BlockSpec((k, k, b_blk), lambda g_: (0, 0, g_),
                        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((k, b_blk), lambda g_: (0, g_),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, b_blk), lambda g_: (0, g_),
                         memory_space=pltpu.VMEM)
    xr, xi = pl.pallas_call(
        functools.partial(_chol_solve_kernel, k=k),
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((k, lr.shape[-1]), lr.dtype),
                   jax.ShapeDtypeStruct((k, lr.shape[-1]), lr.dtype)),
        in_specs=[spec, spec, vspec, vspec, sspec],
        out_specs=(vspec, vspec),
        scratch_shapes=[pltpu.VMEM((k, k, b_blk), lr.dtype)] * 2
                       + [pltpu.VMEM((k, b_blk), lr.dtype)] * 2,
        interpret=interpret,
    )(lr, li, bflat_r, bflat_i, sh)
    xr = jnp.moveaxis(xr, -1, 0)[:batch].reshape(*batch_shape, k)
    xi = jnp.moveaxis(xi, -1, 0)[:batch].reshape(*batch_shape, k)
    return CArr(xr, xi)
