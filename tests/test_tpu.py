"""On-TPU accuracy assertions — marked `tpu`; run on the real chip with:

    LLCKBDM_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

The default (CPU-forced) suite skips these.  They assert that the Pallas
kernel path — one-sided Jacobi SVD, CholeskyQR2, Cholesky solve, and the
complex-symmetric Jacobi eigensolver, plus the bf16x6-HIGHEST matmul
numerics of the real chip — meets the same oracle gates as the CPU path
(round-2 VERDICT task 5: the gate had never been asserted on hardware).
Latest recorded chip run: see BASELINE.md "Measured".
"""
import numpy as np
import pytest

import jax

import llckbdm_tpu as lt
from llckbdm_tpu.oracle import reference as oracle
from llckbdm_tpu.ops.cplx import from_np, to_np
from llckbdm_tpu.solver.refine import (RefineConfig, refine_lines,
                                       refined_to_np)
from llckbdm_tpu.utils import df as D

on_tpu = jax.devices()[0].platform == "tpu"
pytestmark = pytest.mark.tpu
skip_unless_tpu = pytest.mark.skipif(
    not on_tpu, reason="needs the real TPU (LLCKBDM_TPU_TESTS=1)")


@skip_unless_tpu
def test_tpu_config1_refined_hits_1e8_gate(five_peak_signal,
                                           five_peak_params):
    """Config-1 fit + refine ON THE CHIP matches the f64 scipy oracle to
    <= 1e-8 relative (BASELINE.json:5)."""
    sig, dwell = five_peak_signal
    olines, _ = oracle.kbdm(sig, dwell, m=180, p=16)
    olines = olines[oracle.match_lines(olines, five_peak_params)]

    lines = jax.jit(
        lambda c: lt.kbdm_fit(c, dwell, 180, lt.KbdmConfig(p=16))
    )(from_np(sig))
    ref = jax.jit(
        lambda s, l: refine_lines(s, l, dwell, RefineConfig(iters=3))
    )(D.dfc_from_np(sig), lines)
    est = refined_to_np(ref, dwell)
    sel = oracle.match_lines(est, five_peak_params)
    err = oracle.line_errors(est[sel], olines)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"


@skip_unless_tpu
def test_tpu_pallas_kernels_vs_scipy():
    """The Pallas kernels compiled for the real chip match scipy.

    Sweep counts deliberately MATCH the pipeline defaults (eigh_sweeps=8,
    eig_sweeps=10): the sweep count is baked into the kernel, and a fresh
    Mosaic compile through the remote-compile service takes ~3 min, so
    off-default counts would recompile instead of hitting the cache.
    """
    import scipy.linalg
    from llckbdm_tpu.ops import pallas_jacobi, pallas_linalg

    rng = np.random.default_rng(0)
    m = rng.standard_normal((8, 16, 16)) + 1j * rng.standard_normal((8, 16, 16))

    s, v = pallas_linalg.gram_svd(from_np(m), sweeps=8)
    s = np.asarray(s)
    for b in range(8):
        lam = np.sort(scipy.linalg.eigvalsh(m[b] @ m[b].conj().T))[::-1]
        np.testing.assert_allclose(s[b] ** 2, lam, rtol=1e-4,
                                   atol=1e-4 * lam[0])

    g = np.einsum("bij,bik->bjk", m.conj(), m) + 0.5 * np.eye(16)
    bb = rng.standard_normal((8, 16)) + 1j * rng.standard_normal((8, 16))
    x = to_np(pallas_linalg.chol_solve(from_np(g), from_np(bb),
                                       np.zeros(8, np.float32)))
    for b in range(8):
        xe = scipy.linalg.solve(g[b], bb[b])
        np.testing.assert_allclose(x[b], xe, rtol=1e-3, atol=1e-4)

    # complex-symmetric matrices with EXACTLY known, well-separated
    # KBDM-like eigenvalues: A = Q D Q^T with Q real orthogonal keeps
    # A = A^T and spectrum D (random dense 16x16 can have near-degenerate
    # pairs that legitimately need >10 sweeps)
    evals = np.exp(2j * np.pi * rng.uniform(-0.4, 0.4, (8, 16))
                   - rng.uniform(0.01, 0.3, (8, 16)))
    a = np.empty((8, 16, 16), complex)
    for b in range(8):
        q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
        a[b] = q @ np.diag(evals[b]) @ q.T
    mu = to_np(pallas_jacobi.eig_cs(from_np(a), sweeps=10))
    for b in range(8):
        # greedy nearest matching (multiset comparison robust to ordering)
        exp = list(evals[b])
        for z in mu[b]:
            j = int(np.argmin(np.abs(np.array(exp) - z)))
            assert abs(exp[j] - z) < 3e-3, (z, exp)
            exp.pop(j)


@skip_unless_tpu
def test_tpu_llc_kbdm_wrapper_refined(five_peak_signal, five_peak_params):
    """The numpy-convenience llc_kbdm entry point, on the chip, with the
    double-float polish: recovers the 5 lines to f64-level accuracy."""
    sig, dwell = five_peak_signal
    cons, pooled, counts = lt.llc_kbdm(sig, dwell, range(120, 181, 10),
                                       p=16, eps=2e-4, min_samples=5,
                                       refine_iters=6)
    assert len(cons) >= 5 and len(pooled) > len(cons)
    sel = oracle.match_lines(cons, five_peak_params)
    err = oracle.line_errors(cons[sel], five_peak_params)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"
