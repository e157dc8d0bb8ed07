"""Default-suite (CPU) coverage of the Pallas TPU kernels via interpret mode.

The four kernels in ops.pallas_jacobi / ops.pallas_linalg ARE the TPU hot
path (round-3 VERDICT: they previously ran only under LLCKBDM_TPU_TESTS=1,
i.e. never in CI).  Pallas ``interpret=True`` executes the exact kernel
program on the host backend, so these tests catch kernel-logic regressions
without the chip; the real-chip lowering is asserted separately by the
tpu-marked tests (tests/test_tpu.py).

Cross-checks are against scipy/numpy f64 oracles at f32-kernel tolerances.
"""
import numpy as np
import pytest
import scipy.linalg

from llckbdm_tpu.ops import pallas_jacobi, pallas_linalg
from llckbdm_tpu.ops.cplx import from_np, to_np

rng = np.random.default_rng(42)


def _cs_matrices(b=6, n=16):
    """Complex-symmetric A = Q D Q^T (Q real orthogonal) with known,
    well-separated KBDM-like eigenvalues |mu| <~ 1.  Frequencies sit on a
    jittered grid (guaranteed angular separation): near-degenerate pairs
    legitimately converge slower than the fixed sweep budget and would test
    convergence, not kernel correctness."""
    grid = (np.arange(n) + rng.uniform(0.1, 0.9, (b, n))) / n * 0.8 - 0.4
    evals = np.exp(2j * np.pi * grid - rng.uniform(0.02, 0.3, (b, n)))
    a = np.empty((b, n, n), complex)
    for i in range(b):
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        a[i] = q @ np.diag(evals[i]) @ q.T
    return a, evals


def test_eig_cs_interpret_matches_known_eigenvalues():
    a, evals = _cs_matrices()
    mu = to_np(pallas_jacobi.eig_cs(from_np(a), sweeps=10, interpret=True))
    for b in range(a.shape[0]):
        exp = list(evals[b])
        for z in mu[b]:
            j = int(np.argmin(np.abs(np.array(exp) - z)))
            assert abs(exp[j] - z) < 3e-3, (z, exp[j])
            exp.pop(j)


def test_eig_cs_resid_interpret_reports_convergence():
    a, _ = _cs_matrices()
    mu, resid = pallas_jacobi.eig_cs_resid(from_np(a), sweeps=10,
                                           interpret=True)
    resid = np.asarray(resid)
    fro = np.linalg.norm(a, axis=(-1, -2))
    assert resid.shape == (a.shape[0],)
    # converged: off-diagonal energy down to f32 rotation-noise level
    assert (resid / fro < 1e-3).all(), resid / fro
    # and the resid-returning path yields the same eigenvalues as eig_cs
    mu2 = to_np(pallas_jacobi.eig_cs(from_np(a), sweeps=10, interpret=True))
    np.testing.assert_allclose(to_np(mu), mu2, rtol=0, atol=1e-6)


def test_eig_cs_resid_matches_scan_backend():
    """Pallas kernel (interpret) vs the lax.scan CPU formulation: same
    contract, compatible eigenvalues and convergence measure."""
    from llckbdm_tpu.ops import jacobi
    a, _ = _cs_matrices(b=4, n=8)
    mu_k, resid_k = pallas_jacobi.eig_cs_resid(from_np(a), sweeps=10,
                                               interpret=True)
    mu_s, resid_s = jacobi.eig_cs_resid(from_np(a), sweeps=10)
    for b in range(a.shape[0]):
        exp = sorted(to_np(mu_s)[b], key=lambda z: (z.real, z.imag))
        got = sorted(to_np(mu_k)[b], key=lambda z: (z.real, z.imag))
        np.testing.assert_allclose(got, exp, rtol=0, atol=5e-3)
    fro = np.linalg.norm(a, axis=(-1, -2))
    assert (np.asarray(resid_k) / fro < 1e-3).all()
    assert (np.asarray(resid_s) / fro < 1e-3).all()


def test_gram_svd_interpret_vs_scipy():
    m = rng.standard_normal((6, 16, 16)) + 1j * rng.standard_normal((6, 16, 16))
    s, v = pallas_linalg.gram_svd(from_np(m), sweeps=10, interpret=True)
    s, v = np.asarray(s), to_np(v)
    for b in range(6):
        lam = np.sort(scipy.linalg.eigvalsh(m[b] @ m[b].conj().T))[::-1]
        np.testing.assert_allclose(s[b] ** 2, lam, rtol=1e-4,
                                   atol=1e-4 * lam[0])
        # v unitary and diagonalizing: v^H (m m^H) v ~ diag(s^2)
        np.testing.assert_allclose(v[b].conj().T @ v[b], np.eye(16),
                                   atol=2e-4)
        d = v[b].conj().T @ (m[b] @ m[b].conj().T) @ v[b]
        np.testing.assert_allclose(d, np.diag(s[b] ** 2), atol=1e-3 * lam[0])


def test_chol_solve_interpret_vs_scipy():
    m = rng.standard_normal((5, 12, 12)) + 1j * rng.standard_normal((5, 12, 12))
    g = np.einsum("bij,bik->bjk", m.conj(), m) + 0.5 * np.eye(12)
    b = rng.standard_normal((5, 12)) + 1j * rng.standard_normal((5, 12))
    x = to_np(pallas_linalg.chol_solve(from_np(g), from_np(b),
                                       np.zeros(5, np.float32),
                                       interpret=True))
    for i in range(5):
        np.testing.assert_allclose(x[i], scipy.linalg.solve(g[i], b[i]),
                                   rtol=2e-3, atol=1e-4)


def test_chol_solve_interpret_shift_is_tikhonov():
    """The per-matrix diagonal shift must act as G + shift*I."""
    m = rng.standard_normal((3, 8, 8)) + 1j * rng.standard_normal((3, 8, 8))
    g = np.einsum("bij,bik->bjk", m.conj(), m) + 0.1 * np.eye(8)
    b = rng.standard_normal((3, 8)) + 1j * rng.standard_normal((3, 8))
    shift = np.array([0.5, 1.0, 2.0], np.float32)
    x = to_np(pallas_linalg.chol_solve(from_np(g), from_np(b), shift,
                                       interpret=True))
    for i in range(3):
        xe = scipy.linalg.solve(g[i] + shift[i] * np.eye(8), b[i])
        np.testing.assert_allclose(x[i], xe, rtol=2e-3, atol=1e-4)


def test_cholqr_rinv_interpret_orthonormalizes():
    """R^{-1} from the kernel: upper triangular, and for G = y^H y the
    product q = y R^{-1} is orthonormal (the CholeskyQR contract)."""
    y = rng.standard_normal((4, 48, 8)) + 1j * rng.standard_normal((4, 48, 8))
    g = np.einsum("bij,bik->bjk", y.conj(), y)
    shift = (1e-6 * np.einsum("bii->b", g.real) / 8).astype(np.float32)
    rinv = to_np(pallas_linalg.cholqr_rinv(from_np(g), shift,
                                           interpret=True))
    for b in range(4):
        # upper triangular
        np.testing.assert_allclose(np.tril(rinv[b], -1), 0.0, atol=1e-12)
        q = y[b] @ rinv[b]
        np.testing.assert_allclose(q.conj().T @ q, np.eye(8), atol=5e-3)
        # exact contract: rinv^H (G + shift I) rinv = I
        gs = g[b] + shift[b] * np.eye(8)
        np.testing.assert_allclose(rinv[b].conj().T @ gs @ rinv[b],
                                   np.eye(8), atol=5e-3)
