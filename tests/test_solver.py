"""Device KBDM solver + refinement vs the scipy oracle.

The headline gates (BASELINE.json:5):
  * f32 pipeline alone: poles to ~1e-3 relative (initialization quality)
  * + double-float Gauss-Newton refinement: 1e-8 relative vs the oracle
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import llckbdm_tpu as lt
from llckbdm_tpu.oracle import reference as oracle
from llckbdm_tpu.ops.cplx import from_np
from llckbdm_tpu.signals import line_list_to_np
from llckbdm_tpu.solver.refine import (RefineConfig, refine_lines,
                                       refined_to_np)
from llckbdm_tpu.utils import df as D


CFG = lt.KbdmConfig(p=16)


def test_kbdm_fit_config1(five_peak_signal, five_peak_params):
    sig, dwell = five_peak_signal
    lines = lt.kbdm_fit(from_np(sig), dwell, 180, CFG)
    est = line_list_to_np(lines)
    sel = oracle.match_lines(est, five_peak_params)
    est = est[sel]
    # f32 front end: frequencies to ~1e-3 relative of the band
    np.testing.assert_allclose(est[:, 2], five_peak_params[:, 2],
                               rtol=5e-3, atol=0.5)
    np.testing.assert_allclose(est[:, 0], five_peak_params[:, 0], rtol=0.1)


def test_kbdm_fit_batched_matches_single(five_peak_signal):
    sig, dwell = five_peak_signal
    single = lt.kbdm_fit(from_np(sig), dwell, 128, CFG)
    batch = lt.kbdm_fit(from_np(np.stack([sig, sig])), dwell, 128, CFG)
    np.testing.assert_allclose(np.asarray(batch.frequency[0]),
                               np.asarray(single.frequency),
                               rtol=1e-4, atol=1e-3)


def test_kbdm_sweep_shapes(five_peak_signal):
    sig, dwell = five_peak_signal
    m_values = (120, 160, 200)
    sweep = lt.kbdm_sweep(from_np(sig), dwell, m_values, CFG)
    assert sweep.amplitude.shape == (3, CFG.p)
    # every sweep entry finds the 5 genuine lines
    for s in range(3):
        assert int(np.sum(np.asarray(sweep.mask[s]) > 0.5)) >= 5


def test_kbdm_sweep_diag_convergence_counter(five_peak_signal):
    """with_diag=True surfaces the Jacobi off-diagonal counter measured on
    the PRODUCTION reduced matrices (round-3 VERDICT weak #1: the bench
    previously measured it on random dense matrices, where non-unitary
    complex-orthogonal rotations legitimately diverge).  On real KBDM
    spectra the solve must converge."""
    sig, dwell = five_peak_signal
    m_values = (120, 160, 200)
    lines, diag = lt.kbdm_sweep(from_np(sig), dwell, m_values, CFG,
                                with_diag=True)
    off = np.asarray(diag["eig_offdiag_rel"])
    assert off.shape == (3,)
    assert (off < 1e-3).all(), off
    # diag path returns the same lines as the plain path
    plain = lt.kbdm_sweep(from_np(sig), dwell, m_values, CFG)
    np.testing.assert_allclose(np.asarray(lines.frequency),
                               np.asarray(plain.frequency), atol=1e-6)


def test_kbdm_sweep_rejects_short_signal():
    with pytest.raises(ValueError):
        lt.kbdm_sweep(from_np(np.zeros(100, complex)), 1e-3, (64,), CFG)


@pytest.mark.parametrize("seed,noise", [(0, 0.0), (1, 1e-4), (2, 1e-4)])
def test_refined_hits_1e8_oracle_gate(five_peak_params, seed, noise):
    """The headline accuracy gate: f32 KBDM + df Gauss-Newton refinement
    matches the float64 scipy oracle to <= 1e-8 relative on all of
    (A, T2, f, phase) (BASELINE.json:5) — parameterized over per-voxel
    parameter jitter seeds and complex noise (round-2 VERDICT task 9:
    the gate was only ever asserted for the one noiseless signal).

    With noise, the linear-algebra KBDM estimate is no longer the LS
    estimator, so the oracle side is a float64 GN polish (oracle.refine)
    of the SAME initial line list and model order the device refines:
    both optimizers then share one least-squares fixed point and the gate
    asserts the double-float GN numerics match float64 — independent of
    the noise level.
    """
    dwell = 5e-4
    rng = np.random.default_rng(seed)
    params = five_peak_params.copy()
    params[:, 2] += rng.normal(scale=2.0, size=5)
    sig = oracle.sample_signal(params, 512, dwell)
    sig = sig + noise * (rng.standard_normal(512)
                         + 1j * rng.standard_normal(512))

    lines = lt.kbdm_fit(from_np(sig), dwell, 180, CFG)
    if noise == 0.0:
        # noiseless: the classic closed loop vs the f64 KBDM chain
        olines, _ = oracle.kbdm(sig, dwell, m=180, p=16)
        olines = olines[oracle.match_lines(olines, params)]
    else:
        # noisy: keep only the 5 genuine lines in the model on BOTH sides.
        # With junk slots included the noisy LS problem has near-degenerate
        # optima that differ in how junk absorbs noise (measured ~1e-4
        # coupling into the genuine lines); the 5-line LS optimum is unique.
        # Selection is top-5 BY AMPLITUDE (genuine lines are >= 0.5, junk
        # ~<= 0.1 — a relative threshold proved brittle to junk-amplitude
        # wobble across sweep-budget changes).
        amp = np.where(np.asarray(lines.mask) > 0.5,
                       np.asarray(lines.amplitude), 0.0)
        strong = amp >= np.sort(amp)[-5]
        lines = type(lines)(lines.amplitude, lines.t2, lines.frequency,
                            lines.phase, jnp.asarray(strong, jnp.float32))
        init = line_list_to_np(lines)
        assert len(init) == 5
        olines = oracle.refine(init, sig, dwell, iters=12)
        olines = olines[oracle.match_lines(olines, params)]

    ref = refine_lines(D.dfc_from_np(sig), lines, dwell,
                       RefineConfig(iters=6 if noise else 3))
    est = refined_to_np(ref, dwell)
    sel = oracle.match_lines(est, params)
    est = est[sel]
    err = oracle.line_errors(est, olines)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"


def test_refined_gate_at_1e3_noise_full_pipeline(five_peak_params):
    """1e-8 device-vs-oracle gate at noise sigma = 1e-3 (round-4 review
    next #6: gate evidence thinned out above 1e-4).  At this level the
    amplitude threshold of the single-m test above keeps ~11 lines (junk
    amplitudes reach percent scale), so genuine-line selection must go
    through the FULL LL-KBDM pipeline — sweep + DBSCAN consolidation —
    exactly the machinery built for noisy spectra.  Characterized r05
    (tools/noise_gate_sweep.py): device-vs-oracle agreement degrades
    smoothly (2.5e-11 at 1e-4 -> ~2e-9 at 1e-2) and never crosses 1e-8
    through sigma = 1e-2 on either backend."""
    from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit

    dwell = 5e-4
    rng = np.random.default_rng(3)
    params = five_peak_params.copy()
    params[:, 2] += rng.normal(scale=2.0, size=5)
    sig = oracle.sample_signal(params, 512, dwell)
    sig = sig + 1e-3 * (rng.standard_normal(512)
                        + 1j * rng.standard_normal(512))

    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 8)), eps=2e-4,
                        min_samples=10, max_clusters=16, kbdm=CFG)
    cons, _, _, _ = llc_kbdm_fit(from_np(sig[None]), dwell, cfg)
    cons = jax.tree.map(lambda x: x[0], cons)
    ref = refine_lines(D.dfc_from_np(sig), cons, dwell,
                       RefineConfig(iters=8))
    est = refined_to_np(ref, dwell)
    olines = oracle.refine(np.asarray(params, np.float64), sig, dwell,
                           iters=30)
    sel_o = oracle.match_lines(olines, params)
    sel_e = oracle.match_lines(est, params)
    err = oracle.line_errors(est[sel_e], olines[sel_o])
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"


def test_refine_f32_warmstart_hits_gate(five_peak_params):
    """f32 warm-start iterations + df polish reach the same 1e-8 gate as
    all-df iterations: GN re-converges to the df fixed point from any
    point in the basin, so the cheap f32 steps (RefineConfig.f32_iters)
    cost nothing in final accuracy."""
    dwell = 5e-4
    rng = np.random.default_rng(1)
    params = five_peak_params.copy()
    params[:, 2] += rng.normal(scale=2.0, size=5)
    sig = oracle.sample_signal(params, 512, dwell)
    sig = sig + 1e-4 * (rng.standard_normal(512)
                        + 1j * rng.standard_normal(512))
    lines = lt.kbdm_fit(from_np(sig), dwell, 180, CFG)
    # keep only the 5 genuine lines on both sides (see the noisy-gate test
    # above for why: the 5-line noisy LS optimum is unique; top-5 by
    # amplitude, robust to junk-line wobble)
    amp = np.where(np.asarray(lines.mask) > 0.5,
                   np.asarray(lines.amplitude), 0.0)
    strong = amp >= np.sort(amp)[-5]
    lines = type(lines)(lines.amplitude, lines.t2, lines.frequency,
                        lines.phase, jnp.asarray(strong, jnp.float32))
    init = line_list_to_np(lines)
    assert len(init) == 5
    olines = oracle.refine(init, sig, dwell, iters=12)
    olines = olines[oracle.match_lines(olines, params)]
    ref = refine_lines(D.dfc_from_np(sig), lines, dwell,
                       RefineConfig(iters=3, f32_iters=3))
    est = refined_to_np(ref, dwell)
    sel = oracle.match_lines(est, params)
    err = oracle.line_errors(est[sel], olines)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"


def test_noisy_signal_recovers_nonzero_amplitudes(five_peak_signal,
                                                  five_peak_params):
    """Regression: complex noise creates junk poles with |mu| > 1 whose
    geometric Gram entries (~e^60 after the |mu|^n <= e^30 clamp) used to
    swamp the shared f32 amplitude solve — every amplitude came back 0.
    Growing poles are now excluded from the solve."""
    sig, dwell = five_peak_signal
    rng = np.random.default_rng(7)
    noisy = sig + 1e-4 * (rng.standard_normal(len(sig))
                          + 1j * rng.standard_normal(len(sig)))
    est = line_list_to_np(lt.kbdm_fit(from_np(noisy), dwell, 180, CFG))
    sel = oracle.match_lines(est, five_peak_params)
    np.testing.assert_allclose(est[sel][:, 0], five_peak_params[:, 0],
                               rtol=0.1)


def test_refine_is_fixed_point_at_truth(five_peak_signal, five_peak_params):
    """Starting AT the ground truth, refinement must not move (GN residual
    is already ~0)."""
    sig, dwell = five_peak_signal
    from llckbdm_tpu.signals import line_list_from_np
    init = line_list_from_np(five_peak_params, k=16)
    ref = refine_lines(D.dfc_from_np(sig), init, dwell, RefineConfig(iters=2))
    est = refined_to_np(ref, dwell)
    sel = oracle.match_lines(est, five_peak_params)
    err = oracle.line_errors(est[sel], five_peak_params)
    assert err.max() < 1e-10, f"max err {err.max():.3e}\n{err}"
