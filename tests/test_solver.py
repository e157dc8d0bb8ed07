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


def test_kbdm_sweep_rejects_short_signal():
    with pytest.raises(ValueError):
        lt.kbdm_sweep(from_np(np.zeros(100, complex)), 1e-3, (64,), CFG)


def test_refined_hits_1e8_oracle_gate(five_peak_signal, five_peak_params):
    """The headline accuracy gate: f32 KBDM + df Gauss-Newton refinement
    matches the float64 scipy oracle to <= 1e-8 relative on all of
    (A, T2, f, phase) (BASELINE.json:5)."""
    sig, dwell = five_peak_signal
    # oracle lines (float64 ground truth of the estimation problem)
    olines, _ = oracle.kbdm(sig, dwell, m=180, p=16)
    osel = oracle.match_lines(olines, five_peak_params)
    olines = olines[osel]

    lines = lt.kbdm_fit(from_np(sig), dwell, 180, CFG)
    ref = refine_lines(D.dfc_from_np(sig), lines, dwell,
                       RefineConfig(iters=3))
    est = refined_to_np(ref, dwell)
    sel = oracle.match_lines(est, five_peak_params)
    est = est[sel]
    err = oracle.line_errors(est, olines)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"


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
