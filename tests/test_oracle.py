"""Oracle self-consistency: the scipy float64 reference reproduces its own
ground truth (SURVEY.md §4 closed loop; BASELINE configs 1-3)."""
import numpy as np
import pytest

from llckbdm_tpu.oracle import reference as oracle


def test_sample_signal_single_line():
    params = np.array([[2.0, 0.1, 50.0, 0.25]])
    n, dwell = 64, 1e-3
    sig = oracle.sample_signal(params, n, dwell)
    t = np.arange(n) * dwell
    expect = 2.0 * np.exp(1j * 0.25) * np.exp((2j * np.pi * 50.0 - 10.0) * t)
    np.testing.assert_allclose(sig, expect, rtol=1e-14)


def test_sample_signal_superposition(five_peak_params):
    n, dwell = 128, 5e-4
    total = oracle.sample_signal(five_peak_params, n, dwell)
    parts = sum(oracle.sample_signal(five_peak_params[k:k + 1], n, dwell)
                for k in range(len(five_peak_params)))
    np.testing.assert_allclose(total, parts, rtol=1e-13)


def test_kbdm_config1_roundtrip(five_peak_signal, five_peak_params):
    """Config 1 (BASELINE.json:7): 5 peaks, N=512, m=180."""
    sig, dwell = five_peak_signal
    lines, info = oracle.kbdm(sig, dwell, m=180, p=16)
    sel = oracle.match_lines(lines, five_peak_params)
    est = lines[sel]
    np.testing.assert_allclose(est, five_peak_params, rtol=1e-8, atol=1e-10)


def test_kbdm_config2_brain(brain_signal, brain_params):
    """Config 2 (BASELINE.json:8): brain sim, N=2048, m=512."""
    sig, dwell = brain_signal
    lines, _ = oracle.kbdm(sig, dwell, m=512, p=24)
    sel = oracle.match_lines(lines, brain_params)
    est = lines[sel]
    np.testing.assert_allclose(est, brain_params, rtol=1e-7, atol=1e-9)


def test_kbdm_rejects_short_signal():
    with pytest.raises(ValueError):
        oracle.kbdm(np.zeros(100, complex), 1e-3, m=64)


def test_kbdm_default_m_and_p(five_peak_signal, five_peak_params):
    sig, dwell = five_peak_signal
    lines, info = oracle.kbdm(sig, dwell)  # m = N//2, p = m
    assert info["m"] == 256 and info["p"] == 256
    sel = oracle.match_lines(lines, five_peak_params)
    np.testing.assert_allclose(lines[sel][:, 2], five_peak_params[:, 2],
                               rtol=1e-6)


def test_llc_kbdm_config3(five_peak_signal, five_peak_params):
    """Config 3 (BASELINE.json:9): multi-m sweep + DBSCAN consolidation."""
    sig, dwell = five_peak_signal
    cons, pooled, labels = oracle.llc_kbdm(
        sig, dwell, m_range=range(120, 257, 4), p=16,
        eps=2e-4, min_samples=20)
    assert len(cons) >= 5
    sel = oracle.match_lines(cons, five_peak_params)
    np.testing.assert_allclose(cons[sel], five_peak_params,
                               rtol=1e-6, atol=1e-8)


def test_llc_kbdm_noise_robustness(five_peak_params):
    """LL-KBDM's raison d'etre: clustering isolates genuine lines under
    noise (SURVEY.md §4)."""
    dwell = 5e-4
    sig = oracle.sample_signal(five_peak_params, 512, dwell)
    rng = np.random.default_rng(0)
    noisy = sig + 0.01 * (rng.standard_normal(512)
                          + 1j * rng.standard_normal(512))
    cons, pooled, labels = oracle.llc_kbdm(
        noisy, dwell, m_range=range(120, 257, 4), p=16,
        eps=2e-4, min_samples=20)
    sel = oracle.match_lines(cons, five_peak_params)
    est = cons[sel]
    # frequencies still recovered tightly; amplitudes to noise level
    np.testing.assert_allclose(est[:, 2], five_peak_params[:, 2],
                               rtol=0, atol=0.5)
    np.testing.assert_allclose(est[:, 0], five_peak_params[:, 0],
                               rtol=0.05)


def test_match_lines_permutation(five_peak_params):
    est = five_peak_params[::-1]
    sel = oracle.match_lines(est, five_peak_params)
    np.testing.assert_array_equal(est[sel], five_peak_params)
