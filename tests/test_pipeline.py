"""End-to-end LL-KBDM pipeline (device) vs the oracle — config 3 semantics,
plus the vmapped voxel-batch path (config 4 shape)."""
import numpy as np
import jax
import jax.numpy as jnp

from llckbdm_tpu.oracle import reference as oracle
from llckbdm_tpu.ops.cplx import from_np
from llckbdm_tpu.pipeline.llckbdm import (LlcKbdmConfig, llc_kbdm_fit,
                                          transform_line_lists)
from llckbdm_tpu.signals import line_list_from_np, line_list_to_np
from llckbdm_tpu.solver.kbdm import KbdmConfig


SMALL = LlcKbdmConfig(
    m_values=tuple(range(120, 181, 10)),  # 7 sweeps — keep CI fast
    eps=2e-4, min_samples=5, max_clusters=16,
    kbdm=KbdmConfig(p=16))


def test_transform_matches_oracle(five_peak_params):
    dwell = 5e-4
    ll = line_list_from_np(five_peak_params)
    got = np.asarray(transform_line_lists(ll, dwell, 0.3))
    ref = oracle.transform_line_lists(five_peak_params, dwell,
                                      damping_weight=0.3)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


def test_llc_kbdm_config3_recovers_lines(five_peak_signal, five_peak_params):
    sig, dwell = five_peak_signal
    cons, pooled, counts, stats = llc_kbdm_fit(from_np(sig), dwell, SMALL)
    est = line_list_to_np(cons)
    assert len(est) >= 5
    sel = oracle.match_lines(est, five_peak_params)
    est = est[sel]
    np.testing.assert_allclose(est[:, 2], five_peak_params[:, 2],
                               rtol=5e-3, atol=0.5)  # f32 front end
    np.testing.assert_allclose(est[:, 0], five_peak_params[:, 0], rtol=0.1)
    # genuine clusters contain one line per sweep entry
    top = np.sort(np.asarray(counts))[::-1][:5]
    assert np.all(top >= len(SMALL.m_values) - 1)


def test_llc_kbdm_noise_rejection(five_peak_params):
    """Noise lines scatter across the sweep and must not form clusters."""
    dwell = 5e-4
    sig = oracle.sample_signal(five_peak_params, 512, dwell)
    rng = np.random.default_rng(0)
    noisy = sig + 0.01 * (rng.standard_normal(512)
                          + 1j * rng.standard_normal(512))
    cons, pooled, counts, stats = llc_kbdm_fit(from_np(noisy), dwell, SMALL)
    est = line_list_to_np(cons)
    sel = oracle.match_lines(est, five_peak_params)
    np.testing.assert_allclose(est[sel][:, 2], five_peak_params[:, 2],
                               rtol=0, atol=1.0)


def test_llc_kbdm_voxel_batch(five_peak_signal, five_peak_params):
    """Config 4 shape: a (B,) voxel batch through one jitted call."""
    sig, dwell = five_peak_signal
    batch = np.stack([sig, sig * 0.5, sig])
    cons, pooled, counts, stats = llc_kbdm_fit(from_np(batch), dwell, SMALL)
    assert cons.amplitude.shape == (3, SMALL.max_clusters)
    # voxel 1 is a scaled copy: same frequencies, half amplitude
    est0 = line_list_to_np(type(cons)(*(x[0] for x in cons)))
    est1 = line_list_to_np(type(cons)(*(x[1] for x in cons)))
    sel0 = oracle.match_lines(est0, five_peak_params)
    sel1 = oracle.match_lines(est1, five_peak_params)
    np.testing.assert_allclose(est1[sel1][:, 2], est0[sel0][:, 2],
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(est1[sel1][:, 0], 0.5 * est0[sel0][:, 0],
                               rtol=2e-2)


def test_llc_kbdm_numpy_convenience(five_peak_signal, five_peak_params):
    """The numpy-in/numpy-out llc_kbdm wrapper (reference-signature parity:
    data, dwell, m_range, p, eps, min_samples) recovers the 5 lines, both
    single-signal and batched, and the refine_iters option polishes them."""
    import llckbdm_tpu as lt
    sig, dwell = five_peak_signal
    m_range = range(120, 181, 10)

    cons, pooled, counts = lt.llc_kbdm(sig, dwell, m_range, p=16,
                                       eps=2e-4, min_samples=5)
    assert cons.shape[1] == 4 and len(cons) >= 5
    sel = oracle.match_lines(cons, five_peak_params)
    np.testing.assert_allclose(cons[sel][:, 2], five_peak_params[:, 2],
                               rtol=0, atol=1.0)   # f32 front-end, Hz
    assert len(pooled) > len(cons)
    assert counts.max() >= 5

    # batched: rows must match per-voxel single calls
    batch = np.stack([sig, sig])
    cons_b, _, counts_b = lt.llc_kbdm(batch, dwell, m_range, p=16,
                                      eps=2e-4, min_samples=5)
    assert len(cons_b) == 2 and counts_b.shape[0] == 2
    # batched and single runs compile to different XLA programs, so
    # agreement is at f32 rounding level, not bitwise
    np.testing.assert_allclose(cons_b[0], cons, rtol=1e-3, atol=1e-3)

    # refined: hits f64-level agreement with the truth (noiseless signal)
    ref, _, _ = lt.llc_kbdm(sig, dwell, m_range, p=16, eps=2e-4,
                            min_samples=5, refine_iters=6)
    rsel = oracle.match_lines(ref, five_peak_params)
    err = oracle.line_errors(ref[rsel], five_peak_params)
    assert err.max() < 1e-8, err
