"""Device pipeline at SPEC scale (BASELINE.json:8-9) — marked `slow`.

Config 2: simulated brain MRS (~16 metabolite lines), N=2048, single KBDM
m=512, refined to the 1e-8 oracle gate.
Config 3: the FULL LL-KBDM sweep m=120..300 step 4 (46 entries) on the
brain signal + cluster consolidation.

Deselect with `-m "not slow"` for fast iteration.
"""
import numpy as np
import pytest

import llckbdm_tpu as lt
from llckbdm_tpu.oracle import reference as oracle
from llckbdm_tpu.ops.cplx import from_np
from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit
from llckbdm_tpu.signals import line_list_to_np
from llckbdm_tpu.solver.refine import (RefineConfig, refine_lines,
                                       refined_to_np)
from llckbdm_tpu.utils import df as D

BRAIN_CFG = lt.KbdmConfig(p=24)   # >= 16 metabolite lines + headroom


@pytest.mark.slow
def test_brain_kbdm_m512_refined_gate(brain_signal, brain_params):
    """Config 2 at spec scale on the device path (m=512, N=2048, p=24):
    f32 randomized-subspace KBDM + df refinement matches the f64 scipy
    oracle to <= 1e-8 relative (BASELINE.json:5,8)."""
    sig, dwell = brain_signal
    olines, _ = oracle.kbdm(sig, dwell, m=512, p=24)
    osel = oracle.match_lines(olines, brain_params)
    olines = olines[osel]

    lines = lt.kbdm_fit(from_np(sig), dwell, 512, BRAIN_CFG)
    est32 = line_list_to_np(lines)
    # the f32 stage alone must find every metabolite line (initialization)
    assert len(est32) >= len(brain_params)

    # 10 GN iterations: the brain config's near-degenerate line pairs
    # (-60/-55 Hz, -20/-15 Hz) converge linearly for ~6 iterations before
    # the quadratic phase kicks in (config 1 needs only 3)
    ref = refine_lines(D.dfc_from_np(sig), lines, dwell,
                       RefineConfig(iters=10))
    est = refined_to_np(ref, dwell)
    sel = oracle.match_lines(est, brain_params)
    err = oracle.line_errors(est[sel], olines)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"


@pytest.mark.slow
def test_brain_llckbdm_full_sweep(brain_signal, brain_params):
    """Config 3 at spec scale: the full m=120..300:4 sweep (46 entries,
    BASELINE.json:9) on the brain signal; consolidation recovers every
    metabolite line at f32 front-end tolerance."""
    sig, dwell = brain_signal
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 301, 4)),
                        eps=2e-4, min_samples=10, max_clusters=32,
                        kbdm=BRAIN_CFG)
    cons, pooled, counts, stats = llc_kbdm_fit(from_np(sig), dwell, cfg)
    est = line_list_to_np(cons)
    assert len(est) >= len(brain_params)
    sel = oracle.match_lines(est, brain_params)
    band = np.abs(brain_params[:, 2]).max()
    np.testing.assert_allclose(est[sel][:, 2], brain_params[:, 2],
                               rtol=0, atol=5e-3 * band)
    # consolidated medians + refinement recover the exact truth (the
    # signal is noiseless, so the GN fixed point IS the ground truth)
    ref = refine_lines(D.dfc_from_np(sig), cons, dwell,
                       RefineConfig(iters=10))
    refined = refined_to_np(ref, dwell)
    refined = refined[np.abs(refined[:, 0]) > 0.1]  # drop empty slots
    rsel = oracle.match_lines(refined, brain_params)
    err = oracle.line_errors(refined[rsel], brain_params)
    assert err.max() < 1e-8, f"max err {err.max():.3e}\n{err}"
