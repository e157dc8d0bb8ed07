"""Device-native signal synthesis and LineList round trips vs the oracle."""
import numpy as np
import jax.numpy as jnp

from llckbdm_tpu.oracle import reference as oracle
from llckbdm_tpu.ops.cplx import to_np
from llckbdm_tpu.signals import (LineList, line_list_from_np, line_list_to_np,
                                 sample_signal)


def test_line_list_roundtrip(five_peak_params):
    ll = line_list_from_np(five_peak_params, k=8)
    assert ll.amplitude.shape == (8,)
    np.testing.assert_allclose(np.asarray(ll.mask), [1] * 5 + [0] * 3)
    back = line_list_to_np(ll)
    order = np.argsort(five_peak_params[:, 2])
    np.testing.assert_allclose(back, five_peak_params[order], rtol=1e-6,
                               atol=1e-6)


def test_sample_signal_matches_oracle(five_peak_params):
    n, dwell = 256, 5e-4
    ref = oracle.sample_signal(five_peak_params, n, dwell)
    got = to_np(sample_signal(line_list_from_np(five_peak_params, k=8),
                              n, dwell))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_sample_signal_masked_lines_ignored(five_peak_params):
    """Padding slots must contribute nothing."""
    n, dwell = 128, 5e-4
    tight = to_np(sample_signal(line_list_from_np(five_peak_params), n, dwell))
    padded = to_np(sample_signal(line_list_from_np(five_peak_params, k=16),
                                 n, dwell))
    np.testing.assert_allclose(padded, tight, rtol=1e-6, atol=1e-6)


def test_sample_signal_batched(five_peak_params):
    """Leading batch dims broadcast through synthesis."""
    ll = line_list_from_np(five_peak_params, k=8)
    batched = LineList(*(jnp.broadcast_to(x, (3, 2, *x.shape)) for x in ll))
    got = sample_signal(batched, 64, 5e-4)
    assert got.re.shape == (3, 2, 64)
    single = sample_signal(ll, 64, 5e-4)
    np.testing.assert_allclose(np.asarray(got.re[1, 1]),
                               np.asarray(single.re), rtol=1e-6)
