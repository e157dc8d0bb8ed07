"""Double-float (two-f32) arithmetic vs numpy float64 (utils.df).

The refinement stage's 1e-8 accuracy gate rests on these primitives giving
~1e-14 relative accuracy; these tests pin that down (SURVEY.md §7 hard
part 2)."""
import numpy as np
import jax.numpy as jnp

from llckbdm_tpu.utils import df as D


def test_df_roundtrip_f64():
    x = np.array([1.0 + 1e-9, np.pi, 1e-20, -3.5e7])
    got = D.df_to_np(D.df_from_np(x))
    np.testing.assert_allclose(got, x, rtol=1e-14)


def test_df_add_catastrophic_cancellation():
    a = D.df_from_np(np.array([1.0 + 1e-12]))
    b = D.df_from_np(np.array([-1.0]))
    got = D.df_to_np(D.df_add(a, b))
    # the exact float64 result of the cancellation, not the ideal 1e-12
    expect = np.float64(1.0 + 1e-12) - 1.0
    np.testing.assert_allclose(got, [expect], rtol=1e-9)


def test_df_mul_precision():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64)
    y = rng.standard_normal(64)
    got = D.df_to_np(D.df_mul(D.df_from_np(x), D.df_from_np(y)))
    np.testing.assert_allclose(got, x * y, rtol=1e-13)


def test_df_div_sqrt():
    rng = np.random.default_rng(1)
    x = np.abs(rng.standard_normal(32)) + 0.1
    y = np.abs(rng.standard_normal(32)) + 0.1
    np.testing.assert_allclose(
        D.df_to_np(D.df_div(D.df_from_np(x), D.df_from_np(y))), x / y,
        rtol=1e-13)
    np.testing.assert_allclose(
        D.df_to_np(D.df_sqrt(D.df_from_np(x))), np.sqrt(x), rtol=1e-13)


def test_df_sum_long_accumulation():
    """Summing 10^4 values stays at ~f64 accuracy (naive f32 would lose
    ~4 digits)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(10000)
    got = D.df_to_np(D.df_sum(D.df_from_np(x), axis=0))
    np.testing.assert_allclose(got, np.sum(x), rtol=1e-12, atol=1e-12)


def test_dfc_mul_matches_complex128():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    b = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    got = D.dfc_to_np(D.dfc_mul(D.dfc_from_np(a), D.dfc_from_np(b)))
    np.testing.assert_allclose(got, a * b, rtol=1e-13)


def test_dfc_powers_geometric_accuracy():
    """z^n for n up to 511 at df precision — the refinement Vandermonde."""
    z = np.array([0.999 * np.exp(0.37j)])
    got = D.dfc_to_np(D.dfc_powers(D.dfc_from_np(z), 512))
    expect = z[0] ** np.arange(512)
    # Rounding in z^n amplifies like n*eps regardless of powering scheme
    # (condition number of powering is n); with eps_df ~ 3.6e-15 the bound
    # for n=511 is ~1.8e-12.  Gate at that bound, not below it.
    np.testing.assert_allclose(got[0], expect, rtol=2e-12)
