"""Test configuration: force an 8-virtual-device CPU mesh (SURVEY.md §4).

Multi-chip hardware is not available in CI; all sharding tests run on a
virtual CPU mesh via --xla_force_host_platform_device_count.  Must be set
before jax is imported anywhere in the test process.
"""
import os

# LLCKBDM_TPU_TESTS=1 keeps the real TPU visible so @pytest.mark.tpu tests
# can assert the accuracy gates on the actual chip:
#     LLCKBDM_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
RUN_ON_TPU = os.environ.get("LLCKBDM_TPU_TESTS") == "1"

if not RUN_ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config call is
# the only reliable way to force the CPU backend.  Without it the whole
# suite silently dispatches to the remote TPU through the tunnel (measured:
# ~20 min suite instead of ~2).
import jax  # noqa: E402

if not RUN_ON_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated (~10 min of
# XLA:CPU work in round 3); cached executables cut repeat runs to the
# actual numerics.  Safe to share — keyed on HLO + compile options.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def five_peak_params() -> np.ndarray:
    """Config 1 ground truth: 5-peak synthetic line list (A, T2, f, phase)."""
    return np.array([
        [1.0, 0.05, -120.0, 0.1],
        [0.8, 0.08, -40.0, 0.0],
        [1.2, 0.03, 15.0, -0.2],
        [0.5, 0.10, 90.0, 0.3],
        [0.9, 0.06, 200.0, 0.0],
    ])


@pytest.fixture(scope="session")
def five_peak_signal(five_peak_params):
    """Config 1 signal: N=512, dwell=0.5 ms (BASELINE.json:7)."""
    from llckbdm_tpu.oracle import reference as oracle
    dwell = 5e-4
    sig = oracle.sample_signal(five_peak_params, 512, dwell)
    return sig, dwell


@pytest.fixture(scope="session")
def brain_params() -> np.ndarray:
    """Config 2 ground truth: simulated brain-MRS metabolite lines."""
    import pathlib
    csv = pathlib.Path(__file__).parent.parent / "data" / "params_brain_sim.csv"
    rows = np.loadtxt(csv, delimiter=",", skiprows=1, usecols=(1, 2, 3, 4))
    return rows


@pytest.fixture(scope="session")
def brain_signal(brain_params):
    """Config 2 signal: N=2048 (BASELINE.json:8)."""
    from llckbdm_tpu.oracle import reference as oracle
    dwell = 2.5e-4
    sig = oracle.sample_signal(brain_params, 2048, dwell)
    return sig, dwell
