"""Line-list types and time-domain signal synthesis (device-native).

Mirrors the oracle spec in :mod:`llckbdm_tpu.oracle.reference` (SURVEY.md §2,
L0 layer): a "line" is (A, T2, f, phase); a line list is a ``LineList`` pytree
of real arrays with a validity mask (fixed shapes for XLA — absent lines are
masked, never dropped).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.cplx import CArr


class LineList(NamedTuple):
    """Fixed-size line list with a validity mask.

    All fields have shape (..., k): leading batch dims, k = capacity.
    Invalid slots (mask == 0) must be ignored by consumers.
    """

    amplitude: jax.Array
    t2: jax.Array
    frequency: jax.Array
    phase: jax.Array
    mask: jax.Array  # float (1.0 valid / 0.0 invalid)

    @property
    def shape(self):
        return self.amplitude.shape

    def as_array(self) -> jax.Array:
        """Stack to (..., k, 4) in the oracle column order (A, T2, f, ph)."""
        return jnp.stack(
            [self.amplitude, self.t2, self.frequency, self.phase], axis=-1)


def line_list_from_np(params: np.ndarray, k: int | None = None,
                      dtype=jnp.float32) -> LineList:
    """Build a LineList from a (n, 4) numpy array, padded to capacity k."""
    params = np.asarray(params, dtype=np.float64)
    n = params.shape[0]
    k = n if k is None else k
    pad = np.zeros((k - n, 4))
    pad[:, 1] = 1.0  # dummy T2 to avoid division by zero
    full = np.concatenate([params, pad], axis=0)
    mask = np.concatenate([np.ones(n), np.zeros(k - n)])
    return LineList(
        jnp.asarray(full[:, 0], dtype), jnp.asarray(full[:, 1], dtype),
        jnp.asarray(full[:, 2], dtype), jnp.asarray(full[:, 3], dtype),
        jnp.asarray(mask, dtype))


def line_list_to_np(lines: LineList) -> np.ndarray:
    """Valid rows only, as a float64 (n, 4) array sorted by frequency."""
    arr = np.asarray(lines.as_array(), dtype=np.float64)
    mask = np.asarray(lines.mask) > 0.5
    arr = arr[mask]
    return arr[np.argsort(arr[:, 2])]


def sample_signal(lines: LineList, n: int, dwell: float) -> CArr:
    """Device-native synthesis: c[n] = sum_k A e^{i ph} e^{(i 2 pi f - 1/T2) n dt}.

    Oracle counterpart: oracle.reference.sample_signal.  Returns CArr of
    shape (..., n).
    """
    dt = jnp.asarray(dwell, lines.amplitude.dtype)
    t = jnp.arange(n, dtype=lines.amplitude.dtype) * dt  # (n,)
    # decay per line: (..., k, 1) * (n,) -> (..., k, n)
    decay = jnp.exp(-t / lines.t2[..., None])
    theta = 2.0 * jnp.pi * lines.frequency[..., None] * t + lines.phase[..., None]
    w = lines.amplitude * lines.mask
    re = jnp.sum(w[..., None] * decay * jnp.cos(theta), axis=-2)
    im = jnp.sum(w[..., None] * decay * jnp.sin(theta), axis=-2)
    return CArr(re, im)
