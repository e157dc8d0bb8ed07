"""Smoke-test the Pallas ops the Jacobi kernels rely on, on the live chip."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(sched_ref, a_ref, out_ref):
    # sched_ref: SMEM (steps, 2) int32; a_ref/out_ref: VMEM (n, n, B)
    n = a_ref.shape[0]
    steps = sched_ref.shape[0]

    out_ref[:] = a_ref[:]

    def body(k, _):
        i = sched_ref[k, 0]
        j = sched_ref[k, 1]
        # dynamic outer-dim row loads
        ri = out_ref[i, :, :]               # (n, B)
        rj = out_ref[j, :, :]
        # dynamic 2-index element load -> (B,)
        aij = out_ref[i, j, :]
        c = aij * jnp.float32(0.25)                   # arbitrary (B,) coefficient
        s = jnp.float32(1.0) - c * c
        out_ref[i, :, :] = c * ri - s * rj
        out_ref[j, :, :] = s * ri + c * rj
        # dynamic element store
        out_ref[i, j, :] = c
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def run(n=24, b=256, steps=16, interpret=False):
    sched = np.stack([np.arange(steps) % n,
                      (np.arange(steps) * 7 + 3) % n], axis=1).astype(np.int32)
    a = np.random.default_rng(0).standard_normal((n, n, b)).astype(np.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, b), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    out = jax.jit(fn)(jnp.asarray(sched), jnp.asarray(a))
    out = np.asarray(out)

    # numpy reference
    ref = a.copy()
    for k in range(steps):
        i, j = sched[k]
        ri, rj = ref[i].copy(), ref[j].copy()
        aij = ref[i, j].copy()
        c = aij * 0.25
        s = 1.0 - c * c
        ref[i] = c * ri - s * rj
        ref[j] = s * ri + c * rj
        ref[i, j] = c
    err = np.max(np.abs(out - ref))
    print(f"interpret={interpret} max abs err: {err:.2e}")
    assert err < 1e-5, err


if __name__ == "__main__":
    import sys
    if "--cpu" in sys.argv:
        run(interpret=True)
    else:
        run(interpret=False)
