"""Isolate per-pair costs in the Pallas eigh kernel on the real chip."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n, sweeps, do_cols=True, do_v=True, do_rows=True):
    def kern(ar_ref, ai_ref, w_ref, sr, si, vr, vi):
        sr[:] = ar_ref[:]
        si[:] = ai_ref[:]
        vr[:] = ar_ref[:]
        vi[:] = ai_ref[:]

        def round_body(step, carry):
            r = jax.lax.rem(step, n - 1)
            for k in range(n // 2):
                m = n - 1
                if k == 0:
                    i, j = n - 1, r
                else:
                    i = jax.lax.rem(r + k, m)
                    j = jax.lax.rem(r - k + m, m)
                aii = sr[i, i, :]
                ajj = sr[j, j, :]
                br, bi = sr[i, j, :], si[i, j, :]
                babs = jnp.sqrt(br * br + bi * bi)
                dscale = jnp.sqrt(aii * aii + ajj * ajj) + 1e-30
                skip = babs <= 1e-7 * dscale
                safe_b = jnp.where(skip, 1.0, babs)
                wr_ = jnp.where(skip, 1.0, br / safe_b)
                wi_ = jnp.where(skip, 0.0, bi / safe_b)
                tau = (ajj - aii) / (2.0 * safe_b)
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                c = jax.lax.rsqrt(1.0 + t * t)
                s = c * t
                c = jnp.where(skip, 1.0, c)
                s = jnp.where(skip, 0.0, s)
                if do_rows:
                    ri_r, ri_i = sr[i, :, :], si[i, :, :]
                    rj_r, rj_i = sr[j, :, :], si[j, :, :]
                    wrj_r = wr_ * rj_r - wi_ * rj_i
                    wrj_i = wr_ * rj_i + wi_ * rj_r
                    ni_r = c * ri_r - s * wrj_r
                    ni_i = c * ri_i - s * wrj_i
                    nj_r = s * ri_r + c * wrj_r
                    nj_i = s * ri_i + c * wrj_i
                    sr[i, :, :] = ni_r
                    si[i, :, :] = ni_i
                    sr[j, :, :] = nj_r
                    si[j, :, :] = nj_i
                    if do_cols:
                        sr[:, i, :] = ni_r
                        si[:, i, :] = -ni_i
                        sr[:, j, :] = nj_r
                        si[:, j, :] = -nj_i
                    if do_v:
                        vi_r2, vi_i2 = vr[i, :, :], vi[i, :, :]
                        vj_r2, vj_i2 = vr[j, :, :], vi[j, :, :]
                        wvj_r = wr_ * vj_r2 + wi_ * vj_i2
                        wvj_i = wr_ * vj_i2 - wi_ * vj_r2
                        vr[i, :, :] = c * vi_r2 - s * wvj_r
                        vi[i, :, :] = c * vi_i2 - s * wvj_i
                        vr[j, :, :] = s * vi_r2 + c * wvj_r
                        vi[j, :, :] = s * vi_i2 + c * wvj_i
            return carry

        jax.lax.fori_loop(0, sweeps * (n - 1), round_body, 0)
        for q in range(n):
            w_ref[q, :] = sr[q, q, :]
    return kern


def run(n=24, batch=4480, sweeps=8, b_blk=512, **kw):
    bpad = ((batch + b_blk - 1) // b_blk) * b_blk
    a = np.random.default_rng(0).standard_normal((n, n, bpad)).astype(np.float32)
    a = a + np.swapaxes(a, 0, 1)
    ai = np.random.default_rng(1).standard_normal((n, n, bpad)).astype(np.float32)
    ai = ai - np.swapaxes(ai, 0, 1)
    spec = pl.BlockSpec((n, n, b_blk), lambda g: (0, 0, g), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n, b_blk), lambda g: (0, g), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        make_kernel(n, sweeps, **kw),
        grid=(bpad // b_blk,),
        out_shape=jax.ShapeDtypeStruct((n, bpad), jnp.float32),
        in_specs=[spec, spec],
        out_specs=wspec,
        scratch_shapes=[pltpu.VMEM((n, n, b_blk), jnp.float32)] * 4,
    )
    f = jax.jit(fn)
    out = f(jnp.asarray(a), jnp.asarray(ai))
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(jnp.asarray(a), jnp.asarray(ai)))
        ts.append(time.perf_counter() - t0)
    print(f"n={n} sweeps={sweeps} b_blk={b_blk} {kw}: {min(ts)*1e3:.2f} ms")


if __name__ == "__main__":
    run(do_rows=False, do_cols=False, do_v=False)   # coefficients only
    run(do_cols=False, do_v=False)                  # + rows
    run(do_v=False)                                 # + column writes
    run()                                           # full
    run(sweeps=1)                                   # fixed overhead probe
    run(b_blk=256)
