"""Per-stage TPU timing decomposition of the north-star bench shapes.

Times each pipeline stage in isolation (best of `reps`, block_until_ready)
at the exact shapes bench.py produces, so kernel work can be attributed.

Usage: python tools/profile_stages.py [--voxels 128]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from llckbdm_tpu.ops.cplx import CArr, cmatmul, chermitian, conj
from llckbdm_tpu.ops import jacobi
from llckbdm_tpu.ops.linalg import lowner_orth, takagi_small, hermitian_solve
from llckbdm_tpu.oracle.reference import sample_signal
from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit
from llckbdm_tpu.solver.kbdm import KbdmConfig, kbdm_sweep, _poles_to_lines
from llckbdm_tpu.ops.hankel import hankel_matrices


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:9.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=128)
    args = ap.parse_args()

    n, dwell, v = 512, 5e-4, args.voxels
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)),
                        eps=2e-4, min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))
    kc = cfg.kbdm
    s = len(cfg.m_values)
    p, k = kc.p, kc.p + kc.oversample

    base = np.array([
        [1.0, 0.05, -120.0, 0.1],
        [0.8, 0.08, -40.0, 0.0],
        [1.2, 0.03, 15.0, -0.2],
        [0.5, 0.10, 90.0, 0.3],
        [0.9, 0.06, 200.0, 0.0],
    ])
    rng = np.random.default_rng(0)
    sigs = np.empty((v, n), np.complex128)
    for i in range(v):
        pr = base.copy()
        pr[:, 2] += rng.normal(scale=2.0, size=5)
        sigs[i] = sample_signal(pr, n, dwell)
    c = CArr(jnp.asarray(sigs.real, jnp.float32),
             jnp.asarray(sigs.imag, jnp.float32))

    print(f"# device={jax.devices()[0].device_kind} V={v} S={s} p={p} k={k}")

    # full pipeline + sweep
    timeit("llc_kbdm_fit (full)", jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg)), c)
    timeit("kbdm_sweep", jax.jit(lambda x: kbdm_sweep(x, dwell, cfg.m_values, kc)), c)

    # isolated kernels at sweep-internal shapes: batch = S*V for eigh (k x k),
    # batch = V for per-sweep vmapped ops
    b = s * v
    key = jax.random.PRNGKey(0)
    gr = jax.random.normal(key, (b, 24, k), jnp.float32)
    gi = jax.random.normal(jax.random.PRNGKey(1), (b, 24, k), jnp.float32)
    y = CArr(gr, gi)
    g = cmatmul(chermitian(y), y)   # (b, k, k) HPD
    g = CArr(0.5 * (g.re + jnp.swapaxes(g.re, -1, -2)),
             0.5 * (g.im - jnp.swapaxes(g.im, -1, -2)))
    timeit(f"jacobi.eigh ({b}x{k}x{k}, {kc.eigh_sweeps} sweeps)",
           jax.jit(lambda a: jacobi.eigh(a, sweeps=kc.eigh_sweeps)), g)

    ur = jax.random.normal(key, (b, p, p), jnp.float32)
    ui = jax.random.normal(jax.random.PRNGKey(2), (b, p, p), jnp.float32)
    ut = CArr(0.5 * (ur + jnp.swapaxes(ur, -1, -2)),
              0.5 * (ui + jnp.swapaxes(ui, -1, -2)))
    timeit(f"jacobi.eig_cs ({b}x{p}x{p}, {kc.eig_sweeps} sweeps)",
           jax.jit(lambda a: jacobi.eig_cs(a, sweeps=kc.eig_sweeps)), ut)

    # hankel + matmul plumbing at sweep shapes
    timeit("hankel_matrices m=256", jax.jit(lambda x: hankel_matrices(x, 256)), c)
    h0 = hankel_matrices(c, 256)
    yk = CArr(jax.random.normal(key, (v, 256, k)), jax.random.normal(key, (v, 256, k)))
    timeit("cmatmul h0 @ y (V,256,256)@(V,256,k)",
           jax.jit(lambda a, x: cmatmul(a, x)), h0, yk)
    timeit(f"lowner_orth (V,256,{k})", jax.jit(lambda x: lowner_orth(x, sweeps=kc.eigh_sweeps)), yk)

    mk = cmatmul(chermitian(yk), yk)
    mk = CArr(0.5 * (mk.re + jnp.swapaxes(mk.re, -1, -2)),
              0.5 * (mk.im + jnp.swapaxes(mk.im, -1, -2)))
    timeit(f"takagi_small (V,{k},{k})", jax.jit(lambda x: takagi_small(x, sweeps=kc.eigh_sweeps)), mk)

    # _poles_to_lines at sweep output shapes
    mur = 0.9 * jax.random.normal(key, (v, s, p))
    mui = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (v, s, p))
    mu = CArr(mur, mui)
    keep = jnp.ones((v, s, p), bool)
    cb = CArr(c.re[:, None, :], c.im[:, None, :])
    timeit("_poles_to_lines (V,S,p)",
           jax.jit(lambda m_, k_, c_: _poles_to_lines(m_, k_, c_, dwell, n, kc)),
           mu, keep, cb)


if __name__ == "__main__":
    main()
