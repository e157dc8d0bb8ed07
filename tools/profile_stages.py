"""Per-stage TPU timing decomposition of the north-star bench shapes.

Times each pipeline stage in isolation (best of `reps`, block_until_ready)
at the exact shapes bench.py produces, so kernel work can be attributed.
Stages reflect the broadcast-sweep structure of solver.kbdm.kbdm_sweep.

Usage: (from /root/repo)  python tools/profile_stages.py [--voxels 512]
"""
from __future__ import annotations

import argparse
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from llckbdm_tpu.ops.cplx import CArr, cmatmul, chermitian, conj
from llckbdm_tpu.ops import jacobi
from llckbdm_tpu.ops.linalg import orth_basis, takagi_small, hermitian_solve
from llckbdm_tpu.oracle.reference import sample_signal
from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit
from llckbdm_tpu.solver.kbdm import KbdmConfig, kbdm_sweep, _poles_to_lines
from llckbdm_tpu.solver.refine import RefineConfig, refine_lines
from llckbdm_tpu.ops.hankel import hankel_matrices
from llckbdm_tpu.utils import df as D


def _materialize(out):
    """Force REAL completion: on the axon backend the first
    block_until_ready after a fresh compile returns before the computation
    ran (measured: 'blocked' in 0.6 ms, the device_get 100 s later).
    Fetching bytes is the only reliable sync; afterwards plain
    block_until_ready behaves."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _materialize(out)
    compile_s = time.perf_counter() - t0
    # time all reps together with ONE final materialization: device runs
    # serialize, so the average is robust even if an individual
    # block_until_ready lies (see _materialize)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    _materialize(out)
    avg = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {avg*1e3:9.2f} ms   (compile {compile_s:.1f}s)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=512)
    args = ap.parse_args()

    n, dwell, v = 512, 5e-4, args.voxels
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)),
                        eps=2e-4, min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))
    kc = cfg.kbdm
    s = len(cfg.m_values)
    p, k = kc.p, kc.p + kc.oversample
    m_max = max(cfg.m_values)

    rng = np.random.default_rng(0)
    base = np.array([
        [1.0, 0.05, -120.0, 0.1], [0.8, 0.08, -40.0, 0.0],
        [1.2, 0.03, 15.0, -0.2], [0.5, 0.10, 90.0, 0.3],
        [0.9, 0.06, 200.0, 0.0]])
    sigs = np.empty((v, n), np.complex128)
    for i in range(v):
        pr = base.copy()
        pr[:, 2] += rng.normal(scale=2.0, size=5)
        sigs[i] = sample_signal(pr, n, dwell)
    c = CArr(jnp.asarray(sigs.real, jnp.float32),
             jnp.asarray(sigs.imag, jnp.float32))

    print(f"# device={jax.devices()[0].device_kind} V={v} S={s} p={p} k={k}")

    timeit("llc_kbdm_fit (full f32)",
           jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg)), c)
    timeit("kbdm_sweep",
           jax.jit(lambda x: kbdm_sweep(x, dwell, cfg.m_values, kc)), c)
    h0 = timeit("hankel_matrices m=256",
                jax.jit(lambda x: hankel_matrices(x, m_max)), c)

    # one masked operator apply at sweep shapes: (V,m,m) @ (S,V,m,k)
    masks = np.zeros((s, m_max), np.float32)
    for i, m in enumerate(cfg.m_values):
        masks[i, :m] = 1.0
    mk = jnp.asarray(masks).reshape(s, 1, m_max, 1)
    x0 = CArr(jax.random.normal(jax.random.PRNGKey(0), (s, v, m_max, k)),
              jax.random.normal(jax.random.PRNGKey(1), (s, v, m_max, k)))

    def apply_op(h, x):
        xm = CArr(x.re * mk, x.im * mk)
        y = cmatmul(h, xm)
        return CArr(y.re * mk, y.im * mk)

    y = timeit("apply_op (V,m,m)@(S,V,m,k)",
               jax.jit(lambda h, x: apply_op(h, x)), h0, x0)
    q = timeit("orth_basis (S,V,m,k) [CholQR2]",
               jax.jit(lambda yy: orth_basis(yy, sweeps=kc.eigh_sweeps)), y)

    msml = cmatmul(chermitian(q), apply_op(h0, conj(q)))
    msml = CArr(0.5 * (msml.re + jnp.swapaxes(msml.re, -1, -2)),
                0.5 * (msml.im + jnp.swapaxes(msml.im, -1, -2)))
    timeit("takagi_small (S,V,k,k) [gram_svd]",
           jax.jit(lambda x: takagi_small(x, sweeps=kc.eigh_sweeps)), msml)

    ur = jax.random.normal(jax.random.PRNGKey(2), (s, v, p, p))
    ui = jax.random.normal(jax.random.PRNGKey(3), (s, v, p, p))
    ut = CArr(0.5 * (ur + jnp.swapaxes(ur, -1, -2)),
              0.5 * (ui + jnp.swapaxes(ui, -1, -2)))
    timeit("jacobi.eig_cs (S,V,p,p)",
           jax.jit(lambda a: jacobi.eig_cs(a, sweeps=kc.eig_sweeps)), ut)

    mur = 0.9 * jax.random.normal(jax.random.PRNGKey(4), (v, s, p))
    mui = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (v, s, p))
    keep = jnp.ones((v, s, p), bool)
    cb = CArr(c.re[:, None, :], c.im[:, None, :])
    timeit("_poles_to_lines (V,S,p)",
           jax.jit(lambda m_, k_, c_: _poles_to_lines(m_, k_, c_, dwell, n, kc)),
           mur if False else CArr(mur, mui), keep, cb)

    cons, _, _, _ = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))(c)
    cdf = D.dfc_from_np(sigs)
    timeit("refine_lines iters=3 (V,C=32)",
           jax.jit(lambda sg, l: refine_lines(sg, l, dwell,
                                              RefineConfig(iters=3))),
           cdf, cons)


if __name__ == "__main__":
    main()
