"""Per-stage TPU timing + roofline decomposition of the bench shapes.

Times each pipeline stage in isolation (average of `reps`,
block_until_ready) at the exact shapes bench.py produces, so kernel work
can be attributed, and annotates each stage with a FLOP model and the
implied fraction of the v5e unit peak ("speed-of-light" accounting,
BASELINE.json:5).

Peaks used (TPU v5e public numbers):
  MXU  bf16            197 TFLOP/s
  MXU  f32-via-bf16x6  ~33 TFLOP/s  (Precision.HIGHEST on f32 inputs — the
                                     6-pass scheme; all matmuls here use it)
  VPU  f32             ~ 4 TFLOP/s  (8x128 lanes x 4 ALUs x 2 flop (FMA)
                                     x ~0.94 GHz)
  HBM                  819 GB/s

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

import functools

from llckbdm_tpu.ops.cplx import CArr, cmatmul
from llckbdm_tpu.ops import jacobi
from llckbdm_tpu.ops.linalg import takagi_small

_es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
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


MXU_F32_PEAK = 33e12     # HIGHEST-precision f32 matmul (bf16x6 passes)
VPU_PEAK = 4e12          # f32 elementwise/reduction
HBM_BW = 819e9

_rows = []
_floor_s = 0.0           # per-dispatch RPC floor (measured in main)


def measure_dispatch_floor(reps=10) -> float:
    """The axon tunnel costs ~30 ms per dispatch+sync round trip (measured:
    a trivial jitted x+1 on (8,128) takes the same wall time as a 100-op
    chain).  Isolated stage timings must subtract it or every stage reads
    as ~30 ms too slow."""
    global _floor_s
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    out = f(x)
    jax.block_until_ready(out)
    _materialize(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(out)
        jax.block_until_ready(out)
    _materialize(out)
    _floor_s = (time.perf_counter() - t0) / reps
    print(f"# dispatch floor: {_floor_s*1e3:.1f} ms "
          f"(subtracted from every stage below)")
    return _floor_s


def timeit(name, fn, *args, reps=3, flops=0.0, unit="", hbm_bytes=0.0):
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
    avg = max((time.perf_counter() - t0) / reps - _floor_s, 1e-6)
    extra = ""
    if flops:
        peak = MXU_F32_PEAK if unit == "MXU" else VPU_PEAK
        gfs = flops / avg / 1e9
        extra = f"  {gfs:8.1f} GF/s = {gfs * 1e9 / peak * 100:5.1f}% {unit}"
    if hbm_bytes:
        gbs = hbm_bytes / avg / 1e9
        extra += f"  {gbs:6.1f} GB/s = {gbs * 1e9 / HBM_BW * 100:5.1f}% HBM"
    print(f"{name:44s} {avg*1e3:9.2f} ms   (compile {compile_s:5.1f}s)"
          f"{extra}", flush=True)
    _rows.append({"stage": name, "ms": round(avg * 1e3, 2),
                  "gflops": round(flops / 1e9, 1) if flops else None,
                  "unit": unit or None,
                  "pct_peak": round(flops / avg /
                                    (MXU_F32_PEAK if unit == "MXU"
                                     else VPU_PEAK) * 100, 1)
                  if flops else None})
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
    measure_dispatch_floor()

    timeit("llc_kbdm_fit (full f32)",
           jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg)), c)
    timeit("kbdm_sweep",
           jax.jit(lambda x: kbdm_sweep(x, dwell, cfg.m_values, kc)), c)
    h0 = timeit("hankel_matrices m=256",
                jax.jit(lambda x: hankel_matrices(x, m_max)), c,
                hbm_bytes=v * m_max * m_max * 2 * 4)

    # one masked operator apply at sweep shapes ((..., m, S, k) layout,
    # flattened to one (V,m,m) @ (V,m,S*k) matmul — see solver/kbdm.py)
    masks = np.zeros((s, m_max), np.float32)
    for i, m in enumerate(cfg.m_values):
        masks[i, :m] = 1.0
    mk = jnp.asarray(masks.T)[:, :, None]
    x0 = CArr(jax.random.normal(jax.random.PRNGKey(0), (v, m_max, s, k)),
              jax.random.normal(jax.random.PRNGKey(1), (v, m_max, s, k)))

    def apply_op(h, x):
        xm = CArr(x.re * mk, x.im * mk)
        j = xm.re.shape[-1]
        flat = CArr(xm.re.reshape(*xm.re.shape[:-2], s * j),
                    xm.im.reshape(*xm.im.shape[:-2], s * j))
        y = cmatmul(h, flat)
        y = CArr(y.re.reshape(*y.re.shape[:-1], s, j),
                 y.im.reshape(*y.im.shape[:-1], s, j))
        return CArr(y.re * mk, y.im * mk)

    # FLOP models (f32 real flops; complex MAC = 8 real flops)
    f_apply = 8.0 * m_max * m_max * k * s * v
    y = timeit("apply_op (V,m,m)@(V,m,S*k)",
               jax.jit(lambda h, x: apply_op(h, x)), h0, x0,
               flops=f_apply, unit="MXU")

    # cholqr_rinv kernel alone (the sequential part of orth_sk)
    from llckbdm_tpu.ops import pallas_linalg
    gr = _es('vmsk,vmsl->vskl', y.re, y.re) + _es('vmsk,vmsl->vskl',
                                                  y.im, y.im)
    gi = _es('vmsk,vmsl->vskl', y.re, y.im) - _es('vmsk,vmsl->vskl',
                                                  y.im, y.re)
    g_small = CArr(0.5 * (gr + jnp.swapaxes(gr, -1, -2)),
                   0.5 * (gi - jnp.swapaxes(gi, -1, -2)))
    if jax.devices()[0].platform == "tpu":
        timeit("  cholqr_rinv kernel (V,S,k,k)",
               jax.jit(lambda g: pallas_linalg.cholqr_rinv(
                   g, 1e-6 * jnp.ones(g.re.shape[:-2], g.re.dtype))),
               g_small)

    # takagi timing input: Hermitian rather than complex-symmetric, but the
    # kernel's op count depends only on shape/sweeps — fine for timing
    msml = g_small
    # gram_svd one-sided Jacobi: pairs = sweeps*(k-1)*(k/2); ~72k flops/pair
    pairs = kc.eigh_sweeps * (k - 1) * (k // 2)
    f_takagi = float(s * v) * pairs * 72 * k
    timeit("takagi_small (V,S,k,k) [gram_svd]",
           jax.jit(lambda x: takagi_small(x, sweeps=kc.eigh_sweeps)), msml,
           flops=f_takagi, unit="VPU")

    ur = jax.random.normal(jax.random.PRNGKey(2), (s, v, p, p))
    ui = jax.random.normal(jax.random.PRNGKey(3), (s, v, p, p))
    ut = CArr(0.5 * (ur + jnp.swapaxes(ur, -1, -2)),
              0.5 * (ui + jnp.swapaxes(ui, -1, -2)))
    ep = kc.eig_sweeps * (p - 1) * (p // 2)
    f_eig = float(s * v) * ep * (4 * p * 7 + 140)
    timeit("jacobi.eig_cs (S,V,p,p)",
           jax.jit(lambda a: jacobi.eig_cs(a, sweeps=kc.eig_sweeps)), ut,
           flops=f_eig, unit="VPU")

    mur = 0.9 * jax.random.normal(jax.random.PRNGKey(4), (v, s, p))
    mui = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (v, s, p))
    keep = jnp.ones((v, s, p), bool)
    cb = CArr(c.re[:, None, :], c.im[:, None, :])
    # RHS power-scan + p x p Gram + Cholesky solve (all VPU-dominated)
    nch = (n + kc.rhs_chunk - 1) // kc.rhs_chunk
    f_lines = float(s * v) * (nch * kc.rhs_chunk * p * 14
                              + 60 * p * p + 8 * p ** 3 / 3)
    timeit("_poles_to_lines (V,S,p)",
           jax.jit(lambda m_, k_, c_: _poles_to_lines(m_, k_, c_, dwell, n, kc)),
           CArr(mur, mui), keep, cb, flops=f_lines, unit="VPU")

    fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))
    cons, _, _, _ = fit(c)
    t_sw = [r for r in _rows if r["stage"] == "kbdm_sweep"][0]["ms"]
    t_full = [r for r in _rows if r["stage"].startswith("llc_kbdm")][0]["ms"]
    print(f"{'cluster+consolidate (derived)':44s} {t_full - t_sw:9.2f} ms")

    cdf = D.dfc_from_np(sigs)
    cc = cons.amplitude.shape[-1]
    iters = 3
    f_ref = float(v) * iters * (12 * 2 * cc * cc * n + 16 * cc * n
                                + 9 * 36 * cc * n + 8 * (2 * cc) ** 3 / 3)
    timeit(f"refine_lines iters={iters} (V,C={cc})",
           jax.jit(lambda sg, l: refine_lines(sg, l, dwell,
                                              RefineConfig(iters=iters))),
           cdf, cons, flops=f_ref, unit="MXU")

    import json
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE.json"), "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "voxels": v, "rows": _rows}, f, indent=1)
    print("# wrote PROFILE.json")


if __name__ == "__main__":
    main()
