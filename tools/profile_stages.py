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
    row = {"stage": name, "ms": round(avg * 1e3, 2),
           "gflops": round(flops / 1e9, 1) if flops else None,
           "unit": unit or None,
           "pct_peak": round(flops / avg /
                             (MXU_F32_PEAK if unit == "MXU"
                              else VPU_PEAK) * 100, 1)
           if flops else None}
    if hbm_bytes:
        row["gbytes"] = round(hbm_bytes / 1e9, 2)
        row["gb_per_s"] = round(hbm_bytes / avg / 1e9, 1)
        if not flops:
            row["unit"] = "HBM"
            row["pct_peak"] = round(hbm_bytes / avg / HBM_BW * 100, 1)
    _rows.append(row)
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
    # cholqr kernel work model (ACTUAL rows-only ops, not minimal
    # triangular flops): _chol_inplace does k full-block masked rank-1
    # updates (~12 flops/entry incl. the mask multiply) ~= 12 k^3; the
    # triangular inverse k full-block multiplies + reductions ~= 14 k^3.
    f_cholqr = float(s * v) * 26.0 * k ** 3
    if jax.devices()[0].platform == "tpu":
        timeit("  cholqr_rinv kernel (V,S,k,k)",
               jax.jit(lambda g: pallas_linalg.cholqr_rinv(
                   g, 1e-6 * jnp.ones(g.re.shape[:-2], g.re.dtype))),
               g_small, flops=f_cholqr, unit="VPU")

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
    t_cluster = t_full - t_sw
    # cluster+consolidate work model (n = S*p pooled lines, C clusters):
    # VPU — O(n^2) adjacency/dist (6n^2) + counts (2n^2) + ~8 propagation
    # rounds of masked min (3n^2 each) + border (3n^2) + 5 rank-median
    # 'before' matrices (3n^2 each); MXU-bf16 — 5 rank matmuls (n, n)@(n, C).
    # The measured % is low by construction: the label-propagation
    # while_loop is LATENCY-bound (each round is a full HBM round trip of
    # the adjacency mask), which is why dbscan_1d wins on CPU but the
    # O(n^2) form still wins on TPU (sort costs more; see ops/dbscan.py).
    npool = s * p
    cc_cl = cfg.max_clusters
    f_cluster_vpu = float(v) * 50.0 * npool * npool
    f_cluster_mxu = float(v) * 10.0 * npool * npool * cc_cl
    pct_cl = (f_cluster_vpu / (t_cluster * 1e-3) / VPU_PEAK * 100
              if t_cluster > 0 else 0.0)
    print(f"{'cluster+consolidate (derived)':44s} {t_cluster:9.2f} ms   "
          f"(VPU model {f_cluster_vpu/1e9:.1f} GF = {pct_cl:.1f}% "
          f"+ {f_cluster_mxu/1e9:.1f} GF MXU-bf16)")
    _rows.append({"stage": "cluster+consolidate (derived)",
                  "ms": round(t_cluster, 2),
                  "gflops": round((f_cluster_vpu + f_cluster_mxu) / 1e9, 1),
                  "unit": "VPU+MXU(bf16)",
                  "pct_peak": round(pct_cl, 1),
                  "note": "latency-bound propagation while_loop; pct is "
                          "VPU share only"})

    cdf = D.dfc_from_np(sigs)
    cc = cons.amplitude.shape[-1]
    iters = 3
    f_ref = float(v) * iters * (12 * 2 * cc * cc * n + 16 * cc * n
                                + 9 * 36 * cc * n + 8 * (2 * cc) ** 3 / 3)
    timeit(f"refine_lines iters={iters} (V,C={cc})",
           jax.jit(lambda sg, l: refine_lines(sg, l, dwell,
                                              RefineConfig(iters=iters))),
           cdf, cons, flops=f_ref, unit="MXU")

    # --- aggregate distance-to-light (round-4 review next #5) -------------
    # Ideal time = sum over the REAL per-launch stage inventory of
    # (modeled work) / (the binding unit's peak), using the precision each
    # stage actually runs at.  Z = ideal / measured is the single
    # "fraction of speed-of-light" figure for the full fit.
    MXU_BF16_PEAK = 197e12
    it_sub = kc.subspace_iters
    f_apply16 = 8.0 * m_max * m_max * k * s * v        # one bf16 apply
    f_gram = 8.0 * m_max * k * k * s * v               # one gram/mix einsum
    f_cholqr1 = float(s * v) * 26.0 * k ** 3
    pairs_g = kc.eigh_sweeps * (k - 1) * (k // 2)
    f_takagi1 = float(s * v) * pairs_g * 72 * k
    ep_ = kc.eig_sweeps * (p - 1) * (p // 2)
    f_eig1 = float(s * v) * ep_ * (4 * p * 7 + 140)
    nch = (n + kc.rhs_chunk - 1) // kc.rhs_chunk
    f_lines1 = float(s * v) * (nch * kc.rhs_chunk * p * 14
                               + 60 * p * p + 8 * p ** 3 / 3)
    ideal = {
        # U0 only: U1 is never materialized (shift-structure reduced step)
        "hankel U0 (HBM)": (v * m_max * m_max * 8) / HBM_BW,
        "bf16 applies x%d" % (1 + it_sub):
            (1 + it_sub) * f_apply16 / MXU_BF16_PEAK,
        "bf16 orth grams/mixes": it_sub * 2 * f_gram / MXU_BF16_PEAK,
        "f32 final orth x2 (gram+mix)": 4 * f_gram / MXU_F32_PEAK,
        "cholqr kernels x%d" % (it_sub + 2):
            (it_sub + 2) * f_cholqr1 / VPU_PEAK,
        "m_small apply+gram (f32)":
            (8.0 * m_max * m_max * k * s * v + f_gram) / MXU_F32_PEAK,
        "takagi (gram_svd kernel)": f_takagi1 / VPU_PEAK,
        # U1 conj(u_p) = shift(t0 conj(w_p)) + correction row: a k->p mix
        # + rank-1 row work instead of the dense m x m apply
        "u_p mix + U1-shift mix + gram (f32)":
            (8.0 * m_max * k * p * s * v + 8.0 * m_max * k * p * s * v
             + 8.0 * m_max * p * p * s * v) / MXU_F32_PEAK,
        "eig_cs kernel": f_eig1 / VPU_PEAK,
        "poles->lines": f_lines1 / VPU_PEAK,
        "cluster+consolidate":
            f_cluster_vpu / VPU_PEAK + f_cluster_mxu / MXU_BF16_PEAK,
    }
    ideal_fit_ms = sum(ideal.values()) * 1e3
    print("\n# ideal (speed-of-light) per-launch budget:")
    for kname, t in ideal.items():
        print(f"  {kname:36s} {t*1e3:7.2f} ms")
    z_fit = ideal_fit_ms / t_full * 100.0
    print(f"# full f32 fit: ideal {ideal_fit_ms:.1f} ms / measured "
          f"{t_full:.1f} ms -> {z_fit:.1f}% of binding unit peaks")

    import json
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE.json"), "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "voxels": v, "rows": _rows,
                   "ideal_ms": {kk: round(tt * 1e3, 2)
                                for kk, tt in ideal.items()},
                   "pipeline_pct_of_light": round(z_fit, 1)}, f, indent=1)
    print("# wrote PROFILE.json")


if __name__ == "__main__":
    main()
