"""North-star benchmark: LL-KBDM voxel fits/sec/chip (BASELINE.json:2).

Measures, on one chip:

1. `llckbdm_refined_fits_per_sec_per_chip` — the PRIMARY metric and the one
   vs_baseline is computed on: the full pipeline THAT MEETS THE 1e-8
   ACCURACY GATE (multi-m KBDM sweep -> pool -> DBSCAN -> consolidation ->
   3-iteration double-float Gauss-Newton refinement; BASELINE.json:5
   couples the 10k fits/s target to the 1e-8 gate).
2. `fit_fits_per_sec` — the f32 pipeline alone (no refinement), for
   comparison with rounds 1-2 which reported only this.
3. `eigensolve_gflops` — the batched complex-symmetric Jacobi eigensolve
   (ops.pallas_jacobi.eig_cs) at the pipeline's exact shapes: the second
   north-star metric (BASELINE.json:2).
4. Per-stage wall times (sweep / cluster+consolidate / refine) and
   convergence counters (final Jacobi off-diagonal norm, final GN |dz|)
   — SURVEY.md §5 observability row.

Default voxel batch 512: measured saturation V=128 -> 789, V=256 -> ~820,
V=512 -> 833, V=1024 -> (flat) fits/s on v5e; 512 is the knee (run with
--saturation to reproduce).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...}
vs_baseline is against the driver target of >= 10,000 fits/sec on a
v5e-16 slice (BASELINE.json:5), i.e. 625 fits/sec/chip — the reference
itself publishes no numbers (BASELINE.json:13, "published": {}).

Usage: python bench.py [--voxels V] [--reps K] [--json-only] [--saturation]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TARGET_PER_CHIP = 10_000.0 / 16.0  # BASELINE.json:5 on v5e-16


def log(msg: str, quiet: bool) -> None:
    if not quiet:
        print(msg, file=sys.stderr)


def _materialize(out):
    """Force REAL completion: on the axon backend the FIRST
    block_until_ready after a fresh compile can return before the
    computation ran (measured: "blocked" in 0.6 ms, bytes arrived 100 s
    later).  Fetching bytes is the only reliable sync."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, args, reps):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    _materialize(out)
    # time all reps together with ONE final materialization: device runs
    # serialize, so the average is robust even if an individual
    # block_until_ready lies
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    _materialize(out)
    return (time.perf_counter() - t0) / reps, out


def make_signals(v: int, n: int, dwell: float):
    """V distinct voxel signals: the config-1 5-peak line list with small
    per-voxel frequency/amplitude jitter + complex noise (realistic MRSI)."""
    from llckbdm_tpu.oracle.reference import sample_signal
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
        p = base.copy()
        p[:, 2] += rng.normal(scale=2.0, size=5)
        p[:, 0] *= 1.0 + rng.normal(scale=0.05, size=5)
        sigs[i] = sample_signal(p, n, dwell)
    sigs += 1e-4 * (rng.standard_normal((v, n))
                    + 1j * rng.standard_normal((v, n)))
    return sigs


def eig_cs_flops(batch: int, p: int, sweeps: int) -> float:
    """FLOP count of the batched complex-symmetric Jacobi eigensolve.

    Per rotation pair: 4 row-output components x p entries x 7 flops
    (complex rotate = 4 mul + 3 add per entry) + ~140 flops of complex
    coefficient math and 2x2 entry fixes.  Pairs per solve:
    sweeps * (p-1) rounds * p/2 disjoint pairs.
    """
    pairs = sweeps * (p - 1) * (p // 2)
    per_pair = 4 * p * 7 + 140
    return float(batch) * pairs * per_pair


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--saturation", action="store_true",
                    help="sweep voxel counts and report fits/s at each")
    args = ap.parse_args()
    quiet = args.json_only

    import jax
    import jax.numpy as jnp

    from llckbdm_tpu.ops.cplx import CArr
    from llckbdm_tpu.ops import jacobi
    from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit
    from llckbdm_tpu.solver.kbdm import KbdmConfig, kbdm_sweep
    from llckbdm_tpu.solver.refine import RefineConfig, refine_lines
    from llckbdm_tpu.utils import df as D

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}", quiet)

    # North-star config: N=512, m-sweep up to 256 (BASELINE.json:2; N >= 2m).
    n, dwell, v = 512, 5e-4, args.voxels
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)),
                        eps=2e-4, min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))
    rcfg = RefineConfig(iters=3)
    s_sweep, p = len(cfg.m_values), cfg.kbdm.p

    sigs = make_signals(v, n, dwell)
    c32 = CArr(jnp.asarray(sigs.real, jnp.float32),
               jnp.asarray(sigs.imag, jnp.float32))
    cdf = D.dfc_from_np(sigs)

    if args.saturation:
        fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))
        for vv in (128, 256, 512, 1024):
            cs = CArr(c32.re[:vv] if vv <= v else jnp.tile(c32.re, (vv // v, 1)),
                      c32.im[:vv] if vv <= v else jnp.tile(c32.im, (vv // v, 1)))
            t, _ = timeit(fit, (cs,), args.reps)
            log(f"# saturation V={vv}: {vv / t:.1f} fits/s", quiet)
        return

    # --- stage 1: f32 pipeline -------------------------------------------
    fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))
    t0 = time.perf_counter()
    cons, _flat, counts, _stats = fit(c32)
    jax.block_until_ready(counts)
    log(f"# fit warmup (compile+run): {time.perf_counter() - t0:.1f}s", quiet)
    t_fit, (cons, _flat, counts, _stats) = timeit(fit, (c32,), args.reps)

    # --- stage 2: refinement (the gate-meeting pipeline) ------------------
    refine = jax.jit(lambda s, l: refine_lines(s, l, dwell, rcfg))
    t0 = time.perf_counter()
    refined = refine(cdf, cons)
    jax.block_until_ready(refined.z.re.hi)
    log(f"# refine warmup (compile+run): {time.perf_counter() - t0:.1f}s",
        quiet)
    t_refine, refined = timeit(refine, (cdf, cons), args.reps)
    gn_step = float(jnp.max(refined.gn_step))

    t_full = t_fit + t_refine
    fits_refined = v / t_full
    fits_f32 = v / t_fit

    # --- stage timing decomposition ---------------------------------------
    sweep_fn = jax.jit(lambda x: kbdm_sweep(x, dwell, cfg.m_values, cfg.kbdm))
    t_sweep, _ = timeit(sweep_fn, (c32,), args.reps)
    t_cluster = max(t_fit - t_sweep, 0.0)

    # --- eigensolve GFLOP/s + convergence counter (north-star metric 2) ---
    eig_batch = s_sweep * v
    rng = np.random.default_rng(1)
    ut = rng.standard_normal((eig_batch, p, p)) \
        + 1j * rng.standard_normal((eig_batch, p, p))
    ut = 0.5 * (ut + np.swapaxes(ut, -1, -2))
    utc = CArr(jnp.asarray(ut.real, jnp.float32),
               jnp.asarray(ut.imag, jnp.float32))
    sweeps = cfg.kbdm.eig_sweeps
    if on_tpu:
        from llckbdm_tpu.ops import pallas_jacobi
        eig = jax.jit(lambda x: pallas_jacobi.eig_cs_resid(x, sweeps=sweeps))
        t_eig, (_, resid) = timeit(eig, (utc,), args.reps)
        jacobi_offdiag = float(jnp.max(resid))
    else:
        eig = jax.jit(lambda x: jacobi.eig_cs(x, sweeps=sweeps))
        t_eig, _ = timeit(eig, (utc,), args.reps)
        jacobi_offdiag = float("nan")
    gflops = eig_cs_flops(eig_batch, p, sweeps) / t_eig / 1e9

    log(f"# fit {t_fit*1e3:.1f} ms (sweep {t_sweep*1e3:.1f} + cluster "
        f"{t_cluster*1e3:.1f}) + refine {t_refine*1e3:.1f} ms -> "
        f"{fits_refined:.1f} refined fits/s/chip ({fits_f32:.1f} f32-only); "
        f"eig_cs {t_eig*1e3:.2f} ms = {gflops:.1f} GFLOP/s", quiet)

    print(json.dumps({
        "metric": "llckbdm_refined_voxel_fits_per_sec_per_chip",
        "value": round(fits_refined, 2),
        "unit": "fits/s/chip (N=512, m-sweep 120..256:4, p=16, GN iters=3)",
        "vs_baseline": round(fits_refined / TARGET_PER_CHIP, 3),
        "fit_fits_per_sec": round(fits_f32, 2),
        "eigensolve_gflops": round(gflops, 2),
        "stage_ms": {"sweep": round(t_sweep * 1e3, 2),
                     "cluster_consolidate": round(t_cluster * 1e3, 2),
                     "refine": round(t_refine * 1e3, 2)},
        "counters": {"jacobi_offdiag_final": jacobi_offdiag,
                     "gn_last_step_max": gn_step},
        "voxels": v,
    }))


if __name__ == "__main__":
    main()
