"""North-star benchmark: LL-KBDM voxel fits/sec/chip (BASELINE.json:2).

Measures, on one chip:

1. `llckbdm_refined_fits_per_sec_per_chip` — the PRIMARY metric and the one
   vs_baseline is computed on: the full pipeline THAT MEETS THE 1e-8
   ACCURACY GATE (multi-m KBDM sweep -> pool -> DBSCAN -> consolidation ->
   double-float Gauss-Newton refinement, default 6 iterations — the count
   the committed tests prove converges for noisy config-1 signals).  The
   gate is not just advertised: it is ASSERTED in-bench on sample voxels
   against a float64 oracle GN polish of the same initial line list
   (BASELINE.json:5 couples the 10k fits/s target to the 1e-8 gate).
2. `fit_fits_per_sec` — the f32 pipeline alone (no refinement), for
   comparison with rounds 1-2 which reported only this.
3. `eigensolve_gflops` — the batched complex-symmetric Jacobi eigensolve
   (ops.pallas_jacobi.eig_cs) at the pipeline's exact shapes: the second
   north-star metric (BASELINE.json:2).
4. Per-stage wall times (sweep / cluster+consolidate / refine) and
   convergence counters — SURVEY.md §5 observability row.  The Jacobi
   counter is the final off-diagonal norm of the PRODUCTION reduced
   matrices relative to their Frobenius norm (kbdm_sweep with_diag=True),
   asserted < 1e-2 in-bench.

Default voxel batch 2048: round-5 saturation (f32-only fits/s on v5e):
V=128 -> 1285, 256 -> 1967, 512 -> 2097, 1024 -> 2262, 2048 -> 2344 —
the curve keeps climbing (run with --saturation to reproduce; rounds 3/4
saturated at 512/1024 with the older kernel structures).

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
    per-voxel frequency/amplitude jitter + complex noise (realistic MRSI).
    Returns (signals (V, N) complex128, per-voxel truth params (V, 5, 4))."""
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
    truths = np.empty((v, 5, 4))
    for i in range(v):
        p = base.copy()
        p[:, 2] += rng.normal(scale=2.0, size=5)
        p[:, 0] *= 1.0 + rng.normal(scale=0.05, size=5)
        sigs[i] = sample_signal(p, n, dwell)
        truths[i] = p
    sigs += 1e-4 * (rng.standard_normal((v, n))
                    + 1j * rng.standard_normal((v, n)))
    return sigs, truths


def eig_cs_flops(batch: int, p: int, sweeps: int) -> float:
    """FLOP count of the batched complex-symmetric Jacobi eigensolve.

    Per rotation pair: 4 row-output components x p entries x 7 flops
    (complex rotate = 4 mul + 3 add per entry) + ~140 flops of complex
    coefficient math and 2x2 entry fixes.  Pairs per solve:
    sweeps * (p-1) rounds * p/2 disjoint pairs.

    Cross-checked against XLA cost analysis of the lax.scan formulation
    (round-3 VERDICT weak #7): XLA counts 1.75e5 flops per scan step at
    (B=64, p=16) -> 2.1e8 total over the 1200 steps, ~4.7x this model —
    the difference is the scan's gather/scatter/select bookkeeping ops,
    which the model deliberately excludes (algorithmic flops only).  The
    published GFLOP/s is therefore a CONSERVATIVE (under-) estimate of
    device work.
    """
    pairs = sweeps * (p - 1) * (p // 2)
    per_pair = 4 * p * 7 + 140
    return float(batch) * pairs * per_pair


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--gn-iters", type=int, default=6,
                    help="double-float GN refinement iterations; 6 is the "
                         "count the committed tests prove meets the 1e-8 "
                         "gate for noisy config-1 (tests/test_solver.py), "
                         "and the gate is asserted in-bench anyway")
    ap.add_argument("--gn-f32-iters", type=int, default=0,
                    help="plain-f32 GN warm-start iterations before the "
                         "double-float ones.  Measured perf-NEUTRAL on "
                         "v5e (an f32 iteration costs the same ~5 ms as a "
                         "df one: the Jacobian einsums + solve dominate, "
                         "not the df arithmetic), so the default stays "
                         "all-df; 3+3 provably meets the gate too "
                         "(test_refine_f32_warmstart_hits_gate)")
    ap.add_argument("--refine-clusters", type=int, default=16,
                    help="cluster slots refined (consolidated slots are "
                         "count-sorted, so slicing keeps the largest; 16 "
                         ">> the ~5-8 genuine clusters at min_samples=20, "
                         "and halves the GN einsum/solve cost vs C=32)")
    ap.add_argument("--gate-voxels", type=int, default=3,
                    help="sample voxels on which the 1e-8 oracle gate is "
                         "ASSERTED in-bench (0 disables)")
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
    rcfg = RefineConfig(iters=args.gn_iters, f32_iters=args.gn_f32_iters)
    s_sweep, p = len(cfg.m_values), cfg.kbdm.p

    sigs, truths = make_signals(v, n, dwell)
    c32 = CArr(jnp.asarray(sigs.real, jnp.float32),
               jnp.asarray(sigs.imag, jnp.float32))
    cdf = D.dfc_from_np(sigs)

    if args.saturation:
        fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))
        for vv in (128, 256, 512, 1024, 2048):
            if vv <= v:
                cs, count = CArr(c32.re[:vv], c32.im[:vv]), vv
            else:
                tiles = vv // v
                cs = CArr(jnp.tile(c32.re, (tiles, 1)),
                          jnp.tile(c32.im, (tiles, 1)))
                count = v * tiles      # actual batch, not the requested vv
            t, _ = timeit(fit, (cs,), args.reps)
            log(f"# saturation V={count}: {count / t:.1f} fits/s", quiet)
        return

    # --- stage 1: f32 pipeline -------------------------------------------
    fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))
    t0 = time.perf_counter()
    cons, _flat, counts, _stats = fit(c32)
    jax.block_until_ready(counts)
    log(f"# fit warmup (compile+run): {time.perf_counter() - t0:.1f}s", quiet)
    t_fit, (cons, _flat, counts, _stats) = timeit(fit, (c32,), args.reps)

    # --- stage 2: refinement (the gate-meeting pipeline) ------------------
    # consolidated slots are ordered by descending cluster size
    # (ops.dbscan.compact_labels), so the top --refine-clusters slice keeps
    # every genuine line; the gate assertion below would catch a miss.
    rc = min(args.refine_clusters, cfg.max_clusters)
    cons = jax.tree.map(lambda x: x[..., :rc], cons)
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

    # --- eigensolve GFLOP/s (north-star metric 2): timing on random dense
    # complex-symmetric matrices at pipeline shapes (fixed sweep count, so
    # the timing is convergence-independent) -------------------------------
    eig_batch = s_sweep * v
    rng = np.random.default_rng(1)
    ut = rng.standard_normal((eig_batch, p, p)) \
        + 1j * rng.standard_normal((eig_batch, p, p))
    ut = 0.5 * (ut + np.swapaxes(ut, -1, -2))
    utc = CArr(jnp.asarray(ut.real, jnp.float32),
               jnp.asarray(ut.imag, jnp.float32))
    sweeps = cfg.kbdm.eig_sweeps
    eig = jax.jit(lambda x: jacobi.eig_cs(x, sweeps=sweeps))
    t_eig, _ = timeit(eig, (utc,), args.reps)
    gflops = eig_cs_flops(eig_batch, p, sweeps) / t_eig / 1e9

    # --- convergence counter: final Jacobi off-diagonal norm of the
    # PRODUCTION reduced matrices, relative to their Frobenius norm
    # (round-3 VERDICT task 4: random dense matrices legitimately diverge
    # under complex-orthogonal rotations — only the pipeline's own
    # matrices are meaningful to monitor).  Small sub-batch, not timed. ---
    vsub = min(32, v)
    csub = CArr(c32.re[:vsub], c32.im[:vsub])
    _, sweep_diag = jax.jit(lambda x: kbdm_sweep(
        x, dwell, cfg.m_values, cfg.kbdm, with_diag=True))(csub)
    jacobi_offdiag = float(jnp.max(sweep_diag["eig_offdiag_rel"]))
    # RuntimeError, not assert: `python -O` strips asserts, and the JSON
    # line must never claim a gate that was silently skipped.
    if not jacobi_offdiag < 1e-2:
        raise RuntimeError(
            f"Jacobi eigensolve did not converge on production matrices: "
            f"relative off-diagonal {jacobi_offdiag:.3e}")

    # --- 1e-8 accuracy gate, asserted ON THE BENCHMARKED OUTPUTS
    # (BASELINE.json:5 couples the throughput target to the gate): the
    # refined lines of sample voxels must match a float64 oracle GN polish
    # of the same initial line list to <= 1e-8 relative. -------------------
    gate_err = float("nan")
    if args.gate_voxels:
        from llckbdm_tpu.oracle import reference as oracle
        from llckbdm_tpu.signals import line_list_to_np
        from llckbdm_tpu.solver.refine import refined_to_np
        errs = []
        for i in range(min(args.gate_voxels, v)):
            init = line_list_to_np(jax.tree.map(lambda x: x[i], cons))
            est = refined_to_np(jax.tree.map(lambda x: x[i], refined), dwell)
            olines = oracle.refine(init, sigs[i], dwell, iters=20)
            sel_o = oracle.match_lines(olines, truths[i])
            sel_e = oracle.match_lines(est, truths[i])
            errs.append(oracle.line_errors(est[sel_e], olines[sel_o]).max())
        gate_err = float(np.max(errs))
        if not gate_err < 1e-8:
            raise RuntimeError(
                f"refined bench outputs missed the 1e-8 oracle gate: "
                f"max rel err {gate_err:.3e} (per-voxel {errs})")
        log(f"# gate: max rel err vs f64 oracle on {len(errs)} voxels = "
            f"{gate_err:.2e} (< 1e-8)", quiet)

    log(f"# fit {t_fit*1e3:.1f} ms (sweep {t_sweep*1e3:.1f} + cluster "
        f"{t_cluster*1e3:.1f}) + refine {t_refine*1e3:.1f} ms -> "
        f"{fits_refined:.1f} refined fits/s/chip ({fits_f32:.1f} f32-only); "
        f"eig_cs {t_eig*1e3:.2f} ms = {gflops:.1f} GFLOP/s", quiet)

    print(json.dumps({
        "metric": "llckbdm_refined_voxel_fits_per_sec_per_chip",
        "value": round(fits_refined, 2),
        "unit": f"fits/s/chip (N=512, m-sweep 120..256:4, p=16, "
                f"GN iters={args.gn_f32_iters}f32+{args.gn_iters}df, "
                f"1e-8 gate asserted)",
        "vs_baseline": round(fits_refined / TARGET_PER_CHIP, 3),
        "fit_fits_per_sec": round(fits_f32, 2),
        "eigensolve_gflops": round(gflops, 2),
        "stage_ms": {"sweep": round(t_sweep * 1e3, 2),
                     "cluster_consolidate": round(t_cluster * 1e3, 2),
                     "refine": round(t_refine * 1e3, 2)},
        "counters": {"jacobi_offdiag_rel_production": jacobi_offdiag,
                     "gn_last_step_max": gn_step,
                     "gate_max_rel_err": gate_err},
        "voxels": v,
    }))


if __name__ == "__main__":
    main()
