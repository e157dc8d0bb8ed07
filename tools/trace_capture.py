"""jax.profiler device-trace capture + top-op attribution (SURVEY.md §5
tracing row; the axon tunnel DOES forward device events — verified: the
trace contains a /device:TPU:0 lane with fusion/copy events).

Captures a profiler trace of `--reps` steady-state iterations of the
bench-shaped LL-KBDM fit (and optionally the refinement), then parses the
trace.json.gz itself and prints the top device ops by total duration —
self-contained attribution, no TensorBoard required.  The raw trace
directory is kept for TensorBoard/XProf (`--out`).

Usage: python tools/trace_capture.py [--voxels 256] [--reps 3]
       [--out /tmp/llckbdm_trace] [--refine]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize(trace_dir: str, top: int = 25) -> None:
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/",
                                   "*.trace.json.gz"))
    if not paths:
        print("# no trace.json.gz found under", trace_dir)
        return
    data = json.loads(gzip.open(sorted(paths)[-1]).read())
    events = data.get("traceEvents", [])

    # map pid -> process name; find the device lane(s)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pnames.items() if "device:" in n.lower()
                or "tpu" in n.lower()}

    totals: dict[str, list[float]] = {}
    wall = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))        # microseconds
            totals.setdefault(name, [0.0, 0])
            totals[name][0] += dur
            totals[name][1] += 1
            wall += dur
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"# device lanes: {[pnames[p] for p in dev_pids]}; "
          f"total device-op time {wall/1e3:.2f} ms")
    print(f"{'op':56s} {'total ms':>9s} {'count':>6s} {'%':>6s}")
    for name, (dur, cnt) in rows:
        print(f"{name[:56]:56s} {dur/1e3:9.3f} {cnt:6d} "
              f"{dur/max(wall,1e-9)*100:6.1f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/llckbdm_trace")
    ap.add_argument("--refine", action="store_true",
                    help="trace the GN refinement instead of the fit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_signals
    from llckbdm_tpu.ops.cplx import CArr
    from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit
    from llckbdm_tpu.solver.kbdm import KbdmConfig
    from llckbdm_tpu.solver.refine import RefineConfig, refine_lines
    from llckbdm_tpu.utils import df as D

    n, dwell, v = 512, 5e-4, args.voxels
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)), eps=2e-4,
                        min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))
    sigs, _ = make_signals(v, n, dwell)
    c32 = CArr(jnp.asarray(sigs.real, jnp.float32),
               jnp.asarray(sigs.imag, jnp.float32))

    fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))
    out = fit(c32)
    jax.block_until_ready(out[2])
    if args.refine:
        cons = jax.tree.map(lambda x: x[..., :16], out[0])
        cdf = D.dfc_from_np(sigs)
        step = jax.jit(lambda s, l: refine_lines(s, l, dwell,
                                                 RefineConfig(iters=6)))
        o = step(cdf, cons)
        jax.block_until_ready(o.gn_step)
        run = lambda: step(cdf, cons)
        sync = lambda o: jax.block_until_ready(o.gn_step)
    else:
        run = lambda: fit(c32)
        sync = lambda o: jax.block_until_ready(o[2])

    os.system(f"rm -rf {args.out}")
    with jax.profiler.trace(args.out):
        for _ in range(args.reps):
            o = run()
        sync(o)
    print(f"# traced {args.reps} iterations "
          f"({'refine' if args.refine else 'fit'}) at V={v} -> {args.out}")
    summarize(args.out)


if __name__ == "__main__":
    main()
