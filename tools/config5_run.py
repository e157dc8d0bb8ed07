"""Config 5 at size: 256x256 = 65,536 voxels through the checkpointed
GridRunner on the local chip (BASELINE.json:11).

Multi-host pods are unavailable in this environment (single real chip; see
SURVEY.md §0/§7) — this executes the SAME code path a pod would run
per-process (GridRunner with process_index/num_processes), at full grid
size, on one chip, and records wall time + throughput + resume behavior.

Resume demonstration: kill the process mid-grid (e.g. run under
`timeout 60`) — the O_EXCL/rename shard protocol guarantees every
completed shard survives — then re-run the same command: completed shards
are skipped ("resumed" in the output) and gather() assembles the grid.

Usage: python tools/config5_run.py [--voxels 65536] [--shard 512]
       [--out /tmp/config5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_grid_signals(v: int, n: int, dwell: float) -> np.ndarray:
    """Vectorized synthesis of v jittered 5-peak voxels (config-1 family,
    matching bench.py's make_signals distribution) + complex noise."""
    base = np.array([
        [1.0, 0.05, -120.0, 0.1],
        [0.8, 0.08, -40.0, 0.0],
        [1.2, 0.03, 15.0, -0.2],
        [0.5, 0.10, 90.0, 0.3],
        [0.9, 0.06, 200.0, 0.0],
    ])
    rng = np.random.default_rng(0)
    amp = base[:, 0] * (1.0 + rng.normal(scale=0.05, size=(v, 5)))
    t2 = np.broadcast_to(base[:, 1], (v, 5))
    freq = base[:, 2] + rng.normal(scale=2.0, size=(v, 5))
    ph = np.broadcast_to(base[:, 3], (v, 5))
    t = np.arange(n) * dwell                           # (n,)
    # c[v, n] = sum_k A e^{i ph} e^{(i 2 pi f - 1/T2) t}
    z = (2j * np.pi * freq[..., None] - 1.0 / t2[..., None]) * t  # (v,5,n)
    sig = np.sum(amp[..., None] * np.exp(1j * ph[..., None] + z), axis=1)
    sig += 1e-4 * (rng.standard_normal((v, n))
                   + 1j * rng.standard_normal((v, n)))
    return sig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=256 * 256)
    ap.add_argument("--shard", type=int, default=512)
    ap.add_argument("--out", default="/tmp/config5")
    args = ap.parse_args()

    import jax
    from llckbdm_tpu.parallel.checkpoint import GridRunner
    from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig
    from llckbdm_tpu.solver.kbdm import KbdmConfig

    n, dwell = 512, 5e-4
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)),
                        eps=2e-4, min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))

    t0 = time.time()
    sigs = make_grid_signals(args.voxels, n, dwell)
    print(f"# synthesized {args.voxels} voxels in {time.time()-t0:.1f}s "
          f"({sigs.nbytes/2**20:.0f} MiB)", flush=True)

    runner = GridRunner(out_dir=args.out, dwell=dwell, cfg=cfg,
                        shard_size=args.shard)
    pend0 = len(runner.pending(args.voxels))
    total = (args.voxels + args.shard - 1) // args.shard
    print(f"# device={jax.devices()[0].device_kind} shards: {total} total, "
          f"{pend0} pending ({total-pend0} resumed)", flush=True)

    t0 = time.time()
    nshards = runner.run(sigs)
    wall = time.time() - t0
    fits = nshards * args.shard / wall if wall else float("inf")
    print(f"# computed {nshards} shards ({nshards*args.shard} voxels) "
          f"in {wall:.1f}s -> {fits:.1f} fits/s "
          f"(incl. host transfers + npz writes)", flush=True)

    res = runner.gather(args.voxels)
    found = (res["mask"] > 0.5).sum(axis=1)
    print(f"# gather OK: {res['amplitude'].shape[0]} voxels; "
          f"lines/voxel min={found.min()} median={np.median(found):.0f} "
          f"max={found.max()}", flush=True)


if __name__ == "__main__":
    main()
