"""North-star benchmark: LL-KBDM voxel fits/sec/chip (BASELINE.json:2).

Runs the full LL-KBDM pipeline (multi-m KBDM sweep m=120..256 step 4 on
N=512 signals -> pool -> on-device DBSCAN -> median consolidation) over a
voxel batch on one chip and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured against the driver target of >= 10,000 fits/sec on a
v5e-16 slice (BASELINE.json:5), i.e. 625 fits/sec/chip — the reference
itself publishes no numbers (BASELINE.json:13, "published": {}).

Usage: python bench.py [--voxels V] [--reps K] [--json-only]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TARGET_PER_CHIP = 10_000.0 / 16.0  # BASELINE.json:5 on v5e-16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llckbdm_tpu.ops.cplx import CArr
    from llckbdm_tpu.oracle.reference import sample_signal
    from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig, llc_kbdm_fit
    from llckbdm_tpu.solver.kbdm import KbdmConfig

    dev = jax.devices()[0]
    if not args.json_only:
        print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
              file=sys.stderr)

    # North-star config: N=512, m-sweep up to 256 (BASELINE.json:2; N >= 2m).
    n, dwell, v = 512, 5e-4, args.voxels
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)),
                        eps=2e-4, min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))

    # V distinct voxel signals: the config-1 5-peak line list with small
    # per-voxel frequency/amplitude jitter + complex noise (realistic MRSI).
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
    c = CArr(jnp.asarray(sigs.real, jnp.float32),
             jnp.asarray(sigs.imag, jnp.float32))

    fit = jax.jit(lambda x: llc_kbdm_fit(x, dwell, cfg))

    t0 = time.perf_counter()
    out = fit(c)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    if not args.json_only:
        print(f"# warmup (compile+run): {compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fit(c)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    fits_per_sec = v / best
    if not args.json_only:
        print(f"# times: {['%.4f' % t for t in times]} "
              f"-> {fits_per_sec:.1f} fits/s/chip", file=sys.stderr)

    print(json.dumps({
        "metric": "llckbdm_voxel_fits_per_sec_per_chip",
        "value": round(fits_per_sec, 2),
        "unit": "fits/s/chip (N=512, m-sweep 120..256:4, p=16)",
        "vs_baseline": round(fits_per_sec / TARGET_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
