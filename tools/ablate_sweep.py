"""In-context marginal cost of each kbdm_sweep stage (TPU).

Isolated per-stage timings (tools/profile_stages.py) are distorted twice:
the ~30 ms axon per-dispatch floor, and the loss of cross-stage XLA fusion.
This tool instead jits PREFIXES of the real sweep computation (mirroring
solver/kbdm.py kbdm_sweep stage by stage — keep in sync) and reports
consecutive differences — the true in-context marginal cost of every stage
at bench shapes.  Reduces each prefix output to a scalar so transfer cost
is nil.

Usage: python tools/ablate_sweep.py [--voxels 512] [--reps 5]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from llckbdm_tpu.ops.cplx import CArr, cmatmul, conj
from llckbdm_tpu.ops import jacobi
from llckbdm_tpu.ops.hankel import hankel_matrices
from llckbdm_tpu.ops.linalg import takagi_small
from llckbdm_tpu.oracle.reference import sample_signal
from llckbdm_tpu.pipeline.llckbdm import LlcKbdmConfig
from llckbdm_tpu.solver.kbdm import KbdmConfig, _poles_to_lines

_es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def scalarize(tree):
    leaves = [x for x in jax.tree.leaves(tree)
              if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                             jnp.floating)]
    return sum(jnp.sum(x) for x in leaves)


def sweep_prefix(c: CArr, dwell: float, m_values, cfg: KbdmConfig,
                 stop: str):
    """Mirror of solver.kbdm.kbdm_sweep ((..., m, S, k) layout) with a
    static stage cut-point."""
    m_values = tuple(int(m) for m in m_values)
    m_max = max(m_values)
    n = c.re.shape[-1]
    p, k = cfg.p, cfg.p + cfg.oversample
    ns = len(m_values)

    h0 = hankel_matrices(c, m_max)
    h1 = hankel_matrices(c, m_max, shift=1)
    if stop == "hankel":
        return scalarize((h0, h1))

    masks = np.zeros((ns, m_max), np.float32)
    for s, m in enumerate(m_values):
        masks[s, :m] = 1.0
    omega = jax.random.normal(jax.random.PRNGKey(cfg.seed), (m_max, k),
                              dtype=c.re.dtype)
    mk = jnp.asarray(masks.T)[:, :, None]

    def apply_op(h, x):
        xm = CArr(x.re * mk, x.im * mk)
        j = xm.re.shape[-1]
        flat = CArr(xm.re.reshape(*xm.re.shape[:-2], ns * j),
                    xm.im.reshape(*xm.im.shape[:-2], ns * j))
        y = cmatmul(h, flat)
        y = CArr(y.re.reshape(*y.re.shape[:-1], ns, j),
                 y.im.reshape(*y.im.shape[:-1], ns, j))
        return CArr(y.re * mk, y.im * mk)

    def gram_sk(a, b):
        re = _es('...msk,...msl->...skl', a.re, b.re) + \
             _es('...msk,...msl->...skl', a.im, b.im)
        im = _es('...msk,...msl->...skl', a.re, b.im) - \
             _es('...msk,...msl->...skl', a.im, b.re)
        return CArr(re, im)

    def mix_sk(a, w):
        re = _es('...msk,...skl->...msl', a.re, w.re) - \
             _es('...msk,...skl->...msl', a.im, w.im)
        im = _es('...msk,...skl->...msl', a.re, w.im) + \
             _es('...msk,...skl->...msl', a.im, w.re)
        return CArr(re, im)

    def orth_sk(y, passes):
        from llckbdm_tpu.ops import pallas_linalg
        q = y
        for _ in range(passes):
            g = gram_sk(q, q)
            g = CArr(0.5 * (g.re + jnp.swapaxes(g.re, -1, -2)),
                     0.5 * (g.im - jnp.swapaxes(g.im, -1, -2)))
            shift = 3e-6 * jnp.mean(
                jnp.abs(jnp.diagonal(g.re, axis1=-2, axis2=-1)), axis=-1)
            rinv = pallas_linalg.cholqr_rinv(g, shift)
            q = mix_sk(q, rinv)
        return q

    x0 = CArr(omega[:, None, :] * mk, jnp.zeros((m_max, ns, k), c.re.dtype))
    y = apply_op(h0, x0)
    if stop == "sketch":
        return scalarize(y)
    for _ in range(cfg.subspace_iters):
        q = orth_sk(y, passes=1)
        y = apply_op(h0, conj(q))
    q = orth_sk(y, passes=2)
    if stop == "subspace":
        return scalarize(q)

    m_small = gram_sk(q, apply_op(h0, conj(q)))
    m_small = CArr(0.5 * (m_small.re + jnp.swapaxes(m_small.re, -1, -2)),
                   0.5 * (m_small.im + jnp.swapaxes(m_small.im, -1, -2)))
    if stop == "m_small":
        return scalarize(m_small)
    w, sig = takagi_small(m_small, sweeps=cfg.eigh_sweeps)
    if stop == "takagi":
        return scalarize((w, sig))
    u_p = mix_sk(q, CArr(w.re[..., :p], w.im[..., :p]))
    sig_p = sig[..., :p]
    keep_s = sig_p > sig[..., :1] * cfg.rank_tol
    s_isq = jnp.where(keep_s, jax.lax.rsqrt(jnp.maximum(sig_p, 1e-30)), 0.0)
    t = apply_op(h1, conj(u_p))
    ut = gram_sk(u_p, t)
    ut = CArr(ut.re * s_isq[..., :, None] * s_isq[..., None, :],
              ut.im * s_isq[..., :, None] * s_isq[..., None, :])
    ut = CArr(0.5 * (ut.re + jnp.swapaxes(ut.re, -1, -2)),
              0.5 * (ut.im + jnp.swapaxes(ut.im, -1, -2)))
    if stop == "reduced":
        return scalarize(ut)
    mu_s = jacobi.eig_cs(ut, sweeps=cfg.eig_sweeps)
    if stop == "eig":
        return scalarize(mu_s)

    c_b = CArr(c.re[..., None, :], c.im[..., None, :])
    lines = _poles_to_lines(mu_s, keep_s, c_b, dwell, n, cfg)
    return scalarize(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    n, dwell, v = 512, 5e-4, args.voxels
    cfg = LlcKbdmConfig(m_values=tuple(range(120, 257, 4)),
                        eps=2e-4, min_samples=20, max_clusters=32,
                        kbdm=KbdmConfig(p=16))
    kc = cfg.kbdm

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

    print(f"# device={jax.devices()[0].device_kind} V={v} "
          f"S={len(cfg.m_values)} p={kc.p} k={kc.p+kc.oversample}")

    stages = ["hankel", "sketch", "subspace", "m_small", "takagi",
              "reduced", "eig", "lines"]
    prev = 0.0
    for stop in stages:
        f = jax.jit(lambda x, stop=stop: sweep_prefix(
            x, dwell, cfg.m_values, kc, stop))
        t0 = time.perf_counter()
        out = f(c)
        jax.block_until_ready(out)
        np.asarray(jax.device_get(out))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(c)
            jax.block_until_ready(out)
        np.asarray(jax.device_get(out))
        cum = (time.perf_counter() - t0) / args.reps
        print(f"{stop:10s} cum {cum*1e3:8.2f} ms   marginal "
              f"{(cum-prev)*1e3:8.2f} ms   (compile {compile_s:5.1f}s)",
              flush=True)
        prev = cum


if __name__ == "__main__":
    main()
