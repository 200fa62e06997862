"""Steady-state phase profiling on the current JAX platform.

Usage: python scripts/profile_phases.py [n_points] [repeats]
Reports per-phase steady-state ms: covariance preprocess, E-step-only,
full align, and the e2e odometry scan cost (preprocess + align).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semicp.cloud import make_cloud, preprocess_cloud
from semicp.config import Config
from semicp.data import make_pair, make_scene
from semicp.register import make_align_fn
from semicp.register.em_icp import _estep
from semicp.register.gauss_newton import gn_solve


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_pad = 1 << int(np.ceil(np.log2(n_points)))
    cfg = Config().override({"cloud.n_pad": n_pad, "cloud.num_classes": 8,
                             "em.max_iters": 20})
    rng = np.random.default_rng(0)
    tgt_pts, tgt_lab = make_scene(rng, n_points=n_points, extent=40.0, n_classes=8)
    tgt_lab = tgt_lab - 1
    src_pts, src_lab, T_gt = make_pair(
        rng, tgt_pts, tgt_lab, np.array([0.5, -0.2, 0.05, 0.01, -0.02, 0.04]),
        noise=0.02, dropout=0.1, n_classes=8)

    raw_src = make_cloud(src_pts, src_lab, n_pad=n_pad)
    raw_tgt = make_cloud(tgt_pts, tgt_lab, n_pad=n_pad)

    pre = jax.jit(lambda c: preprocess_cloud(c, cfg.cov))
    ms_pre, src = timeit(pre, raw_src, reps=reps)
    _, tgt = timeit(pre, raw_tgt, reps=1)
    print(f"preprocess (cov kNN+reg): {ms_pre:8.2f} ms")

    T0 = jnp.eye(4, dtype=jnp.float32)

    from semicp.register.em_icp import _prepare_target

    @jax.jit
    def estep_only(tgt, src, T):
        return _estep(_prepare_target(tgt, cfg), src, T, cfg)

    ms_e, (x_pl, w, sinv) = timeit(estep_only, tgt, src, T0, reps=reps)
    print(f"E-step (NN+weights):      {ms_e:8.2f} ms")

    @jax.jit
    def mstep_only(T, x_pl, w, sinv):
        return gn_solve(T, tuple(src.xyz), x_pl, w, sinv, cfg.gn)

    ms_m, _ = timeit(mstep_only, T0, x_pl, w, sinv, reps=reps)
    print(f"M-step (GN x{cfg.gn.max_iters}):          {ms_m:8.2f} ms")

    align = make_align_fn(cfg)
    ms_a, res = timeit(align, src, tgt, reps=reps)
    print(f"align (EM, {int(res.iterations):2d} iters):     {ms_a:8.2f} ms")
    print(f"e2e scan (pre+align):     {ms_pre + ms_a:8.2f} ms  "
          f"-> {1000.0/(ms_pre+ms_a):6.2f} scans/s")


if __name__ == "__main__":
    main()
