"""Headline benchmark: semantic EM-ICP scan alignments per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over the CPU kd-tree baseline
(semicp.oracle.cpu_baseline — per-class cKDTree + vectorized numpy EM,
the reference's architecture) on the *same* scan pair on this host
(BASELINE.json:5 target: >=10x).

Runs on whatever the default JAX platform is (the TPU chip under the
driver; CPU elsewhere). KITTI-scale workload: ~26k points per scan
after voxel downsampling, 20 semantic classes' worth of config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from semicp.cloud import make_cloud, preprocess_cloud
    from semicp.config import Config
    from semicp.data import make_pair, make_scene
    from semicp.oracle import OracleParams
    from semicp.oracle.cpu_baseline import semantic_icp_fast
    from semicp.register import make_align_fn
    from semicp.utils import PhaseTimer

    n_points = int(os.environ.get("BENCH_N_POINTS", 26000))
    n_pad = 1 << int(np.ceil(np.log2(n_points)))
    repeats = int(os.environ.get("BENCH_REPEATS", 20))
    platform = jax.devices()[0].platform

    cfg = Config().override(
        {
            "cloud.n_pad": n_pad,
            "cloud.num_classes": 8,
            "em.max_iters": 20,
        }
    )

    rng = np.random.default_rng(0)
    tgt_pts, tgt_lab = make_scene(rng, n_points=n_points, extent=40.0, n_classes=8)
    tgt_lab = tgt_lab - 1
    delta = np.array([0.5, -0.2, 0.05, 0.01, -0.02, 0.04])
    src_pts, src_lab, T_gt = make_pair(
        rng, tgt_pts, tgt_lab, delta, noise=0.02, dropout=0.1, n_classes=8
    )

    timer = PhaseTimer()
    raw_src = make_cloud(src_pts, src_lab, n_pad=n_pad)
    raw_tgt = make_cloud(tgt_pts, tgt_lab, n_pad=n_pad)
    pre_fn = jax.jit(lambda c: preprocess_cloud(c, cfg.cov))
    align_fn = make_align_fn(cfg)

    with timer.phase("compile"):
        src = pre_fn(raw_src)
        tgt = pre_fn(raw_tgt)
        res = align_fn(src, tgt)
        jax.block_until_ready(res.T)

    # Steady state: one scan of odometry work = preprocess the incoming
    # scan + align it against the (already-preprocessed) previous scan.
    with timer.phase("scan_loop"):
        t0 = time.perf_counter()
        for _ in range(repeats):
            src = pre_fn(raw_src)
            res = align_fn(src, tgt)
        jax.block_until_ready(res.T)
        dt = time.perf_counter() - t0
    scans_per_s = repeats / dt

    # accuracy sanity on the bench workload
    T = np.asarray(res.T, np.float64)
    err = T @ np.linalg.inv(T_gt.astype(np.float64))
    terr = float(np.linalg.norm(err[:3, 3]))

    # CPU baseline (same pair, same parameters), unless cached/skipped
    cpu_scans_per_s = None
    cache = os.environ.get("BENCH_CPU_CACHE", "/tmp/semicp_bench_cpu.json")
    if os.environ.get("BENCH_SKIP_CPU") and os.path.exists(cache):
        cpu_scans_per_s = json.load(open(cache))["cpu_scans_per_s"]
    else:
        from semicp.oracle.cpu_baseline import estimate_covariances_fast

        p = OracleParams(max_iters=20)
        # symmetric with the TPU loop: target covariances precomputed
        # (each scan is preprocessed once and reused as target next frame)
        tgt_cov = estimate_covariances_fast(tgt_pts.astype(np.float64), tgt_lab, p)
        t0 = time.perf_counter()
        T_cpu, info = semantic_icp_fast(
            src_pts, src_lab, tgt_pts, tgt_lab, p, tgt_cov=tgt_cov
        )
        cpu_dt = time.perf_counter() - t0
        cpu_scans_per_s = 1.0 / cpu_dt
        json.dump({"cpu_scans_per_s": cpu_scans_per_s}, open(cache, "w"))

    result = {
        "metric": "semantic_em_icp_scans_per_s",
        "value": round(scans_per_s, 3),
        "unit": f"scans/s/{platform}-chip",
        "vs_baseline": round(scans_per_s / cpu_scans_per_s, 2),
    }
    print(json.dumps(result))
    print(
        f"# n={n_points} iters={int(res.iterations)} trans_err={terr:.4f}m "
        f"cpu={cpu_scans_per_s:.3f} scans/s\n" + timer.table(),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
