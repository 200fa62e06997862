"""Round-3 profiling: where do the 686 ms/scan actually go on the chip?

Times each pipeline phase in isolation at the bench workload, plus
candidate-count statistics for the block-sparse NN kernel (how much the
AABB pruning actually bites). Run on the TPU:  python scripts/profile_r3.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def steady(fn, *args, reps=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:36s} {ms:9.2f} ms")
    return out


def main():
    from semicp.cloud import make_cloud, preprocess_cloud
    from semicp.cloud.covariance import estimate_radius
    from semicp.cloud.pallas_cov import neighborhood_moments_sparse
    from semicp.config import Config
    from semicp.corr.layout import sort_cloud_cm, tile_candidates, tile_meta
    from semicp.corr.morton import tile_aabbs
    from semicp.corr.pallas_nn2 import class_nn_attrs_sparse, prepare_sparse
    from semicp.data import make_pair, make_scene
    from semicp.register import make_align_fn
    from semicp.register.gauss_newton import apply_T_planar

    n_points = int(os.environ.get("BENCH_N_POINTS", 120000))
    n_classes = int(os.environ.get("BENCH_CLASSES", 20))
    n_pad = 1 << int(np.ceil(np.log2(n_points)))
    cfg = Config().override({
        "cloud.n_pad": n_pad,
        "cloud.num_classes": n_classes,
        "em.max_iters": 20,
    })
    print(f"workload: n={n_points} pad={n_pad} K={n_classes} "
          f"gate={cfg.corr.max_dist} cell={cfg.corr.cell} "
          f"backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    tgt_pts, tgt_lab = make_scene(rng, n_points=n_points, extent=40.0,
                                  n_classes=n_classes)
    tgt_lab = tgt_lab - 1
    delta = np.array([0.5, -0.2, 0.05, 0.01, -0.02, 0.04])
    src_pts, src_lab, T_gt = make_pair(rng, tgt_pts, tgt_lab, delta,
                                       noise=0.02, dropout=0.1,
                                       n_classes=n_classes)
    raw_src = make_cloud(src_pts, src_lab, n_pad=n_pad)
    raw_tgt = make_cloud(tgt_pts, tgt_lab, n_pad=n_pad)

    # --- preprocess phases -------------------------------------------
    pre_fn = jax.jit(lambda c: preprocess_cloud(c, cfg))
    src = pre_fn(raw_src)
    tgt = pre_fn(raw_tgt)
    jax.block_until_ready(tgt.cov6)
    steady(pre_fn, raw_src, reps=5, label="preprocess_cloud (full)")

    sort_fn = jax.jit(lambda c: sort_cloud_cm(c, n_classes, cfg.corr.cell))
    steady(sort_fn, raw_src, reps=5, label="  sort_cloud_cm")

    rad_fn = jax.jit(lambda c: estimate_radius(
        c.xyz, jnp.maximum(c.label, 0), c.valid, k=cfg.cov.k))
    radius = steady(rad_fn, src, reps=5, label="  estimate_radius")
    print(f"    radius = {float(radius):.3f}")

    mom_fn = jax.jit(lambda c, r: neighborhood_moments_sparse(
        c.xyz, jnp.maximum(c.label, 0), c.valid, r, num_classes=n_classes))
    steady(mom_fn, src, radius, reps=5, label="  moments_sparse (n_cap=16)")

    # --- align phases -------------------------------------------------
    align_fn = make_align_fn(cfg)
    res = align_fn(src, tgt)
    jax.block_until_ready(res.T)
    res = steady(align_fn, src, tgt, reps=5, label="align (full EM)")
    print(f"    iters={int(res.iterations)} conv={bool(res.converged)}")

    prep_fn = jax.jit(lambda c: prepare_sparse(c, n_classes, cfg.corr.cell))
    prep = steady(prep_fn, tgt, reps=10, label="prepare_sparse")

    T = jnp.eye(4, dtype=jnp.float32)
    moved = jnp.stack(apply_T_planar(T, tuple(src.xyz)))
    nn_fn = jax.jit(lambda m: class_nn_attrs_sparse(
        prep, m, src.valid, num_classes=n_classes, gate=cfg.corr.max_dist))
    steady(nn_fn, moved, reps=10, label="class_nn_attrs_sparse (1 call)")

    # --- candidate statistics ----------------------------------------
    qb, tb = 256, prep["xyz_s"].shape[1] // prep["lo"].shape[0]
    qlo, qhi = tile_aabbs(moved, src.valid, qb)
    cand, count, overflow = tile_candidates(
        qlo, qhi, prep["lo"], prep["hi"], cfg.corr.max_dist)
    count = np.asarray(count)
    n_tt = prep["lo"].shape[0]
    print(f"NN candidates/qtile over {n_tt} ttiles (tb={tb}): "
          f"mean={count.mean():.1f} p50={np.percentile(count,50):.0f} "
          f"p90={np.percentile(count,90):.0f} max={count.max()} "
          f"grid_programs={count.shape[0] * n_tt} "
          f"active={int(count.sum())}")

    # cov candidate stats
    lab = jnp.maximum(src.label, 0)
    qm = tile_meta(src.xyz, lab, src.valid, n_classes, 256)
    tm = tile_meta(src.xyz, lab, src.valid, n_classes, 512)
    _, ccount, coverflow = tile_candidates(
        qm["lo"], qm["hi"], tm["lo"], tm["hi"], radius,
        n_cap=16, q_range=(qm["cmin"], qm["cmax"]),
        t_range=(tm["cmin"], tm["cmax"]))
    ccount = np.asarray(ccount)
    print(f"cov candidates/qtile: mean={ccount.mean():.1f} "
          f"max={ccount.max()} overflow={int(coverflow)}")


if __name__ == "__main__":
    main()
