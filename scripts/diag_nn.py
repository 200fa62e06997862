"""Diagnose the sparse-NN and covariance kernels at the bench workload.

Measures (on the real chip): candidate-tile counts under the gate,
classes present per tile, isolated kernel times at various class counts,
and the dense-vs-sparse covariance moment pass. Drives the round-2 perf
work; not part of the product path.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from semicp.cloud import make_cloud
from semicp.config import Config
from semicp.data import make_pair, make_scene
from semicp.corr.pallas_nn2 import (
    build_tile_candidates, class_nn_attrs_sparse, sort_cloud_spatial,
)
from semicp.cloud.pallas_cov import neighborhood_moments_pallas
from semicp.cloud.covariance import estimate_radius


def steady(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_points, K = 120000, 20
    n_pad = 131072
    cfg = Config().override({"cloud.n_pad": n_pad, "cloud.num_classes": K})
    rng = np.random.default_rng(0)
    tgt_pts, tgt_lab = make_scene(rng, n_points=n_points, extent=40.0, n_classes=K)
    tgt_lab = tgt_lab - 1
    delta = np.array([0.5, -0.2, 0.05, 0.01, -0.02, 0.04])
    src_pts, src_lab, _ = make_pair(rng, tgt_pts, tgt_lab, delta, noise=0.02,
                                    dropout=0.1, n_classes=K)
    src = make_cloud(src_pts, src_lab, n_pad=n_pad)
    tgt = make_cloud(tgt_pts, tgt_lab, n_pad=n_pad)

    prep = jax.jit(lambda c: sort_cloud_spatial(
        c.xyz, c.label, c.cov6, c.valid, K, cfg.corr.cell))(tgt)
    jax.block_until_ready(prep["xyz_s"])

    # source also Morton sorted (as _align_scoped does)
    from semicp.corr.morton import morton_order
    order = morton_order(src.xyz, src.valid, cfg.corr.cell)
    q_xyz = jnp.take(src.xyz, order, axis=1)
    q_valid = jnp.take(src.valid, order)

    cand, count = build_tile_candidates(q_xyz, q_valid, prep["tlo"], prep["thi"],
                                        cfg.corr.max_dist)
    count = np.asarray(count)
    n_qt, n_tt = cand.shape
    print(f"grid: {n_qt} query tiles x {n_tt} target tiles")
    print(f"cand count: mean={count.mean():.1f} p50={np.median(count):.0f} "
          f"max={count.max()} active_frac={count.mean()/n_tt:.3f}")

    pop = np.array([bin(int(m)).count("1") for m in np.asarray(prep["clsmask"])])
    print(f"classes/tile: mean={pop.mean():.1f} max={pop.max()}")

    # per-(qtile, ttile, class) AABB gating potential: classes per ACTIVE pair
    # (upper bound on savings from per-class AABBs)
    candn = np.asarray(cand)
    act_pop = np.concatenate([pop[candn[i, :count[i]]] for i in range(n_qt)])
    print(f"classes per active pair: mean={act_pop.mean():.1f} "
          f"total class-passes={act_pop.sum()}")

    # isolated NN kernel time
    ms = steady(lambda: class_nn_attrs_sparse(
        prep, q_xyz, q_valid, num_classes=K, gate=cfg.corr.max_dist))
    print(f"NN sparse K=20: {ms:.1f} ms  "
          f"({ms*1e3/(count.sum()):.1f} us/active-pair, "
          f"{ms*1e3/act_pop.sum():.2f} us/class-pass)")

    # class-count scaling: same points, all labels 0
    lab0 = jnp.zeros_like(tgt.label)
    prep1 = jax.jit(lambda c: sort_cloud_spatial(
        c.xyz, lab0, c.cov6, c.valid, 1, cfg.corr.cell))(tgt)
    jax.block_until_ready(prep1["xyz_s"])
    ms1 = steady(lambda: class_nn_attrs_sparse(
        prep1, q_xyz, q_valid, num_classes=1, gate=cfg.corr.max_dist))
    print(f"NN sparse K=1:  {ms1:.1f} ms  (class-pass marginal cost "
          f"~{(ms-ms1)*1e3/max(act_pop.sum()-count.sum(),1):.2f} us)")

    # covariance moments: dense sweep (current product path)
    radius = estimate_radius(tgt.xyz, jnp.maximum(tgt.label, 0), tgt.valid)
    r = float(radius)
    print(f"adaptive radius: {r:.3f} m")
    msd = steady(lambda: neighborhood_moments_pallas(
        tgt.xyz, jnp.maximum(tgt.label, 0), tgt.valid, radius), reps=5)
    print(f"cov moments dense: {msd:.1f} ms")

    # how much would AABB pruning at the cov radius cut?
    cand_c, count_c = build_tile_candidates(
        prep["xyz_s"], prep["label_s"] < K, prep["tlo"], prep["thi"], r)
    cc = np.asarray(count_c)
    print(f"cov cand count at r={r:.2f}: mean={cc.mean():.1f} "
          f"active_frac={cc.mean()/n_tt:.3f}")


if __name__ == "__main__":
    main()
