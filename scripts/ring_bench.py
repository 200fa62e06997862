"""Ring-step engine microbench at map-block scale (VERDICT r4 item 3).

Times one full ring sweep (mesh {"blocks": n_dev}) over a large map with
the dense class-sorted kernel vs the Morton/AABB block-sparse kernel per
ring step. On the single-chip sandbox the ring degenerates to one step,
which is exactly the per-step cost that rotates on a real slice.

    python scripts/ring_bench.py [map_points] [query_points] [classes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def drain(out):
    """block_until_ready is a no-op under the axon tunnel; a one-element
    host fetch drains the serialized device stream (see bench._drain)."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def steady(fn, reps=5):
    drain(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    drain(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_map = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19   # 524288
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17     # 131072
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from semicp.cloud import make_cloud
    from semicp.config import Config
    from semicp.data import make_scene
    from semicp.dist import make_mesh
    from semicp.dist.ring_corr import make_ring_nn

    n_dev = len(jax.devices())
    cfg = Config().override({"cloud.n_pad": n_map, "cloud.num_classes": K})
    rng = np.random.default_rng(0)
    # a map-sized scene: several scans' worth of structured points. A
    # product map is fused from per-scan PREPROCESSED keyframe clouds
    # (slam/submap.py), so covariances arrive precomputed; their values
    # do not affect NN timing — synthesize them here
    pts, lab = make_scene(rng, n_points=int(n_map * 0.9), extent=120.0,
                          n_classes=K)
    lab = lab - 1
    cloud = make_cloud(pts, lab, n_pad=n_map)
    cloud = cloud.replace(cov6=jnp.asarray(
        rng.normal(size=(6, n_map)).astype(np.float32) * 0.01))
    qsel = rng.choice(int(n_map * 0.9), size=n_q, replace=False)
    q = jnp.asarray(pts[qsel].T.astype(np.float32))
    # product query clouds arrive class-major-Morton sorted; without a
    # spatial sort, query-tile AABBs span the whole map and the sparse
    # engine's pruning is inert
    from semicp.corr.morton import morton_order

    q = jnp.take(q, morton_order(q, jnp.ones(n_q, bool), cfg.corr.cell),
                 axis=1)
    cloud = jax.block_until_ready(cloud)

    mesh = make_mesh({"blocks": n_dev})
    print(f"map={n_map} queries={n_q} K={K} devices={n_dev} "
          f"gate={cfg.corr.max_dist}")
    results = {}
    for engine in ("dense", "sparse"):
        ring = make_ring_nn(mesh, num_classes=K, engine=engine,
                            gate=cfg.corr.max_dist)
        fn = lambda: ring(q, cloud.xyz, cloud.label,  # noqa: E731
                          cloud.valid, cloud.cov6)
        ms = steady(fn)
        results[engine] = fn()
        print(f"  ring step [{engine:6s}]: {ms:9.2f} ms")

    # agreement on a query slice (bulk device->host over the axon tunnel
    # runs ~0.4 MB/s; a full (K, Q) fetch would dominate the script)
    d2_d, _ = results["dense"]
    d2_s, _ = results["sparse"]
    d2_d = np.asarray(d2_d[:, :8192])
    d2_s = np.asarray(d2_s[:, :8192])
    g2 = cfg.corr.max_dist ** 2 * (1 - 1e-5)
    inside = d2_d <= g2
    err = np.abs(d2_s[inside] - d2_d[inside]).max() if inside.any() else 0.0
    print(f"  within-gate agreement: max |d2 diff| = {err:.2e} "
          f"({inside.mean()*100:.1f}% of (K,Q) within gate)")


if __name__ == "__main__":
    main()
