"""SLAM layer tests: pose-graph GN, loop closure machinery (SURVEY.md §4.5)."""

import numpy as np
import jax.numpy as jnp

from semicp.config import Config, SLAMConfig
from semicp.geom.se3 import se3_exp
from semicp.slam.pose_graph import (
    PoseGraph, add_edge, add_pose, graph_cost, optimize_pose_graph,
)
from semicp.slam.keyframes import semantic_descriptor, keyframe_due


def T_of(v):
    return np.asarray(se3_exp(jnp.asarray(np.asarray(v, np.float32))))


def test_pgo_closes_square_loop(rng):
    """4-corner square with drifted odometry + one loop edge: PGO must pull
    the final pose back toward the start."""
    edge_T = T_of([2, 0, 0, 0, 0, np.pi / 2])     # true per-side motion
    drift = T_of([0.1, 0.05, 0, 0, 0, 0.02])      # odometry error per side

    graph = PoseGraph.empty(8, 16)
    T = np.eye(4, dtype=np.float32)
    graph = add_pose(graph, T)
    for i in range(4):
        T = (T @ edge_T @ drift).astype(np.float32)
        graph = add_pose(graph, T)
        graph = add_edge(graph, i, i + 1, (edge_T @ drift).astype(np.float32), 1.0)
    # loop closure: pose 4 should equal pose 0 (true measurement = identity)
    graph = add_edge(graph, 0, 4, np.eye(4, dtype=np.float32), 1.0)

    err_before = np.linalg.norm(np.asarray(graph.poses)[4][:3, 3])
    c_before = float(graph_cost(graph))
    opt = optimize_pose_graph(graph, SLAMConfig(pgo_iters=30))
    err_after = np.linalg.norm(np.asarray(opt.poses)[4][:3, 3])
    c_after = float(graph_cost(opt))
    assert c_after < c_before * 0.2, (c_before, c_after)
    assert err_after < err_before * 0.5, (err_before, err_after)
    # gauge: pose 0 pinned at identity
    np.testing.assert_allclose(np.asarray(opt.poses)[0], np.eye(4), atol=1e-3)


def test_pgo_noop_on_consistent_graph(rng):
    """Perfectly consistent odometry chain: PGO must not disturb it."""
    edge_T = T_of([1, 0.2, 0, 0, 0, 0.1])
    graph = PoseGraph.empty(8, 16)
    T = np.eye(4, dtype=np.float32)
    graph = add_pose(graph, T)
    for i in range(5):
        T = (T @ edge_T).astype(np.float32)
        graph = add_pose(graph, T)
        graph = add_edge(graph, i, i + 1, edge_T, 1.0)
    before = np.asarray(graph.poses).copy()
    opt = optimize_pose_graph(graph, SLAMConfig(pgo_iters=10))
    np.testing.assert_allclose(np.asarray(opt.poses)[:6], before[:6], atol=2e-3)


def test_pgo_anisotropic_edge_information(rng):
    """Full 6x6 edge information must beat its scalar summary on an
    anisotropic (corridor-like) constraint (VERDICT r3 Missing #5).

    Pose 1 (truth [1, 1, 0]) sees two conflicting 0->1 edges:
      A: isotropic odometry, x biased (+0.2), weight 1
      B: corridor-style closure, H = diag(100, 0.01, 1, 1, 1, 1) —
         accurate in x, nearly uninformative in y, y reading biased +0.4
    Full-H fusion trusts B's x and ignores B's y; the scalar summary
    (mean diag ~17) turns B isotropic and drags y toward its junk 1.4.
    """
    H = np.diag([100.0, 0.01, 1.0, 1.0, 1.0, 1.0])
    info = float(np.trace(H)) / 6.0
    zA = T_of([1.2, 1.0, 0, 0, 0, 0]).astype(np.float32)
    zB = T_of([1.0, 1.4, 0, 0, 0, 0]).astype(np.float32)

    def solve(use_H):
        g = PoseGraph.empty(4, 8)
        g = add_pose(g, np.eye(4, dtype=np.float32))
        g = add_pose(g, zA)                      # init at odometry
        g = add_edge(g, 0, 1, zA, 1.0)
        g = add_edge(g, 0, 1, zB, info, H=H if use_H else None)
        # huge huber delta: this test isolates the weighting model
        opt = optimize_pose_graph(g, SLAMConfig(pgo_iters=40, pgo_huber=100.0))
        return np.asarray(opt.poses)[1][:3, 3]

    p_full = solve(True)
    p_scalar = solve(False)
    # full H: x snaps to B's accurate 1.0, y stays near A's 1.0
    assert abs(p_full[0] - 1.0) < 0.05, p_full
    assert abs(p_full[1] - 1.0) < 0.1, p_full
    # scalar summary: B's unconstrained y direction corrupts the pose
    assert abs(p_scalar[1] - 1.0) > 0.2, p_scalar


def test_semantic_descriptor_discriminates(rng):
    a = rng.integers(0, 3, size=1000).astype(np.int32)          # classes 0-2
    b = (rng.integers(0, 3, size=1000) + 3).astype(np.int32)    # classes 3-5
    da = semantic_descriptor(a, 8)
    db = semantic_descriptor(b, 8)
    da2 = semantic_descriptor(rng.integers(0, 3, size=1000).astype(np.int32), 8)
    assert np.abs(da - db).sum() > 1.0          # different content far apart
    assert np.abs(da - da2).sum() < 0.2         # same content close


def test_keyframe_due():
    cfg = Config().slam
    T0 = np.eye(4)
    assert not keyframe_due(T0, T_of([0.5, 0, 0, 0, 0, 0]), cfg)
    assert keyframe_due(T0, T_of([cfg.keyframe_trans * 1.5, 0, 0, 0, 0, 0]), cfg)
    assert keyframe_due(T0, T_of([0, 0, 0, 0, 0, cfg.keyframe_rot * 1.5]), cfg)


def test_loop_closure_corrects_drift(tmp_path):
    """Yaw-biased odometry on a closed loop: loop closure + PGO must beat
    pure odometry (the SLAM system's raison d'etre)."""
    from semicp.cli.run_slam import main as slam_main

    common = [
        "--synthetic", "48", "--loop", "--n-points", "1000", "--drift", "0.01",
        "--cloud.n_pad=1024", "--cloud.num_classes=8", "--em.max_iters=12",
        "--slam.keyframe_trans=1.5", "--slam.lc_min_gap=14",
        "--slam.lc_max_dist=5.0",
    ]
    with_lc = slam_main(common + ["--out", str(tmp_path / "pgo.txt")])
    no_lc = slam_main(common + ["--out", str(tmp_path / "nopgo.txt"),
                                "--slam.lc_desc_thresh=-1.0"])
    assert with_lc["loop_edges"] >= 1
    assert no_lc["loop_edges"] == 0
    assert with_lc["ate_rmse_m"] < 0.7 * no_lc["ate_rmse_m"], (
        with_lc["ate_rmse_m"], no_lc["ate_rmse_m"])


def test_slam_driver_synthetic_loop(tmp_path):
    """End-to-end config-3: closed square loop with injected drift; loop
    closure + PGO must beat pure odometry."""
    from semicp.cli.run_slam import main as slam_main

    out = slam_main([
        "--synthetic", "60", "--loop", "--n-points", "1200",
        "--out", str(tmp_path / "poses.txt"),
        "--cloud.n_pad=2048", "--cloud.num_classes=8",
        "--em.max_iters=15", "--slam.keyframe_trans=1.5",
        "--slam.lc_min_gap=8", "--slam.lc_max_dist=8.0",
    ])
    assert out["frames"] == 60
    assert out["keyframes"] >= 4
    assert out["ate_rmse_m"] < 0.5, out["ate_rmse_m"]


def test_pose_graph_capacity_overflow_raises():
    """Silent .at[e].set out-of-bounds drop would let the graph stop
    growing while n_edges keeps counting (VERDICT r4 missing #5)."""
    import pytest

    graph = PoseGraph.empty(2, 1)
    graph = add_pose(graph, np.eye(4, dtype=np.float32))
    graph = add_pose(graph, np.eye(4, dtype=np.float32))
    with pytest.raises(ValueError, match="keyframe capacity"):
        add_pose(graph, np.eye(4, dtype=np.float32))
    graph = add_edge(graph, 0, 1, np.eye(4, dtype=np.float32), 1.0)
    with pytest.raises(ValueError, match="edge capacity"):
        add_edge(graph, 0, 1, np.eye(4, dtype=np.float32), 1.0)


def test_loop_verifier_single_trace(rng):
    """LoopVerifier pads every candidate batch to one fixed shape, so the
    batched-align program traces exactly once per run regardless of how
    the candidate count varies (VERDICT r4 weak #2)."""
    from semicp.cloud import make_cloud, preprocess_cloud
    from semicp.data import make_pair, make_scene
    from semicp.slam import LoopVerifier
    from semicp.slam.keyframes import KeyframeStore, semantic_descriptor

    cfg = Config().override({
        "cloud.n_pad": 512, "cloud.num_classes": 4,
        "em.max_iters": 4, "gn.max_iters": 3,
    })
    store = KeyframeStore()
    poses = np.tile(np.eye(4), (4, 1, 1))
    xyz, lab = make_scene(rng, n_points=300, extent=6.0, n_classes=4)
    lab = lab - 1
    for i in range(4):
        src, slab, _ = make_pair(rng, xyz, lab,
                                 np.array([0.05 * i, 0, 0, 0, 0, 0]),
                                 n_classes=4)
        c = preprocess_cloud(make_cloud(src, slab, n_pad=512), cfg.cov)
        store.add(i, poses[i], c, semantic_descriptor(slab, 4, src))

    v = LoopVerifier(cfg)
    out1 = v.verify(store, [0], 3, poses)           # 1 candidate
    out2 = v.verify(store, [0, 1], 3, poses)        # 2 candidates
    assert len(out1) == 1 and len(out2) == 2
    assert v.align_b._jitted._cache_size() == 1, (
        v.align_b._jitted._cache_size())
