"""Odometry integration test: synthetic sequence -> ATE ~ 0 (SURVEY.md §4.5)."""

import json

import numpy as np

from semicp.cli.run_odometry import main as odometry_main


def test_synthetic_odometry(tmp_path):
    out = odometry_main([
        "--synthetic", "10", "--n-points", "1200",
        "--out", str(tmp_path / "poses.txt"),
        "--jsonl", str(tmp_path / "metrics.jsonl"),
        "--cloud.n_pad=2048", "--cloud.num_classes=8", "--em.max_iters=20",
    ])
    assert out["frames"] == 10
    assert out["ate_rmse_m"] < 0.05, out["ate_rmse_m"]
    assert out["rpe_trans_m"] < 0.02, out["rpe_trans_m"]
    # poses file is valid KITTI format
    rows = np.loadtxt(tmp_path / "poses.txt")
    assert rows.shape == (10, 12)
    # metrics JSONL is parseable and complete
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(recs) == 9
    assert all("iterations" in r and "cost" in r for r in recs)


def test_pipelined_matches_serial(tmp_path):
    """The scan-ingest pipeline (slam/pipeline.py) changes scheduling
    only: prefetch depth must not change a single pose."""
    base = [
        "--synthetic", "8", "--n-points", "800",
        "--cloud.n_pad=1024", "--cloud.num_classes=8", "--em.max_iters=10",
    ]
    odometry_main(base + ["--out", str(tmp_path / "serial.txt"),
                          "--prefetch", "0"])
    odometry_main(base + ["--out", str(tmp_path / "piped.txt"),
                          "--prefetch", "3"])
    np.testing.assert_array_equal(np.loadtxt(tmp_path / "serial.txt"),
                                  np.loadtxt(tmp_path / "piped.txt"))


def test_scan_prefetcher_order_and_errors():
    from semicp.slam.pipeline import ScanPrefetcher

    items = iter(range(5))
    pf = ScanPrefetcher(lambda: next(items, None), depth=2)
    assert list(pf) == [0, 1, 2, 3, 4]
    assert pf.get() is None          # stays exhausted

    def boom():
        raise RuntimeError("disk gone")

    pf = ScanPrefetcher(boom, depth=2)
    try:
        pf.get()
        raise AssertionError("producer exception not re-raised")
    except RuntimeError as e:
        assert "disk gone" in str(e)


def test_odometry_resume(tmp_path):
    """Kill-and-resume: second invocation with --resume continues from the
    poses file without rewriting history (SURVEY.md §5 failure recovery)."""
    args = [
        "--synthetic", "8", "--n-points", "800",
        "--out", str(tmp_path / "poses.txt"),
        "--cloud.n_pad=1024", "--cloud.num_classes=8", "--em.max_iters=10",
    ]
    out1 = odometry_main(args)
    full = np.loadtxt(tmp_path / "poses.txt")
    # truncate to simulate a crash after 4 frames
    np.savetxt(tmp_path / "poses.txt", full[:4], fmt="%.9e")
    out2 = odometry_main(args + ["--resume"])
    resumed = np.loadtxt(tmp_path / "poses.txt")
    assert resumed.shape == full.shape
    # prefix must be preserved bit-for-bit
    np.testing.assert_allclose(resumed[:4], full[:4], atol=1e-12)


def test_odometry_gt_eval_on_kitti_sequence(tmp_path, rng):
    """--gt/--calib: real-sequence mode evaluates ATE against KITTI
    ground truth transformed into the velodyne frame (the reference
    workflow's offline devkit/evo step, built in)."""
    import jax.numpy as jnp

    from semicp.cli.run_odometry import build_parser, run_odometry
    from semicp.data import make_scene, render_scan, save_kitti_poses
    from semicp.geom.se3 import se3_exp

    scene, labels = make_scene(rng, n_points=4000, extent=15.0)
    labels = labels - 1
    step = np.asarray(se3_exp(jnp.asarray(
        np.array([0.5, 0, 0, 0, 0, 0.02], np.float32))), np.float64)
    traj = [np.eye(4)]
    for _ in range(5):
        traj.append(traj[-1] @ step)
    traj = np.stack(traj)

    seq = tmp_path / "seq"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    for i, pose in enumerate(traj):
        pts, lab = render_scan(rng, scene, labels, pose, max_range=14.0,
                               max_points=1200)
        arr = np.zeros((len(pts), 4), np.float32)
        arr[:, :3] = pts
        arr.tofile(seq / "velodyne" / f"{i:06d}.bin")
        # SemanticKITTI: lower 16 bits label id (raw ids; loader remaps)
        (lab.astype(np.uint32)).tofile(seq / "labels" / f"{i:06d}.label")

    # gt poses in a fake CAMERA frame: P_cam = Tr P_velo Tr^-1
    Tr = np.eye(4)
    Tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
    save_kitti_poses(tmp_path / "gt.txt", Tr[None] @ traj @ np.linalg.inv(Tr)[None])
    with open(tmp_path / "calib.txt", "w") as f:
        f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :].reshape(-1)) + "\n")

    args = build_parser().parse_args([
        "--seq", str(seq), "--voxel", "0", "--gt", str(tmp_path / "gt.txt"),
        "--calib", str(tmp_path / "calib.txt"),
        "--out", str(tmp_path / "poses.txt")])
    from semicp.config import Config

    out, _timer = run_odometry(args, Config().override({
        "cloud.n_pad": 2048, "cloud.num_classes": 8, "em.max_iters": 10}))
    assert out["frames"] == 6
    assert "ate_rmse_m" in out, out.keys()
    assert out["ate_rmse_m"] < 0.2, out["ate_rmse_m"]
