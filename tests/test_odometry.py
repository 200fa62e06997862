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
