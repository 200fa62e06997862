"""Data ingestion tests on hand-built binary fixtures (SURVEY.md §4.4)."""

import numpy as np

from semicp.data import (
    load_kitti_poses,
    load_semantickitti_labels,
    load_velodyne_bin,
    remap_semantickitti,
    save_kitti_poses,
)
from semicp.data.kitti import load_kitti_calib, voxel_downsample


def test_velodyne_bin_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    f = tmp_path / "000000.bin"
    pts.tofile(f)
    got = load_velodyne_bin(f)
    np.testing.assert_array_equal(got, pts)


def test_label_parsing(tmp_path):
    sem = np.array([10, 40, 252, 0], np.uint32)
    inst = np.array([7, 0, 3, 0], np.uint32)
    raw = (inst << 16) | sem
    f = tmp_path / "000000.label"
    raw.astype(np.uint32).tofile(f)
    s, i = load_semantickitti_labels(f)
    np.testing.assert_array_equal(s, [10, 40, 252, 0])
    np.testing.assert_array_equal(i, [7, 0, 3, 0])
    train = remap_semantickitti(s)
    np.testing.assert_array_equal(train, [1, 9, 1, 0])  # car, road, moving-car->car


def test_pose_io_roundtrip(tmp_path, rng):
    n = 5
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(n, 3))
    f = tmp_path / "poses.txt"
    save_kitti_poses(f, poses)
    got = load_kitti_poses(f)
    np.testing.assert_allclose(got, poses, atol=1e-8)
    # file format: 12 numbers per line
    line = f.read_text().splitlines()[0].split()
    assert len(line) == 12


def test_calib_parse(tmp_path):
    f = tmp_path / "calib.txt"
    tr = np.arange(12, dtype=float)
    f.write_text("P0: " + " ".join(["0"] * 12) + "\nTr: " + " ".join(map(str, tr)) + "\n")
    T = load_kitti_calib(f)
    np.testing.assert_allclose(T[:3, :].ravel(), tr)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1])


def test_voxel_downsample(rng):
    xyz = rng.uniform(0, 10, size=(5000, 3))
    lab = rng.integers(0, 5, size=5000).astype(np.int32)
    out, lout = voxel_downsample(xyz, lab, 1.0)
    assert len(out) < 5000 and len(out) == len(lout)
    # at most one point per occupied cell
    cells = np.floor(out / 1.0).astype(np.int64)
    keys = set(map(tuple, cells))
    assert len(keys) == len(out)
