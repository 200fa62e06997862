"""Native C++ loader vs numpy reference (SURVEY.md §4.4 + native runtime)."""

import numpy as np
import pytest

from semicp.data import native
from semicp.data.kitti import _REMAP_LUT, remap_semantickitti, voxel_downsample

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native loader unavailable (no g++?)"
)


def test_native_bin_matches_numpy(tmp_path, rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    f = tmp_path / "scan.bin"
    pts.tofile(f)
    xyz, inten = native.load_bin_planar(f)
    np.testing.assert_array_equal(xyz.T, pts[:, :3])
    np.testing.assert_array_equal(inten, pts[:, 3])


def test_native_labels_match_numpy(tmp_path, rng):
    raw = rng.choice([0, 10, 40, 252, 81], size=300).astype(np.uint32)
    inst = rng.integers(0, 5, size=300).astype(np.uint32)
    ((inst << 16) | raw).astype(np.uint32).tofile(tmp_path / "l.label")
    got = native.load_labels_remapped(tmp_path / "l.label", _REMAP_LUT, 300)
    np.testing.assert_array_equal(got, remap_semantickitti(raw.astype(np.int32)))


def test_native_voxel_downsample_semantics(rng):
    xyz = rng.uniform(0, 8, size=(4000, 3)).astype(np.float32)
    lab = rng.integers(0, 5, size=4000).astype(np.int32)
    oxyz, olab = native.voxel_downsample_planar(xyz.T.copy(), lab, 0.5)
    # one point per occupied cell, labels preserved from kept points
    cells = np.floor(oxyz.T / 0.5).astype(np.int64)
    assert len({tuple(c) for c in cells}) == oxyz.shape[1]
    ref, _ = voxel_downsample(xyz, lab, 0.5)
    assert abs(oxyz.shape[1] - len(ref)) <= max(4, len(ref) // 50)


def test_load_scan_np_end_to_end(tmp_path, rng):
    from semicp.cli.common import load_scan_np

    pts = rng.normal(size=(1000, 4)).astype(np.float32) * 5
    pts.tofile(tmp_path / "000000.bin")
    raw = rng.choice([10, 40, 50], size=1000).astype(np.uint32)
    raw.tofile(tmp_path / "000000.label")
    xyz, lab = load_scan_np(tmp_path / "000000.bin", tmp_path / "000000.label", voxel=0.5)
    assert xyz.shape[1] == 3 and len(lab) == len(xyz)
    assert set(np.unique(lab)) <= {1, 9, 13}
