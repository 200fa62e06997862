"""Submaps: aggregated keyframe clouds for scan-to-map alignment.

Reference counterpart: NONE — map building is part of the SLAM
extension (BASELINE.json:9-10). A submap concatenates the last
`submap_keyframes` keyframe clouds into the newest keyframe's frame,
voxel-downsamples on the host, and preprocesses once. Aligning incoming
scans against a submap instead of the previous scan cuts odometry drift
(more overlap, denser constraint) at the cost of one rebuild per
keyframe — amortized, like the reference's per-frame tree rebuilds
weren't (SURVEY.md §3.2).

These submaps are also the unit of map sharding: dist/ring_corr.py
rotates them around the mesh for map-scale correspondence.
"""

from __future__ import annotations

import numpy as np

from semicp.cloud import Cloud, make_cloud, preprocess_cloud
from semicp.config import Config
from semicp.data.kitti import voxel_downsample


def build_submap(keyframes, poses: np.ndarray, anchor_idx: int, cfg: Config,
                 voxel: float = 0.3, n_pad: int | None = None) -> Cloud:
    """Fuse keyframe clouds into the anchor keyframe's sensor frame.

    keyframes: iterable of Keyframe; poses: (M,4,4) current keyframe
    poses; anchor_idx: keyframe id whose frame the submap lives in.
    """
    T_anchor_inv = np.linalg.inv(poses[anchor_idx].astype(np.float64))
    pts_all, lab_all = [], []
    for kf in keyframes:
        T = T_anchor_inv @ poses[kf.index].astype(np.float64)
        n = int(kf.cloud.count)
        pts = np.asarray(kf.cloud.xyz).T[:n].astype(np.float64)
        lab = np.asarray(kf.cloud.label)[:n]
        pts_all.append(pts @ T[:3, :3].T + T[:3, 3])
        lab_all.append(lab)
    pts = np.concatenate(pts_all).astype(np.float32)
    lab = np.concatenate(lab_all).astype(np.int32)
    if voxel > 0:
        pts, lab = voxel_downsample(pts, lab, voxel)
    n_pad = n_pad or cfg.cloud.n_pad
    if len(pts) > n_pad:
        sel = np.random.default_rng(0).permutation(len(pts))[:n_pad]
        pts, lab = pts[sel], lab[sel]
    # Full config: canonical cm layout once per rebuild, so every align
    # against this submap skips its own sort (see cli.common.to_device_cloud)
    return preprocess_cloud(make_cloud(pts, lab, n_pad=n_pad), cfg)
