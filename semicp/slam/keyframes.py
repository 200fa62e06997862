"""Keyframe selection, storage, and semantic descriptors.

Reference counterpart: NONE — the reference is strictly frame-to-frame
(SURVEY.md §3.2); keyframing is part of the SLAM extension
(BASELINE.json:9). The host owns this control plane (SURVEY.md §3.3):
keyframe decisions and store bookkeeping are cheap Python; everything
per-point stays on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from semicp.cloud.cloud import Cloud
from semicp.config import SLAMConfig
from semicp.geom.se3 import se3_inverse, se3_log


def keyframe_due(T_last_kf: np.ndarray, T_now: np.ndarray, cfg: SLAMConfig) -> bool:
    """Spawn a keyframe after enough motion since the last one."""
    import jax.numpy as jnp

    rel = np.asarray(se3_log(jnp.asarray(
        np.linalg.inv(T_last_kf.astype(np.float64)) @ T_now.astype(np.float64)
    ).astype(np.float32)))
    return (np.linalg.norm(rel[:3]) > cfg.keyframe_trans
            or np.linalg.norm(rel[3:]) > cfg.keyframe_rot)


def semantic_descriptor(labels: np.ndarray, num_classes: int,
                        xyz: np.ndarray | None = None) -> np.ndarray:
    """Loop-closure gating descriptor: normalized class histogram,
    optionally augmented with a coarse height histogram (4 bins).

    Cheap, rotation-invariant, and discriminative enough to gate the
    expensive EM verification (SURVEY.md §3.3 'coarse gating')."""
    h = np.bincount(np.clip(labels, 0, num_classes - 1), minlength=num_classes
                    ).astype(np.float64)
    h /= max(h.sum(), 1.0)
    if xyz is not None:
        z = xyz[:, 2]
        zh, _ = np.histogram(z, bins=4, range=(-3.0, 9.0))
        zh = zh.astype(np.float64) / max(zh.sum(), 1.0)
        h = np.concatenate([h, 0.5 * zh])
    return h


@dataclass
class Keyframe:
    index: int               # keyframe id (pose-graph node id)
    frame: int               # source frame number
    pose: np.ndarray         # (4,4) world pose at creation (pre-PGO)
    cloud: Cloud             # preprocessed device cloud (sensor frame)
    descriptor: np.ndarray


@dataclass
class KeyframeStore:
    keyframes: list[Keyframe] = field(default_factory=list)

    def add(self, frame: int, pose: np.ndarray, cloud: Cloud, desc: np.ndarray) -> Keyframe:
        kf = Keyframe(len(self.keyframes), frame, pose.copy(), cloud, desc)
        self.keyframes.append(kf)
        return kf

    def __len__(self):
        return len(self.keyframes)

    def __getitem__(self, i):
        return self.keyframes[i]
