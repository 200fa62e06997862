"""Padded SoA semantic point cloud — the TPU-native cloud representation.

Replaces the reference's `SemanticPointCloud<PointT, SemanticT>`
(expected at include/semantic_icp/semantic_point_cloud.h, SURVEY.md §2.1
row "Semantic point cloud"). Design inversion vs the reference: instead
of physically partitioning points into per-label sub-clouds each with its
own kd-tree, labels are *data* — a single fixed-capacity structure-of-
arrays with a validity mask. Per-class behavior is expressed by masking
and composite sort keys (see semicp/corr/), which is what XLA's static-
shape compilation model wants.

All arrays are padded to a static capacity `n_pad`; `valid` masks the
tail. Every downstream reduction must be mask-correct (SURVEY.md §7
"Hard parts" #2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Cloud:
    """Structure-of-arrays semantic cloud (a JAX pytree).

    xyz:   (N_pad, 3) float32 — positions; padded rows hold FAR sentinel
    label: (N_pad,)   int32   — semantic class ids; padded rows -1
    cov:   (N_pad, 3, 3) float32 — GICP-regularized covariances (identity
           until `preprocess_cloud` fills them)
    valid: (N_pad,)   bool
    count: ()         int32   — number of valid points
    """

    xyz: jnp.ndarray
    label: jnp.ndarray
    cov: jnp.ndarray
    valid: jnp.ndarray
    count: jnp.ndarray

    @property
    def n_pad(self) -> int:
        return self.xyz.shape[0]


# Padded points are parked far outside any plausible scan so they can never
# be a nearest neighbor even without explicit masking; masking is still
# applied everywhere, this is defense in depth.
FAR = 1.0e6


def pad_to(arr: np.ndarray, n_pad: int, fill) -> np.ndarray:
    n = arr.shape[0]
    if n > n_pad:
        raise ValueError(f"cloud has {n} points > capacity {n_pad}")
    out = np.full((n_pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[:n] = arr
    return out


def make_cloud(xyz: np.ndarray, label: np.ndarray | None = None, n_pad: int | None = None) -> Cloud:
    """Build a padded device Cloud from host numpy arrays."""
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    if label is None:
        label = np.zeros((n,), np.int32)
    label = np.asarray(label, np.int32)
    if n_pad is None:
        n_pad = max(8, 1 << int(np.ceil(np.log2(max(n, 1)))))
    xyz_p = pad_to(xyz, n_pad, FAR)
    lab_p = pad_to(label, n_pad, -1)
    valid = np.zeros((n_pad,), bool)
    valid[:n] = True
    cov = np.broadcast_to(np.eye(3, dtype=np.float32), (n_pad, 3, 3)).copy()
    return Cloud(
        xyz=jnp.asarray(xyz_p),
        label=jnp.asarray(lab_p),
        cov=jnp.asarray(cov),
        valid=jnp.asarray(valid),
        count=jnp.asarray(n, jnp.int32),
    )
