"""GICP plane-to-plane per-point covariance estimation — batched, one pass.

Reference counterpart: covariance construction inside SemanticPointCloud
(k~20 FLANN kNN per point + Eigen::SelfAdjointEigenSolver + eigenvalue
clamp to (1,1,eps); SURVEY.md §2.1 row "Per-point covariance estimation",
§2.2 step 1, §3.4). The reference computes each point's neighborhood
within its own semantic class's sub-cloud; `class_aware=True` reproduces
that via the composite-key hash grid.

TPU shape: voxel-hash kNN gather (no trees), empirical covariance as a
fused masked reduction, and the clamp via the rank-1 identity
C_reg = I - (1-eps) n n^T (see semicp/geom/eig3.py) — pure VPU work,
vmapped over all points at once, amortized across EM iterations.
"""

from __future__ import annotations

import jax.numpy as jnp

from semicp.cloud.cloud import Cloud
from semicp.config import CovConfig
from semicp.corr.hashgrid import build_grid, query_knn
from semicp.geom.eig3 import gicp_regularize


def estimate_covariances(
    cloud: Cloud, cfg: CovConfig, class_aware: bool = True
) -> jnp.ndarray:
    """Return (N_pad, 3, 3) regularized covariances for every valid point.

    Points with < 3 valid neighbors get an isotropic (identity-scaled)
    covariance — the branchless analogue of the reference's skip.
    """
    grid = build_grid(cloud, cell=cfg.cell, class_aware=class_aware)
    q_class = jnp.where(class_aware, jnp.maximum(cloud.label, 0), 0)
    idx, d2, valid = query_knn(
        grid, cloud.xyz, q_class, k=cfg.k, bucket_cap=cfg.max_candidates
    )
    # Gather neighbor coordinates (indices are into the sorted grid arrays)
    nbr = jnp.take(grid.xyz, idx, axis=0)            # (N, k, 3)
    w = valid.astype(jnp.float32)                    # (N, k)
    cnt = jnp.sum(w, -1, keepdims=True)              # (N, 1)
    safe_cnt = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(nbr * w[..., None], -2) / safe_cnt        # (N, 3)
    ctr = (nbr - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", ctr, ctr) / safe_cnt[..., None]
    reg = gicp_regularize(cov, cfg.eps)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape)
    enough = (cnt[..., None] >= 3.0) & cloud.valid[:, None, None]
    return jnp.where(enough, reg, eye)


def preprocess_cloud(cloud: Cloud, cfg: CovConfig, class_aware: bool = True) -> Cloud:
    """Fill `cloud.cov` with GICP-regularized covariances (jit-able)."""
    return cloud.replace(cov=estimate_covariances(cloud, cfg, class_aware))
