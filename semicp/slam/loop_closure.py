"""Loop-closure proposal and verification.

Reference counterpart: NONE (SURVEY.md §3.2 — no loop closure in the
reference); this is the SLAM extension's detector (BASELINE.json:9,
SURVEY.md §3.3: 'loop-closure candidate gating (coarse, e.g. pose
proximity + semantic descriptor)' on the host, verification on device).

Pipeline per new keyframe:
  1. propose: older keyframes within cfg.lc_max_dist of the current
     (PGO-corrected) pose, at least cfg.lc_min_gap keyframes back,
     whose semantic descriptors differ by < cfg.lc_desc_thresh (L1).
  2. verify: full semantic EM alignment between the two keyframe clouds,
     initialized from the current relative pose estimate; accept on
     convergence with enough effective correspondences.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from semicp.config import Config
from semicp.register import make_align_fn
from semicp.slam.keyframes import Keyframe, KeyframeStore


def propose_loop_closures(store: KeyframeStore, kf: Keyframe, poses: np.ndarray,
                          cfg: Config) -> list[int]:
    """Indices of older keyframes worth verifying against `kf`.

    `poses` are the CURRENT (post-PGO) keyframe poses, (M,4,4)."""
    out = []
    c = cfg.slam
    p_now = poses[kf.index][:3, 3]
    for other in store.keyframes:
        if kf.index - other.index < c.lc_min_gap:
            continue
        d = np.linalg.norm(poses[other.index][:3, 3] - p_now)
        if d > c.lc_max_dist:
            continue
        desc_d = float(np.abs(other.descriptor - kf.descriptor).sum())
        if desc_d > c.lc_desc_thresh:
            continue
        out.append(other.index)
    return out


def verify_loop_closure(store: KeyframeStore, i: int, j: int, poses: np.ndarray,
                        cfg: Config, align_fn=None):
    """EM-align keyframe j's cloud onto keyframe i's cloud.

    Returns (accepted, Z_ij (4,4) with x_i = Z_ij x_j, info weight,
    H (6,6)) — the pose-graph edge measurement convention
    (pose_graph.py). H is the align's full GN Hessian; add_edge
    normalizes it into the edge's 6x6 information shape (first-order:
    the align tangent frame and the edge residual frame differ by the
    adjoint of a near-identity correction, which whitening absorbs).
    """
    # wide gate for the verification alignment: drift may be metres.
    # gate/max_iters are runtime operands of the SAME compiled align
    # program as odometry (em_icp.make_align_fn), so the first accepted
    # candidate costs no second KITTI-scale compile.
    align = align_fn or make_align_fn(cfg)
    T_init = np.linalg.inv(poses[i].astype(np.float64)) @ poses[j].astype(np.float64)
    res = align(store[j].cloud, store[i].cloud,
                np.asarray(T_init, np.float32),
                gate=cfg.slam.lc_max_dist / 2.0, max_iters=40)
    n_corr = float(res.n_corr)
    ok = bool(res.converged) and n_corr > 0.25 * float(store[j].cloud.count)
    Z = np.asarray(res.T, np.float64)
    H = np.asarray(res.H, np.float64)
    return ok, Z, edge_info_from_hessian(H), H


def verify_loop_closures_batched(store: KeyframeStore, cands: list[int],
                                 j: int, poses: np.ndarray, cfg: Config):
    """Verify ALL of keyframe j's loop-closure candidates in ONE
    mesh-sharded batched align (VERDICT r3 Weak #6: the serial loop
    paid one device round trip per candidate).

    Returns [(c, accepted, Z, info, H)] in candidate order. The batch
    runs the same wide-gate/raised-budget runtime operands as
    verify_loop_closure, DP-sharded over however many local devices
    divide the padded batch (a single chip still wins: C verifications
    become one dispatched program instead of C round trips).
    """
    if not cands:
        return []
    import jax
    import jax.numpy as jnp

    from semicp.dist import batched_align, make_mesh
    from semicp.dist.batch import shard_batch

    C = len(cands)
    n_avail = len(jax.devices())
    n_dev = max(d for d in range(1, n_avail + 1) if C % d == 0) \
        if C < n_avail else n_avail
    pad = -C % n_dev
    padded = cands + cands[:1] * pad
    mesh = make_mesh({"pairs": n_dev}, devices=jax.devices()[:n_dev])
    align_b = batched_align(mesh, cfg)

    stack = lambda cs: jax.tree.map(  # noqa: E731
        lambda *xs: jnp.stack(xs), *cs)
    src_b = stack([store[j].cloud] * len(padded))
    tgt_b = stack([store[c].cloud for c in padded])
    T0 = np.stack([
        np.linalg.inv(poses[c].astype(np.float64)) @ poses[j].astype(np.float64)
        for c in padded]).astype(np.float32)
    src_b, tgt_b, T0_b = (shard_batch(mesh, x)
                          for x in (src_b, tgt_b, jnp.asarray(T0)))
    res = align_b(src_b, tgt_b, T0_b,
                  gate=cfg.slam.lc_max_dist / 2.0, max_iters=40)
    conv = np.asarray(res.converged)
    n_corr = np.asarray(res.n_corr)
    Z_all = np.asarray(res.T, np.float64)
    H_all = np.asarray(res.H, np.float64)
    n_min = 0.25 * float(store[j].cloud.count)
    out = []
    for r, c in enumerate(cands):
        ok = bool(conv[r]) and float(n_corr[r]) > n_min
        out.append((c, ok, Z_all[r], edge_info_from_hessian(H_all[r]),
                    H_all[r]))
    return out


def edge_info_from_hessian(H) -> float:
    """Scalar pose-graph edge information from the align's 6x6 GN Hessian.

    The Hessian at convergence IS the constraint's information matrix
    (inverse covariance of the estimated relative pose); its mean
    diagonal is a monotone scalar summary that weights edges by both
    correspondence count and geometric conditioning — a well-constrained
    10k-point align outweighs a marginal 500-point loop closure.
    optimize_pose_graph normalizes edge infos per solve, so only the
    RELATIVE magnitudes matter.
    """
    return float(np.mean(np.diagonal(np.asarray(H, np.float64))))
