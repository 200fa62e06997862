"""Efficient CPU baseline: per-class kd-trees + vectorized numpy EM.

This mirrors the reference's architecture faithfully — per-semantic-class
kd-trees (scipy cKDTree standing in for FLANN, SURVEY.md §2.1 row
"Per-class kd-tree NN search") with the §2.2 EM/GN math vectorized in
numpy — and is deliberately *strong*: it is the denominator of the
">=10x scans/s per chip over the CPU baseline" target (BASELINE.json:5),
so sandbagging it would fake the speedup. The slow, readable oracle in
numpy_icp.py remains the correctness ground truth; this one matches it
on small problems and scales to full-size scans.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from semicp.oracle.numpy_icp import OracleParams, _se3_exp_np, _se3_log_np


def estimate_covariances_fast(xyz, labels, p: OracleParams):
    """Vectorized per-class kNN covariances with the (1,1,eps) clamp."""
    n = len(xyz)
    covs = np.tile(np.eye(3), (n, 1, 1))
    for cls in np.unique(labels):
        mask = labels == cls
        pool = xyz[mask]
        if len(pool) < 3:
            continue
        tree = cKDTree(pool)
        k = min(p.cov_k, len(pool))
        _, nn = tree.query(pool, k=k)
        nbh = pool[nn]                                  # (m, k, 3)
        c = nbh - nbh.mean(1, keepdims=True)
        C = np.einsum("mka,mkb->mab", c, c) / k
        w, V = np.linalg.eigh(C)
        lam = np.broadcast_to(np.array([p.cov_eps, 1.0, 1.0]), w.shape)
        covs[mask] = np.einsum("mab,mb,mcb->mac", V, lam, V)
    return covs


def semantic_icp_fast(
    src_xyz, src_lab, tgt_xyz, tgt_lab, p: OracleParams | None = None,
    T_init=None, src_cov=None, tgt_cov=None,
):
    """Same EM fixed point as numpy_icp.semantic_icp_np, production CPU speed."""
    p = p or OracleParams()
    src_xyz = np.asarray(src_xyz, np.float64)
    tgt_xyz = np.asarray(tgt_xyz, np.float64)
    if src_cov is None:
        src_cov = estimate_covariances_fast(src_xyz, src_lab, p)
    if tgt_cov is None:
        tgt_cov = estimate_covariances_fast(tgt_xyz, tgt_lab, p)
    classes = np.unique(tgt_lab)
    K = len(classes)
    trees = []
    pools = []
    for cls in classes:
        mask = tgt_lab == cls
        pools.append(np.nonzero(mask)[0])
        trees.append(cKDTree(tgt_xyz[mask]) if mask.any() else None)

    T = np.eye(4) if T_init is None else np.asarray(T_init, np.float64)
    n = len(src_xyz)
    iters = 0
    for it in range(p.max_iters):
        iters = it + 1
        R = T[:3, :3]
        moved = src_xyz @ R.T + T[:3, 3]
        RCzRt = np.einsum("ab,nbc,dc->nad", R, src_cov, R)
        idx = np.full((n, K), 0, np.int64)
        lik = np.zeros((n, K))
        sig_inv = np.zeros((n, K, 3, 3))
        xs = np.zeros((n, K, 3))
        for kk, cls in enumerate(classes):
            tree = trees[kk]
            if tree is None:
                continue
            dist, j = tree.query(moved, k=1, distance_upper_bound=p.max_dist)
            found = np.isfinite(dist)
            j = np.where(found, j, 0)
            gi = pools[kk][j]
            idx[:, kk] = gi
            x = tgt_xyz[gi]
            xs[:, kk] = x
            d = x - moved
            sigma = tgt_cov[gi] + RCzRt
            s_inv = np.linalg.inv(sigma)
            sig_inv[:, kk] = s_inv
            maha = np.einsum("ni,nij,nj->n", d, s_inv, d)
            det = np.linalg.det(sigma)
            geo = np.exp(-0.5 * maha) / np.sqrt((2 * np.pi) ** 3 * np.maximum(det, 1e-30))
            sem = (1.0 if p.uniform_semantics
                   else np.where(src_lab == cls, p.alpha, (1 - p.alpha) / max(K - 1, 1)))
            lik[:, kk] = sem * geo * found
        tot = lik.sum(1, keepdims=True)
        w = np.where(tot > 0, lik / np.maximum(tot, 1e-300), 0.0)

        # M-step: vectorized GN/LM, correspondences frozen
        T_new = T.copy()
        lam = p.lm_lambda
        prev_cost = None
        ww = w.reshape(-1)
        act = ww > 0
        z = np.repeat(src_xyz, K, 0)[act]
        x = xs.reshape(-1, 3)[act]
        S = sig_inv.reshape(-1, 3, 3)[act]
        ww = ww[act]
        if len(z) == 0:
            break
        for _ in range(p.gn_iters):
            moved_i = z @ T_new[:3, :3].T + T_new[:3, 3]
            r = x - moved_i
            Sd = np.einsum("nab,nb->na", S, r)
            cost = float(np.einsum("n,na,na->", ww, r, Sd))
            P = np.zeros((len(z), 3, 3))
            P[:, 0, 1] = -moved_i[:, 2]; P[:, 0, 2] = moved_i[:, 1]
            P[:, 1, 0] = moved_i[:, 2]; P[:, 1, 2] = -moved_i[:, 0]
            P[:, 2, 0] = -moved_i[:, 1]; P[:, 2, 1] = moved_i[:, 0]
            wS = ww[:, None, None] * S
            SP = np.einsum("nab,nbc->nac", wS, P)
            H_tt = wS.sum(0)
            H_tr = -SP.sum(0)
            H_rr = np.einsum("nba,nbc->ac", P, SP)
            g_t = -(ww[:, None] * Sd).sum(0)
            g_r = np.einsum("nba,nb->a", P, ww[:, None] * Sd)
            H = np.block([[H_tt, H_tr], [H_tr.T, H_rr]])
            g = np.concatenate([g_t, g_r])
            delta = np.linalg.solve(H + lam * np.diag(np.diag(H)), -g)
            T_new = _se3_exp_np(delta) @ T_new
            if np.linalg.norm(delta) < 1e-9:
                break
            if prev_cost is not None and cost > prev_cost:
                lam *= 10.0
            else:
                lam = max(lam * 0.3, p.lm_lambda)
            prev_cost = cost
        step = np.linalg.norm(_se3_log_np(T_new @ np.linalg.inv(T)))
        T = T_new
        if step < p.trans_eps:
            break
    return T, {"iterations": iters, "converged": iters < p.max_iters}
