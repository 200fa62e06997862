"""Distributed scan-to-map align + global map BA on the 8-device CPU
mesh: the config-4 assembly (dist/align_dist.py, slam/map_ba.py) must
match its single-device references (SURVEY.md §4.6; ADVICE r2 low)."""

import jax
import jax.numpy as jnp
import numpy as np

from semicp.cloud import make_cloud, preprocess_cloud
from semicp.config import Config
from semicp.data import make_pair, make_scene
from semicp.dist import make_mesh
from semicp.dist.align_dist import make_dist_align_fn
from semicp.geom.se3 import se3_exp
from semicp.register import make_align_fn
from semicp.slam.keyframes import KeyframeStore
from semicp.slam.map_ba import refine_keyframes


def test_dist_align_matches_single(rng):
    """One alignment spread over the mesh (points + map blocks sharded)
    equals the single-device EM align on the same pair."""
    D, K, n_pad = 8, 5, 2048
    cfg = Config().override({
        "cloud.n_pad": n_pad,
        "cloud.num_classes": K,
        "em.max_iters": 12,
    })
    tgt_pts, tgt_lab = make_scene(rng, n_points=1900, extent=15.0,
                                  n_classes=K)
    tgt_lab = tgt_lab - 1
    delta = np.array([0.25, -0.1, 0.04, 0.008, -0.015, 0.02])
    src_pts, src_lab, T_gt = make_pair(rng, tgt_pts, tgt_lab, delta,
                                       noise=0.01, dropout=0.05,
                                       n_classes=K)
    pre = jax.jit(lambda c: preprocess_cloud(c, cfg.cov))
    src = pre(make_cloud(src_pts, src_lab, n_pad=n_pad))
    tgt = pre(make_cloud(tgt_pts, tgt_lab, n_pad=n_pad))

    res_s = make_align_fn(cfg)(src, tgt)
    mesh = make_mesh({"blocks": D})
    res_d = make_dist_align_fn(mesh, cfg)(src, tgt)

    T_s = np.asarray(res_s.T, np.float64)
    T_d = np.asarray(res_d.T, np.float64)
    # both recover the ground-truth transform...
    for T in (T_s, T_d):
        err = T @ np.linalg.inv(T_gt.astype(np.float64))
        assert np.linalg.norm(err[:3, 3]) < 0.02
        assert np.linalg.norm(err[:3, :3] - np.eye(3)) < 0.01
    # ...and agree with each other far tighter than with the truth
    np.testing.assert_allclose(T_d, T_s, rtol=0, atol=1e-4)
    assert int(res_d.iterations) == int(res_s.iterations)


def _make_store(rng, M=4, n_points=1500, K=5, n_pad=2048,
                pose_noise=0.05):
    """M keyframes rendered from one world scene along a known
    trajectory; returned poses are noise-perturbed (BA's job to fix)."""
    scene, labels = make_scene(rng, n_points=6000, extent=20.0,
                               n_classes=K)
    labels = labels - 1
    gt = [np.eye(4)]
    for _ in range(1, M):
        d = np.array([1.5, 0.2, 0.0, 0.0, 0.0, 0.05], np.float32)
        gt.append(gt[-1] @ np.asarray(se3_exp(jnp.asarray(d)), np.float64))
    gt = np.stack(gt)

    store = KeyframeStore()
    for i in range(M):
        Ti = np.linalg.inv(gt[i])
        local = scene @ Ti[:3, :3].T + Ti[:3, 3]
        sel = np.argsort(np.linalg.norm(local, axis=1))[:n_points]
        cloud = make_cloud(local[sel].astype(np.float32), labels[sel],
                           n_pad=n_pad)
        store.add(i, gt[i].astype(np.float32), cloud,
                  np.zeros(K, np.float64))

    noisy = gt.copy()
    for i in range(1, M):
        d = rng.normal(size=6) * pose_noise * np.array(
            [1, 1, 1, 0.2, 0.2, 0.2])
        noisy[i] = noisy[i] @ np.asarray(
            se3_exp(jnp.asarray(d.astype(np.float32))), np.float64)
    return store, gt, noisy.astype(np.float32)


def test_refine_keyframes_mesh_matches_single(rng):
    """refine_keyframes over the mesh (sharded landmarks + Schur BA)
    equals the off-mesh solve and moves poses toward the truth."""
    K = 5
    cfg = Config().override({
        "cloud.num_classes": K,
        "slam.ba_iters": 6,
        "slam.ba_gate": 0.6,
    })
    store, gt, noisy = _make_store(rng, K=K)

    ref_s, stats_s = refine_keyframes(store, noisy.copy(), cfg, mesh=None)
    assert stats_s["observations"] >= 6 * len(store)

    mesh = make_mesh({"blocks": 8})
    ref_d, stats_d = refine_keyframes(store, noisy.copy(), cfg, mesh=mesh)
    assert stats_d["observations"] == stats_s["observations"]

    np.testing.assert_allclose(ref_d[:, :3, 3], ref_s[:, :3, 3],
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(ref_d[:, :3, :3], ref_s[:, :3, :3],
                               rtol=0, atol=2e-3)

    before = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1).max()
    after = np.linalg.norm(
        ref_s[:, :3, 3].astype(np.float64) - gt[:, :3, 3], axis=1).max()
    assert after < before
