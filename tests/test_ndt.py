"""NDT baseline (register/ndt.py): voxel-Gaussian compression +
registration must recover a known transform (SURVEY.md §2.1 row
"Baseline registrations"; ADVICE r2 high)."""

import jax
import numpy as np
import pytest

from semicp.cloud import make_cloud, preprocess_cloud
from semicp.config import Config
from semicp.data import make_pair, make_scene
from semicp.register.ndt import align_ndt, build_ndt_cloud

K = 6
N_PAD = 4096
DELTA = np.array([0.3, -0.15, 0.05, 0.01, -0.02, 0.03])


@pytest.fixture(scope="module")
def ndt_pair():
    rng = np.random.default_rng(0)
    cfg = Config().override({
        "cloud.n_pad": N_PAD,
        "cloud.num_classes": K,
        "em.max_iters": 25,
    })
    tgt_pts, tgt_lab = make_scene(rng, n_points=4000, extent=15.0,
                                  n_classes=K)
    tgt_lab = tgt_lab - 1
    src_pts, src_lab, T_gt = make_pair(rng, tgt_pts, tgt_lab, DELTA,
                                       noise=0.01, dropout=0.05,
                                       n_classes=K)
    src = make_cloud(src_pts, src_lab, n_pad=N_PAD)
    tgt = make_cloud(tgt_pts, tgt_lab, n_pad=N_PAD)
    return cfg, src, tgt, T_gt


def test_build_ndt_cloud_is_finite_and_compressed(ndt_pair):
    _, _, tgt, _ = ndt_pair
    nd = build_ndt_cloud(tgt, voxel=1.0)
    assert 0 < int(nd.count) < int(tgt.count)
    v = np.asarray(nd.valid)
    assert v.sum() == int(nd.count)
    cov6 = np.asarray(nd.cov6)
    assert np.isfinite(cov6).all()          # single-point voxels included
    # unit-scale normalization: every valid Gaussian has lambda_max ~ 1
    assert cov6[:3, v].max() <= 1.0 + 1e-4
    xyz = np.asarray(nd.xyz)[:, v]
    assert np.abs(xyz).max() < 100.0        # means, not FAR sentinels


@pytest.mark.parametrize("semantic", [False, True])
def test_align_ndt_recovers_transform(ndt_pair, semantic):
    cfg, src, tgt, T_gt = ndt_pair
    res = align_ndt(src, tgt, cfg, voxel=1.0, semantic=semantic)
    T = np.asarray(res.T, np.float64)
    err = T @ np.linalg.inv(T_gt.astype(np.float64))
    assert np.isfinite(T).all()
    # NDT with 1 m voxels is a coarse baseline: ~300 Gaussians from 4000
    # points — cm-level recovery is the expected regime, not the EM-ICP
    # sub-cm one (which test_register pins for the flagship path).
    assert np.linalg.norm(err[:3, 3]) < 0.10
    assert np.linalg.norm(err[:3, :3] - np.eye(3)) < 0.05


def test_align_ndt_d2d(ndt_pair):
    cfg, src, tgt, T_gt = ndt_pair
    srcp = jax.jit(lambda c: preprocess_cloud(c, cfg.cov))(src)
    res = align_ndt(srcp, tgt, cfg, voxel=1.0, d2d=True)
    T = np.asarray(res.T, np.float64)
    err = T @ np.linalg.inv(T_gt.astype(np.float64))
    assert np.linalg.norm(err[:3, 3]) < 0.10
    assert np.linalg.norm(err[:3, :3] - np.eye(3)) < 0.05


def test_eigh3x3_zero_matrix_regression():
    """eigh3x3 used to emit NaN on an exactly-zero matrix (f32 underflow
    in the trig branch) — the NDT single-point voxels hit it."""
    import jax.numpy as jnp

    from semicp.geom.eig3 import eigh3x3

    w, V = eigh3x3(jnp.zeros((4, 3, 3)))
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(V)).all()
