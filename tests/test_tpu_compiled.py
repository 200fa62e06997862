"""Compiled-kernel lane: the Pallas equivalence asserts on real hardware.

CI pins kernel *semantics* in interpret mode (test_pallas.py,
test_covariance.py); this lane re-runs the same shared assert bodies
with interpret=False so Mosaic-compiled behavior on the actual chip is
pinned by tests, not by one bench scalar (VERDICT r1 item 7).

Run serialized, with the CPU-forcing conftest disabled:

    SEMICP_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -m tpu -q

Deselected by default (pyproject addopts -m 'not tpu') and skipped
outright when the lane env var is unset or no TPU backend is present.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_lane = os.environ.get("SEMICP_TPU_TESTS") == "1"
if _lane:
    import jax

    _have_tpu = jax.devices()[0].platform == "tpu"
else:
    _have_tpu = False

skip_reason = ("set SEMICP_TPU_TESTS=1 (disables the CPU-forcing conftest)"
               if not _lane else "no TPU chip on this host")
if not (_lane and _have_tpu):
    pytest.skip(skip_reason, allow_module_level=True)


from test_pallas import (  # noqa: E402  (tests dir is on sys.path)
    check_dense_matches_xla,
    check_estep_reduce,
    check_fused_estep_matches_composed,
    check_sparse_matches_xla_within_gate,
    scene,  # noqa: F401  fixture re-export
)


def test_fused_estep_compiled(rng):
    check_fused_estep_matches_composed(rng, N=2048, K=5, interpret=False)


def test_dense_nn_compiled(scene):
    check_dense_matches_xla(scene, interpret=False)


def test_sparse_nn_compiled(rng):
    check_sparse_matches_xla_within_gate(rng, N=2048, K=5, gate=2.0,
                                         interpret=False)


def test_sparse_nn_compiled_tight_gate(rng):
    check_sparse_matches_xla_within_gate(rng, N=2048, K=3, gate=0.5,
                                         interpret=False)


def test_estep_reduce_compiled(rng):
    check_estep_reduce(rng, interpret=False)


def test_cov_moments_compiled(rng):
    import jax.numpy as jnp

    from semicp.cloud.pallas_cov import (
        neighborhood_moments_pallas, neighborhood_moments_xla,
    )

    N = 2048
    xyz = rng.normal(size=(3, N)).astype(np.float32) * 3
    lab = rng.integers(0, 4, size=N).astype(np.int32)
    val = rng.uniform(size=N) > 0.1
    r = 1.0
    m_x = np.asarray(neighborhood_moments_xla(
        jnp.asarray(xyz), jnp.asarray(lab), jnp.asarray(val), r))
    m_p = np.asarray(neighborhood_moments_pallas(
        jnp.asarray(xyz), jnp.asarray(lab), jnp.asarray(val), r,
        qb=256, tb=256, interpret=False))
    np.testing.assert_allclose(m_p, m_x, rtol=1e-4, atol=1e-3)


def test_cov_moments_sparse_compiled(rng):
    import jax.numpy as jnp

    from semicp.cloud import make_cloud
    from semicp.cloud.pallas_cov import (
        neighborhood_moments_sparse, neighborhood_moments_xla,
    )
    from semicp.corr.layout import sort_cloud_cm
    from semicp.data import make_scene

    N, K = 2048, 5
    xyz, lab = make_scene(rng, n_points=1900, extent=10.0, n_classes=K)
    c = sort_cloud_cm(make_cloud(xyz, lab - 1, n_pad=N), K, cell=1.0)
    label = jnp.maximum(c.label, 0)
    r = 0.9
    m_x = np.asarray(neighborhood_moments_xla(c.xyz, label, c.valid, r))
    m_s = np.asarray(neighborhood_moments_sparse(
        c.xyz, label, c.valid, r, num_classes=K, qb=256, tb=256,
        interpret=False))
    np.testing.assert_allclose(m_s[0], m_x[0], atol=0.5)

    def to_cov(m):
        cnt = np.maximum(m[0], 1.0)
        mx, my, mz = m[1] / cnt, m[2] / cnt, m[3] / cnt
        return np.stack([
            m[4] / cnt - mx * mx, m[5] / cnt - my * my, m[6] / cnt - mz * mz,
            m[7] / cnt - mx * my, m[8] / cnt - mx * mz, m[9] / cnt - my * mz,
        ])

    valid = np.asarray(c.valid) & (m_x[0] >= 3)
    np.testing.assert_allclose(to_cov(m_s)[:, valid], to_cov(m_x)[:, valid],
                               rtol=1e-3, atol=1e-3)


def test_ring_sparse_compiled(rng):
    """The map-scale ring path (block-sparse kernel per ring step) on the
    real chip must match the brute-force reference within the gate."""
    import jax.numpy as jnp

    from semicp.corr.bruteforce import class_nn
    from semicp.dist import make_mesh
    from semicp.dist.ring_corr import make_ring_nn

    K, gate, N = 6, 2.0, 32768
    xyz = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32) * 20)
    lab = jnp.asarray(rng.integers(0, K, size=N).astype(np.int32))
    val = jnp.asarray(rng.uniform(size=N) > 0.1)
    cov6 = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
    q = xyz[:, :4096]

    mesh = make_mesh({"blocks": 1})
    ring = make_ring_nn(mesh, num_classes=K, engine="sparse", gate=gate)
    d2, _ = ring(q, xyz, lab, val, cov6)
    _, d2_ref = class_nn(xyz, jnp.maximum(lab, 0), val, q, K)
    d2, d2_ref = np.asarray(d2), np.asarray(d2_ref)
    inside = d2_ref <= gate * gate * (1 - 1e-5)
    assert inside.any()
    # expanded-form cancellation at this extent is ~1e-2 absolute
    np.testing.assert_allclose(d2[inside], d2_ref[inside],
                               rtol=1e-4, atol=2e-2)


@pytest.mark.parametrize("engine", ["dense", "sparse"])
def test_full_align_compiled(rng, engine):
    """The whole jitted EM program (preprocess + align) on the chip
    recovers a known transform through both Pallas engines."""
    import jax

    from semicp.cloud import make_cloud, preprocess_cloud
    from semicp.config import Config
    from semicp.data import make_pair, make_scene
    from semicp.register import make_align_fn

    K = 8
    cfg = Config().override({
        "cloud.n_pad": 8192,
        "cloud.num_classes": K,
        "corr.engine": engine,
        "em.max_iters": 20,
    })
    tgt_pts, tgt_lab = make_scene(rng, n_points=8000, extent=20.0, n_classes=K)
    tgt_lab = tgt_lab - 1
    delta = np.array([0.3, -0.15, 0.05, 0.01, -0.02, 0.03])
    src_pts, src_lab, T_gt = make_pair(rng, tgt_pts, tgt_lab, delta,
                                       noise=0.01, dropout=0.05, n_classes=K)
    pre = jax.jit(lambda c: preprocess_cloud(c, cfg.cov))
    src = pre(make_cloud(src_pts, src_lab, n_pad=cfg.cloud.n_pad))
    tgt = pre(make_cloud(tgt_pts, tgt_lab, n_pad=cfg.cloud.n_pad))
    res = make_align_fn(cfg)(src, tgt)
    T = np.asarray(res.T, np.float64)
    err = T @ np.linalg.inv(T_gt.astype(np.float64))
    assert np.linalg.norm(err[:3, 3]) < 0.02
    assert np.linalg.norm(err[:3, :3] - np.eye(3)) < 0.01
