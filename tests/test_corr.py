"""Voxel-hash NN kernel equivalence vs brute force (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np

from semicp.cloud import make_cloud
from semicp.corr import build_grid, query_knn, query_nn


def brute_nn_per_class(pts, labels, q, qlab, max_dist):
    """O(N^2) per-class nearest neighbor oracle."""
    out_d2 = np.full(len(q), np.inf)
    out_found = np.zeros(len(q), bool)
    for i in range(len(q)):
        mask = labels == qlab[i]
        if not mask.any():
            continue
        d2 = np.sum((pts[mask] - q[i]) ** 2, -1)
        m = d2.min()
        if m <= max_dist**2:
            out_d2[i] = m
            out_found[i] = True
    return out_d2, out_found


def test_nn_exact_within_contract(rng):
    pts = (rng.normal(size=(1500, 3)) * np.array([15, 15, 2])).astype(np.float32)
    labels = rng.integers(0, 6, size=1500).astype(np.int32)
    tgt = make_cloud(pts, labels, n_pad=2048)
    grid = build_grid(tgt, cell=2.0)
    q = (pts[:400] + rng.normal(size=(400, 3)) * 0.4).astype(np.float32)
    qlab = labels[:400]
    idx, d2, found = query_nn(grid, jnp.asarray(q.T), jnp.asarray(qlab), max_dist=2.0)
    bf_d2, bf_found = brute_nn_per_class(pts, labels, q, qlab, 2.0)
    np.testing.assert_array_equal(np.asarray(found), bf_found)
    np.testing.assert_allclose(np.asarray(d2)[bf_found], bf_d2[bf_found], rtol=1e-5)
    # returned indices point at same-label points
    gl = np.asarray(grid.label)
    assert (gl[np.asarray(idx)[bf_found]] == qlab[bf_found]).all()


def test_nn_class_agnostic(rng):
    pts = rng.normal(size=(800, 3)).astype(np.float32) * 5
    tgt = make_cloud(pts, None, n_pad=1024)
    grid = build_grid(tgt, cell=1.5, class_aware=False)
    q = (pts[:200] + rng.normal(size=(200, 3)) * 0.2).astype(np.float32)
    idx, d2, found = query_nn(grid, jnp.asarray(q.T), jnp.zeros(200, jnp.int32), max_dist=1.5)
    for i in range(200):
        bf = np.sum((pts - q[i]) ** 2, -1).min()
        if bf <= 1.5**2:
            assert found[i] and abs(float(d2[i]) - bf) < 1e-4
        else:
            assert not found[i]


def test_knn_matches_brute(rng):
    pts = rng.normal(size=(600, 3)).astype(np.float32) * 3
    labels = np.zeros(600, np.int32)
    tgt = make_cloud(pts, labels, n_pad=1024)
    grid = build_grid(tgt, cell=2.0)
    q = pts[:50]
    k = 10
    idx, d2, valid = query_knn(grid, jnp.asarray(q.T), jnp.zeros(50, jnp.int32), k=k, bucket_cap=64)
    d2 = np.asarray(d2)
    for i in range(50):
        bf = np.sort(np.sum((pts - q[i]) ** 2, -1))[:k]
        # contract: exact as long as all k lie within one cell radius
        if bf[-1] <= 2.0**2:
            got = np.sort(d2[i])
            np.testing.assert_allclose(got, bf, rtol=1e-4, atol=1e-5)


def test_padding_never_matches(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    tgt = make_cloud(pts, None, n_pad=64)
    grid = build_grid(tgt, cell=2.0, class_aware=False)
    q = rng.normal(size=(30, 3)).astype(np.float32) * 100  # far from data
    idx, d2, found = query_nn(grid, jnp.asarray(q.T), jnp.zeros(30, jnp.int32), max_dist=2.0)
    assert not np.asarray(found).any()


def test_empty_target(rng):
    tgt = make_cloud(np.zeros((0, 3), np.float32), np.zeros(0, np.int32), n_pad=32)
    grid = build_grid(tgt, cell=2.0)
    q = rng.normal(size=(5, 3)).astype(np.float32)
    _, _, found = query_nn(grid, jnp.asarray(q.T), jnp.zeros(5, jnp.int32), max_dist=2.0)
    assert not np.asarray(found).any()
