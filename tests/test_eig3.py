"""Closed-form 3x3 eigensolver / Cholesky vs numpy.linalg (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from semicp.geom import cho_solve3x3, cholesky3x3, eigh3x3
from semicp.geom.eig3 import eigvals3x3, gicp_regularize, smallest_eigvec, tri_solve3x3


def random_spd(rng, n, cond_spread=1.0):
    A = rng.normal(size=(n, 3, 3))
    S = A @ np.swapaxes(A, -1, -2) + cond_spread * np.eye(3)
    return S.astype(np.float32)


def test_eigvals_match_numpy(rng):
    S = random_spd(rng, 512)
    w = np.asarray(eigvals3x3(jnp.asarray(S)))
    ref = np.sort(np.linalg.eigvalsh(S.astype(np.float64)), -1)[:, ::-1]
    np.testing.assert_allclose(w, ref, rtol=2e-4, atol=2e-4)


def test_eigvals_diagonal():
    S = np.diag([3.0, 1.0, 2.0]).astype(np.float32)[None]
    w = np.asarray(eigvals3x3(jnp.asarray(S)))[0]
    np.testing.assert_allclose(w, [3.0, 2.0, 1.0], atol=1e-6)


def test_eigh_reconstructs(rng):
    S = random_spd(rng, 256)
    w, V = eigh3x3(jnp.asarray(S))
    w, V = np.asarray(w), np.asarray(V)
    recon = np.einsum("nik,nk,njk->nij", V, w, V)
    np.testing.assert_allclose(recon, S, rtol=5e-3, atol=5e-3)
    # orthonormal
    VtV = np.einsum("nki,nkj->nij", V, V)
    np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-4)


def test_smallest_eigvec_planar(rng):
    """Planar neighborhoods: normal must match the true plane normal."""
    n = 128
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    covs = []
    for k in range(n):
        # basis with normals[k] as third axis
        a = np.eye(3)[np.argmin(np.abs(normals[k]))]
        u = np.cross(normals[k], a)
        u /= np.linalg.norm(u)
        v = np.cross(normals[k], u)
        R = np.stack([u, v, normals[k]], -1)
        covs.append(R @ np.diag([1.0, 0.6, 1e-4]) @ R.T)
    covs = np.asarray(covs, np.float32)
    est = np.asarray(smallest_eigvec(jnp.asarray(covs)))
    dots = np.abs(np.sum(est * normals, -1))
    assert np.all(dots > 0.999), dots.min()


def test_gicp_regularize_spectrum(rng):
    S = random_spd(rng, 64)
    eps = 1e-3
    C = np.asarray(gicp_regularize(jnp.asarray(S), eps))
    w = np.sort(np.linalg.eigvalsh(C.astype(np.float64)), -1)
    np.testing.assert_allclose(w[:, 0], eps, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-4, atol=1e-5)


def test_cholesky_and_solve(rng):
    S = random_spd(rng, 256)
    L = np.asarray(cholesky3x3(jnp.asarray(S)))
    np.testing.assert_allclose(L @ np.swapaxes(L, -1, -2), S, rtol=2e-4, atol=2e-4)
    # solve
    b = rng.normal(size=(256, 3)).astype(np.float32)
    x = np.asarray(cho_solve3x3(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("nij,nj->ni", S, x), b, rtol=2e-3, atol=2e-3)
    # forward substitution alone
    y = np.asarray(tri_solve3x3(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("nij,nj->ni", L, y), b, rtol=2e-3, atol=2e-3)
