"""Planar sym3 algebra vs dense numpy reference (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np

from semicp.geom import sym3


def random_spd(rng, n):
    A = rng.normal(size=(n, 3, 3))
    return (A @ np.swapaxes(A, -1, -2) + np.eye(3)).astype(np.float32)


def planes(S):
    return sym3.from_matrix(jnp.asarray(S))


def test_roundtrip(rng):
    S = random_spd(rng, 64)
    got = np.asarray(sym3.to_matrix(planes(S)))
    np.testing.assert_allclose(got, S, atol=1e-7)


def test_matvec(rng):
    S = random_spd(rng, 64)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.stack(sym3.matvec(planes(S), (v[:, 0], v[:, 1], v[:, 2])), -1)
    np.testing.assert_allclose(np.asarray(got), np.einsum("nij,nj->ni", S, v), rtol=1e-5, atol=1e-5)


def test_rotate(rng):
    S = random_spd(rng, 64)
    from semicp.geom import so3_exp

    R = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3).astype(np.float32))))
    got = np.asarray(sym3.to_matrix(sym3.rotate(jnp.asarray(R), planes(S))))
    ref = np.einsum("ab,nbc,dc->nad", R, S, R)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_det_inv(rng):
    S = random_spd(rng, 128)
    d = np.asarray(sym3.det(planes(S)))
    np.testing.assert_allclose(d, np.linalg.det(S.astype(np.float64)), rtol=1e-3)
    Sinv = np.asarray(sym3.to_matrix(sym3.inv(planes(S))))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", Sinv, S),
        np.broadcast_to(np.eye(3), S.shape), atol=2e-3,
    )


def test_chol_maha_logdet(rng):
    S = random_spd(rng, 128)
    v = rng.normal(size=(128, 3)).astype(np.float32)
    L = sym3.chol(planes(S))
    maha = np.asarray(sym3.chol_maha(L, (v[:, 0], v[:, 1], v[:, 2])))
    ref = np.einsum("ni,nij,nj->n", v, np.linalg.inv(S.astype(np.float64)), v)
    np.testing.assert_allclose(maha, ref, rtol=2e-3, atol=1e-4)
    ld = np.asarray(sym3.chol_logdet(L))
    np.testing.assert_allclose(ld, np.linalg.slogdet(S.astype(np.float64))[1], rtol=1e-4, atol=1e-4)


def test_eigvals_and_smallest_vec(rng):
    S = random_spd(rng, 256)
    w = np.stack(sym3.eigvals(planes(S)), -1)
    ref = np.sort(np.linalg.eigvalsh(S.astype(np.float64)), -1)[:, ::-1]
    np.testing.assert_allclose(np.asarray(w), ref, rtol=3e-4, atol=3e-4)
    n = np.stack(sym3.smallest_eigvec(planes(S)), -1)
    n = np.asarray(n, np.float64)
    # A n ~= lam_min n
    An = np.einsum("nij,nj->ni", S.astype(np.float64), n)
    lam = ref[:, 2]
    np.testing.assert_allclose(An, lam[:, None] * n, atol=2e-2)


def test_regularize_planar(rng):
    S = random_spd(rng, 64)
    C = np.asarray(sym3.to_matrix(sym3.regularize_gicp(planes(S), 1e-3)))
    w = np.sort(np.linalg.eigvalsh(C.astype(np.float64)), -1)
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-4)


def test_normal_equations_planar_vs_dense(rng):
    """Planar H/g/cost == dense einsum reference with explicit J."""
    from semicp.register.residuals import normal_equations_planar

    m = 200
    S = random_spd(rng, m)
    w = rng.uniform(size=m).astype(np.float32)
    p = rng.normal(size=(m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)

    H, g, cost = normal_equations_planar(
        jnp.asarray(w), planes(S),
        (p[:, 0], p[:, 1], p[:, 2]), (d[:, 0], d[:, 1], d[:, 2]),
    )

    # dense reference
    def hat(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    J = np.zeros((m, 3, 6))
    J[:, :, :3] = -np.eye(3)
    for i in range(m):
        J[i, :, 3:] = hat(p[i])
    H_ref = np.einsum("n,nai,nab,nbj->ij", w, J, S, J)
    g_ref = np.einsum("n,nai,nab,nb->i", w, J, S, d)
    cost_ref = np.einsum("n,na,nab,nb->", w, d, S, d)
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(cost), cost_ref, rtol=2e-3)
