"""SE(3) math unit tests (SURVEY.md §4.1): exp/log round trips, group laws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semicp.geom import (
    se3_adjoint,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_identity,
    se3_inverse,
    se3_log,
    so3_exp,
    so3_log,
    quat_to_rotmat,
    rotmat_to_quat,
)


def random_tangents(rng, n, scale_t=1.0, scale_r=1.0):
    v = rng.normal(size=(n, 3)) * scale_t
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    ang = rng.uniform(0.0, scale_r, size=(n, 1))
    return np.concatenate([v, w * ang], -1).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    w = random_tangents(rng, 256, 0.0, 3.0)[:, 3:]
    R = so3_exp(jnp.asarray(w))
    w2 = so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=2e-5)


def test_so3_exp_small_angles(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32) * 1e-6
    R = np.asarray(so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    w2 = np.asarray(so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w2, w, atol=1e-6)


def test_so3_log_near_pi(rng):
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = (axis * (np.pi - 1e-3)).astype(np.float32)
    R = so3_exp(jnp.asarray(w))
    w2 = np.asarray(so3_log(R))
    np.testing.assert_allclose(w2, w, atol=5e-3)


def test_quat_roundtrip(rng):
    w = random_tangents(rng, 256, 0.0, 3.1)[:, 3:]
    R = so3_exp(jnp.asarray(w))
    q = rotmat_to_quat(R)
    R2 = quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    d = random_tangents(rng, 256, 5.0, 3.0)
    T = se3_exp(jnp.asarray(d))
    d2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(d2), d, atol=1e-4, rtol=1e-4)


def test_se3_exp_zero():
    T = se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)
    np.testing.assert_allclose(np.asarray(se3_log(se3_identity())), np.zeros(6), atol=1e-7)


def test_se3_group_laws(rng):
    d = random_tangents(rng, 8, 2.0, 2.0)
    T = se3_exp(jnp.asarray(d))
    Tinv = se3_inverse(T)
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(se3_compose(T, Tinv)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(se3_compose(Tinv, T)), eye, atol=1e-5)


def test_se3_apply_matches_homogeneous(rng):
    d = random_tangents(rng, 4, 2.0, 2.0)
    T = np.asarray(se3_exp(jnp.asarray(d)))
    pts = rng.normal(size=(4, 50, 3)).astype(np.float32)
    out = np.asarray(se3_apply(jnp.asarray(T), jnp.asarray(pts)))
    for b in range(4):
        hom = np.concatenate([pts[b], np.ones((50, 1), np.float32)], -1)
        ref = (T[b] @ hom.T).T[:, :3]
        np.testing.assert_allclose(out[b], ref, atol=1e-5)


def test_adjoint_identity(rng):
    """Ad(T) delta == log(T exp(delta) T^-1) for small delta."""
    d = random_tangents(rng, 16, 1.0, 1.0)
    T = se3_exp(jnp.asarray(d))
    small = random_tangents(rng, 16, 1e-3, 1e-3)
    lhs = (se3_adjoint(T) @ jnp.asarray(small)[..., None])[..., 0]
    rhs = se3_log(T @ se3_exp(jnp.asarray(small)) @ se3_inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4, rtol=1e-2)


def test_jit_and_vmap_compatible(rng):
    d = jnp.asarray(random_tangents(rng, 32, 1.0, 1.0))
    f = jax.jit(jax.vmap(lambda x: se3_log(se3_exp(x))))
    np.testing.assert_allclose(np.asarray(f(d)), np.asarray(d), atol=1e-4)
