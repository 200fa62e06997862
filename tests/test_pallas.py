"""Pallas kernel equivalence tests (interpret mode on CPU; SURVEY.md §4.2).

The TPU kernels must agree with their XLA reference implementations on
the documented contracts. Interpret mode executes the same kernel logic
on CPU, so these tests pin kernel *semantics*; performance is validated
on hardware by scripts/profile_phases.py and bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from semicp.corr.bruteforce import class_nn
from semicp.corr.pallas_nn import class_nn_pallas
from semicp.corr.pallas_nn2 import (
    class_nn_attrs_pallas,
    class_nn_attrs_xla,
    sort_cloud_by_class,
)
from semicp.register.pallas_estep import estep_weights_pallas, estep_weights_xla


@pytest.fixture
def scene(rng):
    N, K = 1024, 6
    xyz = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32) * 10)
    lab = jnp.asarray(rng.integers(0, K, size=N).astype(np.int32))
    val = jnp.asarray(rng.uniform(size=N) > 0.1)
    cov6 = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32) * 10)
    return N, K, xyz, lab, val, cov6, q


def test_class_nn_v1_matches_bruteforce(scene):
    N, K, xyz, lab, val, cov6, q = scene
    idx_r, d2_r = class_nn(xyz, lab, val, q, num_classes=K)
    idx_p, d2_p = class_nn_pallas(xyz, lab, val, q, num_classes=K,
                                  qb=256, tb=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
    f = np.asarray(d2_r) < 1e30
    # XLA computes q.t with a HIGHEST-precision dot; the kernel uses plain
    # FMAs — identical winners, last-ulp d2 differences
    np.testing.assert_allclose(np.asarray(d2_p)[f], np.asarray(d2_r)[f],
                               rtol=1e-3, atol=1e-3)


def test_class_nn_v2_matches_xla(scene):
    N, K, xyz, lab, val, cov6, q = scene
    d2_x, at_x = class_nn_attrs_xla(xyz, lab, val, cov6, q, K)
    xyz_s, lab_s, attrs16 = sort_cloud_by_class(xyz, lab, cov6, val, K)
    d2_p, at_p = class_nn_attrs_pallas(xyz_s, lab_s, attrs16, q, num_classes=K,
                                       qb=256, tb=256, interpret=True)
    d2_x, at_x, d2_p, at_p = map(np.asarray, (d2_x, at_x, d2_p, at_p))
    f = d2_x < 1e30
    assert (f == (d2_p < 1e30)).all()
    np.testing.assert_allclose(d2_p[f], d2_x[f], rtol=1e-4, atol=1e-3)
    ax = np.moveaxis(at_x, 1, 0)[:, f]
    ap = np.moveaxis(at_p, 1, 0)[:, f]
    np.testing.assert_array_equal(ap, ax)


def test_class_nn_v2_class_missing(rng):
    """A class absent from the target must come back d2 == INF, attrs 0."""
    N, K = 512, 4
    xyz = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    lab = jnp.asarray((rng.integers(0, 2, size=N)).astype(np.int32))  # only 0,1
    val = jnp.ones(N, bool)
    cov6 = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
    xyz_s, lab_s, attrs16 = sort_cloud_by_class(xyz, lab, cov6, val, K)
    d2, at = class_nn_attrs_pallas(xyz_s, lab_s, attrs16, xyz, num_classes=K,
                                   qb=256, tb=256, interpret=True)
    d2, at = np.asarray(d2), np.asarray(at)
    assert (d2[2:] > 1e30).all()
    assert (at[2:] == 0).all()
    assert (d2[:2] < 1e30).all()


def test_estep_weights_kernel(rng):
    K, N = 8, 2048
    spd = rng.normal(size=(N * K, 3, 3))
    spd = spd @ np.swapaxes(spd, -1, -2) + np.eye(3) * 0.5
    sigma = np.stack([spd[:, 0, 0], spd[:, 1, 1], spd[:, 2, 2],
                      spd[:, 0, 1], spd[:, 0, 2], spd[:, 1, 2]]
                     ).reshape(6, K, N).astype(np.float32)
    d = rng.normal(size=(3, K, N)).astype(np.float32)
    log_sem = (rng.normal(size=(K, N)) * 0.5).astype(np.float32)
    mask = (rng.uniform(size=(K, N)) > 0.2).astype(np.float32)

    w_x, s_x = estep_weights_xla(jnp.asarray(sigma), jnp.asarray(d),
                                 jnp.asarray(log_sem), jnp.asarray(mask))
    w_p, s_p = estep_weights_pallas(jnp.asarray(sigma), jnp.asarray(d),
                                    jnp.asarray(log_sem), jnp.asarray(mask),
                                    nb=512, interpret=True)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=2e-3, atol=1e-3)
    # weights are a proper distribution where any class is unmasked
    w = np.asarray(w_p)
    tot = w.sum(0)
    assert ((np.abs(tot - 1.0) < 1e-5) | (tot == 0.0)).all()
