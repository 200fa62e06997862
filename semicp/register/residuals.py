"""GICP Mahalanobis residuals and SE(3) normal equations — planar closed form.

Reference counterpart: `GICPCostFunction` + Ceres autodiff/cost blocks
(include/semantic_icp/gicp_cost_function.h, SURVEY.md §2.1 row "GICP
Mahalanobis cost"). Instead of per-residual cost objects evaluated by a
solver, everything is componentwise math on planes (semicp.geom.sym3):

  residual  r_ik = x_j(i,k) - T z_i
  combined  Sigma_ik = C_x + R C_z R^T  (both GICP-regularized)
  Jacobian  J = dr/ddelta = [-I | +hat(T z_i)] for T <- exp(delta) T,
            tangent order [v, w]

The 6x6 Gauss-Newton system H = sum w J^T S J, g = sum w J^T S r
(S = Sigma^{-1}) is expanded into its 21+6 unique scalar components so
no (N,3,3) or (N,3,6) intermediate is ever materialized — each term is
a fused multiply-add over (K,N) planes, the exact shape the VPU wants.
Weights fold in as w * (.) — the analogue of Ceres' sqrt(w) scaling.
"""

from __future__ import annotations

import jax.numpy as jnp

from semicp.geom import sym3

_LOG_2PI_3 = 3.0 * jnp.log(2.0 * jnp.pi)


def gaussian_loglik_planar(sigma, d):
    """log N(d; 0, Sigma) on planes: sigma 6-tuple, d 3-tuple of planes."""
    L = sym3.chol(sigma)
    maha = sym3.chol_maha(L, d)
    logdet = sym3.chol_logdet(L)
    return -0.5 * (maha + logdet + _LOG_2PI_3)


def normal_equations_planar(w, sinv, p, d, sum_axes=None):
    """Accumulate the GN system from planes.

    w:    (...,) weights
    sinv: 6-tuple (...,) — Sigma^{-1} components (sym3 order)
    p:    3-tuple (...,) — moved source points T z
    d:    3-tuple (...,) — residuals x - T z

    Returns (H (6,6), g (6,), cost ()) summed over all dims (or
    `sum_axes`). Derivation: with P = hat(p), J = [-I | P]:
      H_tt =  sum w S          g_t = -sum w S d
      H_tr = -sum w S P        g_r =  sum w (S d) x p   (cross product)
      H_rr =  sum w P^T S P
    """
    s00, s11, s22, s01, s02, s12 = sinv
    px, py, pz = p
    dx, dy, dz = d

    def rsum(x):
        return jnp.sum(w * x, axis=sum_axes)

    # S d
    t0 = s00 * dx + s01 * dy + s02 * dz
    t1 = s01 * dx + s11 * dy + s12 * dz
    t2 = s02 * dx + s12 * dy + s22 * dz

    # B = S P, columns c0..c2 (rows a = 0..2 of S applied to hat(p) cols)
    b00 = s01 * pz - s02 * py
    b01 = -s00 * pz + s02 * px
    b02 = s00 * py - s01 * px
    b10 = s11 * pz - s12 * py
    b11 = -s01 * pz + s12 * px
    b12 = s01 * py - s11 * px
    b20 = s12 * pz - s22 * py
    b21 = -s02 * pz + s22 * px
    b22 = s02 * py - s12 * px

    # C = P^T S P = -P B (symmetric)
    c00 = pz * b10 - py * b20
    c01 = pz * b11 - py * b21
    c02 = pz * b12 - py * b22
    c11 = -pz * b01 + px * b21
    c12 = -pz * b02 + px * b22
    c22 = py * b02 - px * b12

    H_tt = jnp.stack([
        jnp.stack([rsum(s00), rsum(s01), rsum(s02)]),
        jnp.stack([rsum(s01), rsum(s11), rsum(s12)]),
        jnp.stack([rsum(s02), rsum(s12), rsum(s22)]),
    ])
    H_tr = -jnp.stack([
        jnp.stack([rsum(b00), rsum(b01), rsum(b02)]),
        jnp.stack([rsum(b10), rsum(b11), rsum(b12)]),
        jnp.stack([rsum(b20), rsum(b21), rsum(b22)]),
    ])
    H_rr = jnp.stack([
        jnp.stack([rsum(c00), rsum(c01), rsum(c02)]),
        jnp.stack([rsum(c01), rsum(c11), rsum(c12)]),
        jnp.stack([rsum(c02), rsum(c12), rsum(c22)]),
    ])
    g_t = -jnp.stack([rsum(t0), rsum(t1), rsum(t2)])
    # (S d) x p
    g_r = jnp.stack([
        rsum(t1 * pz - t2 * py),
        rsum(t2 * px - t0 * pz),
        rsum(t0 * py - t1 * px),
    ])

    H = jnp.block([[H_tt, H_tr], [H_tr.T, H_rr]])
    g = jnp.concatenate([g_t, g_r])
    cost = rsum(dx * t0 + dy * t1 + dz * t2)
    return H, g, cost


def normal_equations_collapsed(a6, b3, c, p, sum_axes=None):
    """GN system from the E-step's class-collapsed planes.

    The fused E-step kernel (pallas_estep.estep_reduce_pallas) reduces
    the class axis into per-point planes
        A_i = sum_k w Sinv        (a6: 6-tuple of (...,N))
        b_i = sum_k w Sinv x      (b3: 3-tuple)
        c_i = sum_k w x^T Sinv x  (c: (...,N))
    With J_i = [-I | hat(p_i)] depending only on the moved source point
    p_i = T z_i, the per-(i,k) GN sums collapse exactly:
        H = sum_i J_i^T A_i J_i
        g = sum_i J_i^T u_i,  u_i = b_i - A_i p_i  (= sum_k w Sinv d)
        cost = sum_i c_i - 2 b_i.p_i + p_i.(A_i p_i)
    Same (H (6,6), g (6,), cost ()) contract as normal_equations_planar;
    K times less bandwidth in the inner loop.
    """
    a00, a11, a22, a01, a02, a12 = a6
    bx, by, bz = b3
    px, py, pz = p

    def rsum(x):
        return jnp.sum(x, axis=sum_axes)

    # A p
    ap0 = a00 * px + a01 * py + a02 * pz
    ap1 = a01 * px + a11 * py + a12 * pz
    ap2 = a02 * px + a12 * py + a22 * pz
    # u = b - A p  (plays the role of S d in normal_equations_planar)
    t0 = bx - ap0
    t1 = by - ap1
    t2 = bz - ap2

    # B = A P, P = hat(p)
    b00 = a01 * pz - a02 * py
    b01 = -a00 * pz + a02 * px
    b02 = a00 * py - a01 * px
    b10 = a11 * pz - a12 * py
    b11 = -a01 * pz + a12 * px
    b12 = a01 * py - a11 * px
    b20 = a12 * pz - a22 * py
    b21 = -a02 * pz + a22 * px
    b22 = a02 * py - a12 * px
    # C = P^T A P = -P B (symmetric)
    c00 = pz * b10 - py * b20
    c01 = pz * b11 - py * b21
    c02 = pz * b12 - py * b22
    c11 = -pz * b01 + px * b21
    c12 = -pz * b02 + px * b22
    c22 = py * b02 - px * b12

    H_tt = jnp.stack([
        jnp.stack([rsum(a00), rsum(a01), rsum(a02)]),
        jnp.stack([rsum(a01), rsum(a11), rsum(a12)]),
        jnp.stack([rsum(a02), rsum(a12), rsum(a22)]),
    ])
    H_tr = -jnp.stack([
        jnp.stack([rsum(b00), rsum(b01), rsum(b02)]),
        jnp.stack([rsum(b10), rsum(b11), rsum(b12)]),
        jnp.stack([rsum(b20), rsum(b21), rsum(b22)]),
    ])
    H_rr = jnp.stack([
        jnp.stack([rsum(c00), rsum(c01), rsum(c02)]),
        jnp.stack([rsum(c01), rsum(c11), rsum(c12)]),
        jnp.stack([rsum(c02), rsum(c12), rsum(c22)]),
    ])
    g_t = -jnp.stack([rsum(t0), rsum(t1), rsum(t2)])
    g_r = jnp.stack([
        rsum(t1 * pz - t2 * py),
        rsum(t2 * px - t0 * pz),
        rsum(t0 * py - t1 * px),
    ])
    H = jnp.block([[H_tt, H_tr], [H_tr.T, H_rr]])
    g = jnp.concatenate([g_t, g_r])
    cost = rsum(c - 2.0 * (bx * px + by * py + bz * pz)
                + px * ap0 + py * ap1 + pz * ap2)
    return H, g, cost
