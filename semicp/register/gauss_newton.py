"""M-step solver: Gauss-Newton with LM damping over SE(3), planar.

Reference counterpart: ceres::Problem + ceres::Solve with the Sophus
SE(3) local parameterization (SURVEY.md §2.1 rows "NLLS solver" and
"SE(3) parameterization"). The whole solve is a fixed-trip-count
`lax.fori_loop` whose body is one fused residual-evaluation +
normal-equation reduction (semicp.register.residuals) + 6x6 solve — the
shape XLA wants, and the H/g reduction is `psum`-able when
correspondences are sharded over a mesh (SURVEY.md §2.3 "Distributed
solver").

The E-step hands over class-COLLAPSED planes (A_i, b_i, c_i — see
pallas_estep.estep_reduce_pallas), so the inner loop's bandwidth is
O(N), not O(K N): correspondences, weights and combined covariances
stay frozen during the inner solve; only T moves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semicp.config import GNConfig
from semicp.geom.se3 import se3_exp
from semicp.register.residuals import normal_equations_collapsed


def apply_T_planar(T, z):
    """Apply (4,4) T to planar points z = (zx, zy, zz)."""
    zx, zy, zz = z
    px = T[0, 0] * zx + T[0, 1] * zy + T[0, 2] * zz + T[0, 3]
    py = T[1, 0] * zx + T[1, 1] * zy + T[1, 2] * zz + T[1, 3]
    pz = T[2, 0] * zx + T[2, 1] * zy + T[2, 2] * zz + T[2, 3]
    return px, py, pz


def gn_solve(T0, src_planes, a6, b3, c, cfg: GNConfig,
             axis_name: str | None = None):
    """Minimize sum_i c_i - 2 b_i.p_i + p_i.A_i p_i over T, p_i = T z_i.

    src_planes: 3-tuple of (N,) source coordinate planes
    a6:         6-tuple of (N,) — sum_k w Sigma^{-1} planes (sym3 order)
    b3:         3-tuple of (N,) — sum_k w Sigma^{-1} x planes
    c:          (N,) — sum_k w x^T Sigma^{-1} x

    When `axis_name` is given, the H/g/cost reductions are psum'd across
    that mesh axis (points-sharded distributed solve).

    Returns (T, final_cost, last_step_norm, H (6,6) at the final T).
    """

    def cond(carry):
        _T, _lam, _cost, step, _H, it = carry
        # early exit at cfg.step_eps, Ceres-style: the frozen-
        # correspondence LM typically converges in 2-3 of the 8
        # budgeted iterations (the step norm is psum-replicated when
        # sharded, so every shard agrees on the trip count)
        return (it < cfg.max_iters) & (step > cfg.step_eps)

    def body(carry):
        T, lam, prev_cost, _step, _H, it = carry
        p = apply_T_planar(T, src_planes)           # (N,) planes
        H, g, cost = normal_equations_collapsed(a6, b3, c, p)
        if axis_name is not None:
            H = jax.lax.psum(H, axis_name)
            g = jax.lax.psum(g, axis_name)
            cost = jax.lax.psum(cost, axis_name)
        damped = H + lam * jnp.diag(jnp.diagonal(H))
        delta = jnp.linalg.solve(damped, -g)
        T_new = se3_exp(delta) @ T
        # LM schedule mirroring the oracle: grow lambda when the frozen
        # cost increased since the previous iterate, shrink otherwise.
        worse = (prev_cost >= 0.0) & (cost > prev_cost)
        lam_new = jnp.where(worse, lam * cfg.lm_up, jnp.maximum(lam * cfg.lm_down, cfg.lm_lambda0))
        step = jnp.linalg.norm(delta)
        return (T_new, lam_new, cost, step, H, it + 1)

    lam0 = jnp.asarray(cfg.lm_lambda0, jnp.float32)
    H0 = jnp.zeros((6, 6), jnp.float32)
    T, _, cost, step, H, _ = jax.lax.while_loop(
        cond, body,
        (T0, lam0, jnp.float32(-1.0), jnp.float32(jnp.inf), H0, jnp.int32(0))
    )
    return T, cost, step, H
