"""EM semantic registration core — the framework's `align()` entry point.

Reference counterpart: `SemanticIterativeClosestPoint<PointT,SemanticT>
::align()` (include/semantic_icp/semantic_icp.hpp, SURVEY.md §2.1 row
"EM semantic registration core", §2.2, §3.1). One XLA program runs the
whole EM: a `lax.while_loop` whose body is

  E-step: per-class voxel-hash NN for every source point — the K class
          queries run as a sequential `lax.map` over a key offset (no
          per-class trees; sequential keeps peak memory at one class's
          candidate set), then combined covariances and soft
          semantic/geometric weights as (K, N) planes
  M-step: frozen-correspondence Gauss-Newton/LM (gauss_newton.py)
  check:  ||log(T_new T_old^-1)|| < trans_eps  (SURVEY.md §2.2 step 4)

The device boundary is one device_put in, one device_get out per pair
(SURVEY.md §3.3); nothing inside iterates on the host. All per-point
state is planar (see semicp/cloud/cloud.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from semicp.cloud.cloud import Cloud
from semicp.config import Config
from semicp.corr.bruteforce import class_nn
from semicp.geom import sym3
from semicp.geom.se3 import se3_inverse, se3_log
from semicp.register.gauss_newton import apply_T_planar, gn_solve
from semicp.register.residuals import gaussian_loglik_planar


@struct.dataclass
class AlignResult:
    T: jnp.ndarray            # (4,4) source->target transform
    iterations: jnp.ndarray   # () int32 outer EM iterations executed
    converged: jnp.ndarray    # () bool
    cost: jnp.ndarray         # () float32 final weighted Mahalanobis cost
    n_corr: jnp.ndarray       # () float32 effective correspondence count


def _estep(tgt: Cloud, src: Cloud, T, cfg: Config):
    """Per-class NN + soft weights for all source points at pose T.

    Returns (tgt_planes 3x(K,N), w (K,N), sinv 6x(K,N)).
    """
    K = cfg.cloud.num_classes
    moved = apply_T_planar(T, tuple(src.xyz))          # 3 x (N,)
    moved_arr = jnp.stack(moved)                       # (3, N)
    R = T[:3, :3]

    # Exact per-class NN via the MXU brute-force engine (classes are a
    # masked reduction over distance tiles, not per-class structures).
    idx, _approx_d2 = class_nn(
        tgt.xyz, jnp.maximum(tgt.label, 0), tgt.valid, moved_arr,
        num_classes=K,
    )                                                   # (K, N) each
    x_pl = tuple(jnp.take(tgt.xyz[i], idx) for i in range(3))
    cx = tuple(jnp.take(tgt.cov6[i], idx) for i in range(6))
    rc = sym3.rotate(R, tuple(src.cov6))               # rotated src cov, (N,) planes
    sigma = tuple(c + r[None, :] for c, r in zip(cx, rc))
    d = tuple(xp - m[None, :] for xp, m in zip(x_pl, moved))
    # exact gate distance from the gathered winner (the matmul expansion
    # loses ~1e-3 m^2 to cancellation; residuals here are exact)
    exact_d2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
    found = (exact_d2 <= cfg.corr.max_dist**2) & (_approx_d2 < 1.0e37)
    loglik_geo = gaussian_loglik_planar(sigma, d)      # (K, N)

    if cfg.em.uniform_semantics:
        log_sem = jnp.zeros_like(loglik_geo)
    else:
        classes = jnp.arange(K, dtype=jnp.int32)[:, None]
        match = src.label[None, :] == classes
        log_sem = jnp.where(
            match,
            jnp.log(cfg.em.alpha),
            jnp.log((1.0 - cfg.em.alpha) / max(K - 1, 1)),
        )

    gate = found & src.valid[None, :]
    loglik = jnp.where(gate, loglik_geo + log_sem, -jnp.inf)
    mx = jnp.max(loglik, axis=0, keepdims=True)
    safe_mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    unnorm = jnp.where(gate, jnp.exp(loglik - safe_mx), 0.0)
    tot = jnp.sum(unnorm, axis=0, keepdims=True)
    w = jnp.where(tot > 0, unnorm / jnp.maximum(tot, 1e-30), 0.0)

    sinv = sym3.inv(sigma)
    return x_pl, w, sinv


def _align_impl(src: Cloud, tgt: Cloud, T0, cfg: Config):
    src_planes = tuple(src.xyz)

    def cond(carry):
        T, it, step, cost, n_corr = carry
        return (it < cfg.em.max_iters) & (step > cfg.em.trans_eps)

    def body(carry):
        T, it, _step, _cost, _n = carry
        x_pl, w, sinv = _estep(tgt, src, T, cfg)
        T_new, cost, _ = gn_solve(T, src_planes, x_pl, w, sinv, cfg.gn)
        step = jnp.linalg.norm(se3_log(T_new @ se3_inverse(T)))
        return (T_new, it + 1, step, cost, jnp.sum(w))

    init = (
        T0,
        jnp.int32(0),
        jnp.float32(jnp.inf),
        jnp.float32(0.0),
        jnp.float32(0.0),
    )
    T, it, step, cost, n_corr = jax.lax.while_loop(cond, body, init)
    return AlignResult(
        T=T,
        iterations=it,
        converged=step <= cfg.em.trans_eps,
        cost=cost,
        n_corr=n_corr,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _align_jit(src, tgt, T0, cfg):
    return _align_impl(src, tgt, T0, cfg)


def make_align_fn(cfg: Config):
    """Return the jitted align(src, tgt, T0) -> AlignResult for a config."""

    def fn(src: Cloud, tgt: Cloud, T0=None):
        if T0 is None:
            T0 = jnp.eye(4, dtype=jnp.float32)
        return _align_jit(src, tgt, T0, cfg)

    return fn


def align(src: Cloud, tgt: Cloud, cfg: Config | None = None, T_init=None) -> AlignResult:
    """Align source onto target: returns T with x_tgt ~= T @ x_src.

    Clouds must be preprocessed (covariances filled via
    semicp.cloud.preprocess_cloud). Convenience wrapper over the jitted
    core; reuse `make_align_fn` in hot loops.
    """
    cfg = cfg or Config()
    return make_align_fn(cfg)(src, tgt, T_init)
