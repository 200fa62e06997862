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
from semicp.corr.pallas_nn2 import (
    class_nn_attrs_pallas,
    class_nn_attrs_xla,
    sort_cloud_by_class,
)
from semicp.geom import sym3
from semicp.geom.se3 import se3_inverse, se3_log
from semicp.register.gauss_newton import apply_T_planar, gn_solve
from semicp.register.pallas_estep import estep_weights_auto


@struct.dataclass
class AlignResult:
    T: jnp.ndarray            # (4,4) source->target transform
    iterations: jnp.ndarray   # () int32 outer EM iterations executed
    converged: jnp.ndarray    # () bool
    cost: jnp.ndarray         # () float32 final weighted Mahalanobis cost
    n_corr: jnp.ndarray       # () float32 effective correspondence count


def _estep(tgt_prep, src: Cloud, T, cfg: Config):
    """Per-class NN + soft weights for all source points at pose T.

    tgt_prep is the loop-invariant prepared target from `_prepare_target`
    (class-sorted planes + packed attribute rows on TPU; the raw cloud on
    CPU). The NN kernel returns each winner's attribute row directly, so
    the EM loop contains no gathers (see corr/pallas_nn2.py).

    Returns (tgt_planes 3x(K,N), w (K,N), sinv 6x(K,N)).
    """
    K = cfg.cloud.num_classes
    moved = apply_T_planar(T, tuple(src.xyz))          # 3 x (N,)
    moved_arr = jnp.stack(moved)                       # (3, N)
    R = T[:3, :3]

    if tgt_prep["kind"] == "sorted":
        nn_d2, attrs = class_nn_attrs_pallas(
            tgt_prep["xyz_s"], tgt_prep["label_s"], tgt_prep["attrs16"],
            moved_arr, num_classes=K,
        )
    else:
        tgt = tgt_prep["cloud"]
        nn_d2, attrs = class_nn_attrs_xla(
            tgt.xyz, tgt.label, tgt.valid, tgt.cov6, moved_arr, num_classes=K,
        )
    x_pl = tuple(attrs[:, i, :] for i in range(3))     # (K, N) planes
    cx = tuple(attrs[:, 3 + i, :] for i in range(6))
    rc = sym3.rotate(R, tuple(src.cov6))               # rotated src cov, (N,) planes
    sigma = jnp.stack([c + r[None, :] for c, r in zip(cx, rc)])   # (6,K,N)
    d_pl = tuple(xp - m[None, :] for xp, m in zip(x_pl, moved))
    d = jnp.stack(d_pl)                                 # (3,K,N)
    # exact gate distance from the winner's coordinates (the matmul
    # expansion loses ~1e-3 m^2 to cancellation; residuals are exact)
    exact_d2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
    found = (exact_d2 <= cfg.corr.max_dist**2) & (nn_d2 < 1.0e37)

    if cfg.em.uniform_semantics:
        log_sem = jnp.zeros((K,) + src.label.shape, jnp.float32)
    else:
        classes = jnp.arange(K, dtype=jnp.int32)[:, None]
        match = src.label[None, :] == classes
        log_sem = jnp.where(
            match,
            jnp.log(cfg.em.alpha),
            jnp.log((1.0 - cfg.em.alpha) / max(K - 1, 1)),
        ).astype(jnp.float32)

    gate = (found & src.valid[None, :]).astype(jnp.float32)
    w, sinv_arr = estep_weights_auto(sigma, d, log_sem, gate)
    sinv = tuple(sinv_arr[i] for i in range(6))
    return x_pl, w, sinv


def _prepare_target(tgt: Cloud, cfg: Config) -> dict:
    """Loop-invariant target preparation (once per align).

    TPU: class-sort the planes and pack attribute rows for the fused NN
    kernel. CPU (tests / virtual mesh): pass the raw cloud through to
    the XLA fallback.
    """
    if jax.default_backend() == "cpu":
        return {"kind": "cloud", "cloud": tgt}
    xyz_s, label_s, attrs16 = sort_cloud_by_class(
        tgt.xyz, tgt.label, tgt.cov6, tgt.valid, cfg.cloud.num_classes
    )
    return {"kind": "sorted", "xyz_s": xyz_s, "label_s": label_s, "attrs16": attrs16}


def _align_impl(src: Cloud, tgt: Cloud, T0, cfg: Config):
    src_planes = tuple(src.xyz)
    tgt_prep = _prepare_target(tgt, cfg)

    def cond(carry):
        T, it, step, cost, n_corr = carry
        return (it < cfg.em.max_iters) & (step > cfg.em.trans_eps)

    def body(carry):
        T, it, _step, _cost, _n = carry
        x_pl, w, sinv = _estep(tgt_prep, src, T, cfg)
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


def make_robust_align_fn(cfg: Config):
    """align fn with a host-side recovery retry (odometry/SLAM drivers).

    A constant-velocity warm start occasionally lands EM in a wrong
    local minimum (measured on the synthetic loop: one corner frame
    converged to 1.8 m error from the warm start, 6 mm from identity).
    The failure is detectable without ground truth: the bad basin keeps
    far fewer gated correspondences than the clouds' overlap supports.
    If the warm-started solve fails to converge or its correspondence
    count drops below `em.retry_overlap_frac` of min(|src|, |tgt|),
    re-solve from identity and keep whichever solution retains more
    correspondences. Costs one extra solve only on suspect frames.
    """
    base = make_align_fn(cfg)
    frac = cfg.em.retry_overlap_frac

    def fn(src: Cloud, tgt: Cloud, T0=None):
        res = base(src, tgt, T0)
        if frac <= 0.0 or T0 is None:
            return res
        n_expect = float(jnp.minimum(src.count, tgt.count))
        healthy = bool(res.converged) and float(res.n_corr) >= frac * n_expect
        if healthy:
            return res
        res2 = base(src, tgt, None)
        return res2 if float(res2.n_corr) > float(res.n_corr) else res

    return fn


def align(src: Cloud, tgt: Cloud, cfg: Config | None = None, T_init=None) -> AlignResult:
    """Align source onto target: returns T with x_tgt ~= T @ x_src.

    Clouds must be preprocessed (covariances filled via
    semicp.cloud.preprocess_cloud). Convenience wrapper over the jitted
    core; reuse `make_align_fn` in hot loops.
    """
    cfg = cfg or Config()
    return make_align_fn(cfg)(src, tgt, T_init)
