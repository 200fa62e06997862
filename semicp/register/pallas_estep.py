"""Fused E-step reduce kernel — Pallas (the second flagship kernel).

SURVEY.md §2.1 names exactly two Pallas-worthy components; this is (b):
the fused E-step weight computation (the reference's per-correspondence
Sigma_ik / N(d;0,Sigma) / confusion-model math strewn through
semantic_icp.hpp's E-step, SURVEY.md §2.2 step 2) — fused one step
further than the reference ever could: the class axis is REDUCED inside
the kernel, so the M-step never sees K.

For each point i the kernel computes, online over the K classes
(flash-attention-style running softmax — one pass, no (K,N)
intermediates in HBM):

  Cholesky of Sigma_ik -> Mahalanobis + logdet -> geometric log-lik
  + semantic log-prior -> softmax weight w_ik -> accumulate
      A_i = sum_k w_ik Sigma_ik^{-1}               (6 planes)
      b_i = sum_k w_ik Sigma_ik^{-1} x_ik          (3 planes)
      c_i = sum_k w_ik x_ik^T Sigma_ik^{-1} x_ik   (1 plane)
      wsum_i = sum_k w_ik                          (1 plane)

These four suffice for the whole frozen-correspondence GN inner solve
(residuals.normal_equations_collapsed): with J_i depending only on the
moved source point, H = sum_i J_i^T A_i J_i, g = sum_i J_i^T (b_i -
A_i p_i), cost = sum_i c_i - 2 b_i.p_i + p_i.A_i p_i — exactly equal to
the per-(i,k) sums, K times less M-step bandwidth.

Inputs arrive as the NN kernel's outputs (d2 (K,N), attrs (K,16,N))
plus loop-invariant planes; `estep_weights_xla` keeps the un-reduced
(K,N) semantics as the test reference and CPU building block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI_3 = 3.0 * math.log(2.0 * math.pi)
NEG = -3.0e37
INF = 3.0e37

NB = 2048  # lane-dim block; K is a static in-kernel unroll


def _chol_sinv(s00, s11, s22, s01, s02, s12):
    """Closed-form Cholesky + adjugate inverse of a planar sym3."""
    l00 = jnp.sqrt(jnp.maximum(s00, 1e-30))
    l10 = s01 / l00
    l20 = s02 / l00
    l11 = jnp.sqrt(jnp.maximum(s11 - l10 * l10, 1e-30))
    l21 = (s12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(s22 - l20 * l20 - l21 * l21, 1e-30))
    logdet = 2.0 * (jnp.log(l00) + jnp.log(l11) + jnp.log(l22))
    det = (l00 * l11 * l22) ** 2
    rd = 1.0 / det
    i0 = (s11 * s22 - s12 * s12) * rd
    i1 = (s00 * s22 - s02 * s02) * rd
    i2 = (s00 * s11 - s01 * s01) * rd
    i3 = (s02 * s12 - s01 * s22) * rd
    i4 = (s01 * s12 - s02 * s11) * rd
    i5 = (s01 * s02 - s00 * s12) * rd
    return (l00, l10, l20, l11, l21, l22), logdet, (i0, i1, i2, i3, i4, i5)


def _reduce_kernel(gate2_ref, d2_ref, attrs_ref, rc_ref, mv_ref, ls_ref,
                   val_ref, a_ref, b_ref, cw_ref, *, num_classes):
    # gate2 is a runtime scalar (SMEM) so SLAM's wide-gate verification
    # program reuses this compiled kernel instead of recompiling
    gate2 = gate2_ref[0, 0]
    px, py, pz = mv_ref[0], mv_ref[1], mv_ref[2]
    r0, r1, r2 = rc_ref[0], rc_ref[1], rc_ref[2]
    r3, r4, r5 = rc_ref[3], rc_ref[4], rc_ref[5]
    val = val_ref[0] > 0.5

    nb = px.shape[0]
    m = jnp.full((nb,), NEG, jnp.float32)
    s = jnp.zeros((nb,), jnp.float32)
    accA = [jnp.zeros((nb,), jnp.float32) for _ in range(6)]
    accB = [jnp.zeros((nb,), jnp.float32) for _ in range(3)]
    accC = jnp.zeros((nb,), jnp.float32)

    for k in range(num_classes):                       # static unroll
        x, y, z = attrs_ref[k, 0], attrs_ref[k, 1], attrs_ref[k, 2]
        s00 = attrs_ref[k, 3] + r0
        s11 = attrs_ref[k, 4] + r1
        s22 = attrs_ref[k, 5] + r2
        s01 = attrs_ref[k, 6] + r3
        s02 = attrs_ref[k, 7] + r4
        s12 = attrs_ref[k, 8] + r5
        dx, dy, dz = x - px, y - py, z - pz

        L, logdet, sinv = _chol_sinv(s00, s11, s22, s01, s02, s12)
        l00, l10, l20, l11, l21, l22 = L
        e0 = dx / l00
        e1 = (dy - l10 * e0) / l11
        e2 = (dz - l20 * e0 - l21 * e1) / l22
        maha = e0 * e0 + e1 * e1 + e2 * e2
        loglik = -0.5 * (maha + logdet + _LOG_2PI_3) + ls_ref[k]

        found = (dx * dx + dy * dy + dz * dz <= gate2) & (d2_ref[k] < INF) & val
        loglik = jnp.where(found, loglik, NEG)

        m_new = jnp.maximum(m, loglik)
        mn_safe = jnp.maximum(m_new, 0.5 * NEG)        # all-masked stays harmless
        resc = jnp.exp(m - mn_safe)
        p = jnp.where(found, jnp.exp(loglik - mn_safe), 0.0)
        s = s * resc + p

        i0, i1, i2, i3, i4, i5 = sinv
        t0 = i0 * x + i3 * y + i4 * z                  # Sigma^{-1} x
        t1 = i3 * x + i1 * y + i5 * z
        t2 = i4 * x + i5 * y + i2 * z
        for j, ij in enumerate(sinv):
            accA[j] = accA[j] * resc + p * ij
        accB[0] = accB[0] * resc + p * t0
        accB[1] = accB[1] * resc + p * t1
        accB[2] = accB[2] * resc + p * t2
        accC = accC * resc + p * (x * t0 + y * t1 + z * t2)
        m = m_new

    inv_s = jnp.where(s > 0.0, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    for j in range(6):
        a_ref[j] = accA[j] * inv_s
    for j in range(3):
        b_ref[j] = accB[j] * inv_s
    cw_ref[0] = accC * inv_s
    cw_ref[1] = jnp.where(s > 0.0, 1.0, 0.0)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def estep_reduce_pallas(nn_d2, attrs, rc6, moved, log_sem, valid,
                        gate2, nb: int = NB, interpret: bool = False):
    """Fused weights + class reduction (see module docstring).

    nn_d2 (K,N), attrs (K,16,N) — the NN kernel's outputs;
    rc6 (6,N) rotated source covariance; moved (3,N) = T z;
    log_sem (K,N) semantic log-prior; valid (N,) bool source mask;
    gate2 = max correspondence distance SQUARED (runtime scalar).

    Returns (A (6,N), b (3,N), c (N), wsum (N)).
    """
    K, n = nn_d2.shape
    nb = min(nb, n)
    assert n % nb == 0, f"N={n} must be a multiple of the block {nb}"
    grid = (n // nb,)

    def spec(lead):
        return pl.BlockSpec((lead, nb), lambda i: (0, i), memory_space=pltpu.VMEM)

    aspec = pl.BlockSpec((K, 16, nb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    a6, b3, cw = pl.pallas_call(
        functools.partial(_reduce_kernel, num_classes=K),
        grid=grid,
        in_specs=[sspec, spec(K), aspec, spec(6), spec(3), spec(K), spec(1)],
        out_specs=(spec(6), spec(3), spec(2)),
        out_shape=(
            jax.ShapeDtypeStruct((6, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray(gate2, jnp.float32).reshape(1, 1),
      nn_d2, attrs, rc6, moved,
      log_sem, valid.astype(jnp.float32)[None])
    return a6, b3, cw[0], cw[1]


def estep_weights_xla(sigma, d, log_sem, mask):
    """Un-reduced (K,N) reference semantics (tests / CPU building block)."""
    from semicp.geom import sym3
    from semicp.register.residuals import gaussian_loglik_planar

    sig_t = tuple(sigma[i] for i in range(6))
    d_t = tuple(d[i] for i in range(3))
    loglik = gaussian_loglik_planar(sig_t, d_t) + log_sem
    loglik = jnp.where(mask > 0.5, loglik, NEG)
    mx = jnp.max(loglik, axis=0, keepdims=True)
    safe_mx = jnp.maximum(mx, NEG * 0.5)
    unnorm = jnp.where(mask > 0.5, jnp.exp(loglik - safe_mx), 0.0)
    tot = jnp.sum(unnorm, axis=0, keepdims=True)
    w = jnp.where(tot > 0.0, unnorm / jnp.maximum(tot, 1e-30), 0.0)
    sinv = jnp.stack(sym3.inv(sig_t), 0)
    return w, sinv


def estep_reduce_xla(nn_d2, attrs, rc6, moved, log_sem, valid, gate2):
    """XLA implementation of the reduce contract (CPU mesh / tests)."""
    x_pl = tuple(attrs[:, i, :] for i in range(3))         # (K,N) planes
    cx = tuple(attrs[:, 3 + i, :] for i in range(6))
    sigma = jnp.stack([c + r[None, :] for c, r in zip(cx, rc6)])
    d = jnp.stack([xp - mv[None, :] for xp, mv in zip(x_pl, moved)])
    exact_d2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
    gate = ((exact_d2 <= gate2) & (nn_d2 < INF)
            & valid[None, :]).astype(jnp.float32)
    w, sinv = estep_weights_xla(sigma, d, log_sem, gate)
    a6 = jnp.einsum("kn,skn->sn", w, sinv)
    t = jnp.stack([
        sinv[0] * x_pl[0] + sinv[3] * x_pl[1] + sinv[4] * x_pl[2],
        sinv[3] * x_pl[0] + sinv[1] * x_pl[1] + sinv[5] * x_pl[2],
        sinv[4] * x_pl[0] + sinv[5] * x_pl[1] + sinv[2] * x_pl[2],
    ])                                                     # (3,K,N)
    b3 = jnp.einsum("kn,skn->sn", w, t)
    c = jnp.einsum("kn,kn->n", w,
                   x_pl[0] * t[0] + x_pl[1] * t[1] + x_pl[2] * t[2])
    wsum = jnp.sum(w, axis=0)
    return a6, b3, c, wsum


def estep_reduce_auto(nn_d2, attrs, rc6, moved, log_sem, valid, gate2: float,
                      interpret: bool = False):
    if jax.default_backend() == "cpu" and not interpret:
        return estep_reduce_xla(nn_d2, attrs, rc6, jnp.stack(moved),
                                log_sem, valid, gate2)
    return estep_reduce_pallas(nn_d2, attrs, rc6, jnp.stack(moved),
                               log_sem, valid, gate2, interpret=interpret)
