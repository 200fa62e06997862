"""Fused E-step weight kernel — Pallas (the second flagship kernel).

SURVEY.md §2.1 names exactly two Pallas-worthy components; this is (b):
the fused E-step weight computation (the reference's per-correspondence
Sigma_ik / N(d;0,Sigma) / confusion-model math strewn through
semantic_icp.hpp's E-step, SURVEY.md §2.2 step 2). One VMEM-resident
pass per N-block computes, for all K classes at once:

  Cholesky of Sigma  ->  Mahalanobis + logdet  ->  geometric log-lik
  + semantic log-prior  ->  masked softmax over classes  ->  weights
  and Sigma^{-1} via the adjugate (det from the Cholesky diagonal)

Inputs arrive pre-gathered as (K, N) planes (the O(N) winner gathers
stay in XLA — they are cheap; it is the ~30 elementwise passes that
must not round-trip HBM individually).
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

NB = 2048  # lane-dim block; K rides sublanes


def _estep_kernel(sig_ref, d_ref, logsem_ref, mask_ref, w_ref, sinv_ref):
    s00 = sig_ref[0]
    s11 = sig_ref[1]
    s22 = sig_ref[2]
    s01 = sig_ref[3]
    s02 = sig_ref[4]
    s12 = sig_ref[5]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

    # closed-form Cholesky (planar; see geom/sym3.py)
    l00 = jnp.sqrt(jnp.maximum(s00, 1e-30))
    l10 = s01 / l00
    l20 = s02 / l00
    l11 = jnp.sqrt(jnp.maximum(s11 - l10 * l10, 1e-30))
    l21 = (s12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(s22 - l20 * l20 - l21 * l21, 1e-30))

    e0 = dx / l00
    e1 = (dy - l10 * e0) / l11
    e2 = (dz - l20 * e0 - l21 * e1) / l22
    maha = e0 * e0 + e1 * e1 + e2 * e2
    logdet = 2.0 * (jnp.log(l00) + jnp.log(l11) + jnp.log(l22))
    loglik = -0.5 * (maha + logdet + _LOG_2PI_3) + logsem_ref[...]
    loglik = jnp.where(mask_ref[...] > 0.5, loglik, NEG)

    # masked softmax over the class (sublane) axis
    mx = jnp.max(loglik, axis=0, keepdims=True)
    safe_mx = jnp.maximum(mx, NEG * 0.5)  # all-masked columns stay harmless
    unnorm = jnp.where(mask_ref[...] > 0.5, jnp.exp(loglik - safe_mx), 0.0)
    tot = jnp.sum(unnorm, axis=0, keepdims=True)
    w_ref[...] = jnp.where(tot > 0.0, unnorm / jnp.maximum(tot, 1e-30), 0.0)

    # Sigma^{-1} via adjugate; det from the Cholesky diagonal
    det = (l00 * l11 * l22) ** 2
    rd = 1.0 / det
    sinv_ref[0] = (s11 * s22 - s12 * s12) * rd
    sinv_ref[1] = (s00 * s22 - s02 * s02) * rd
    sinv_ref[2] = (s00 * s11 - s01 * s01) * rd
    sinv_ref[3] = (s02 * s12 - s01 * s22) * rd
    sinv_ref[4] = (s01 * s12 - s02 * s11) * rd
    sinv_ref[5] = (s01 * s02 - s00 * s12) * rd


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def estep_weights_pallas(sigma, d, log_sem, mask, nb: int = NB, interpret: bool = False):
    """sigma: (6,K,N); d: (3,K,N); log_sem, mask: (K,N) -> (w (K,N), sinv (6,K,N))."""
    _, K, N = sigma.shape
    nb = min(nb, N)
    grid = (N // nb,)

    def spec(lead):
        return pl.BlockSpec((lead, K, nb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    spec2 = pl.BlockSpec((K, nb), lambda i: (0, i), memory_space=pltpu.VMEM)

    w, sinv = pl.pallas_call(
        _estep_kernel,
        grid=grid,
        in_specs=[spec(6), spec(3), spec2, spec2],
        out_specs=(spec2, spec(6)),
        out_shape=(
            jax.ShapeDtypeStruct((K, N), jnp.float32),
            jax.ShapeDtypeStruct((6, K, N), jnp.float32),
        ),
        interpret=interpret,
    )(sigma, d, log_sem, mask)
    return w, sinv


def estep_weights_xla(sigma, d, log_sem, mask):
    """Reference XLA implementation (CPU mesh / tests) — same contract."""
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


def estep_weights_auto(sigma, d, log_sem, mask):
    if jax.default_backend() == "cpu":
        return estep_weights_xla(sigma, d, log_sem, mask)
    return estep_weights_pallas(sigma, d, log_sem, mask)
