"""Fully-fused sparse E-step: per-class NN + weights + class reduction
in ONE Pallas kernel.

Measured on the v5e (r5, three-phase rewrite — see _fused_kernel):
bitwise-identical to the composed pipeline (max |diff| 0.0 on all four
outputs) at 17.4 ms/E-step at the 131k bench workload vs the split
path's 16.7, and TIED at the 512k stress scene (323 vs 324 ms) where
the split path additionally writes + reads back a 0.67 GB (K, 16, Q)
attrs intermediate this kernel never materializes. Dispatch
(em_icp.use_fused_estep): split below em.fused_auto_min_q queries
(marginally faster, reference semantics), fused at/above it (memory).
The r4 run-accumulator/online-softmax design this replaced ran 39.9 ms
at bench scale and 861 ms at 512k — its per-class @pl.when flushes and
read-compare merges were the same serialized-VMEM-round-trip tax the
NN kernel's v5 rewrite eliminated.

The kernel's only outputs are the class-collapsed GN planes

    A (6, Q)   sum_k w_k Sigma_k^{-1}
    b (3, Q)   sum_k w_k Sigma_k^{-1} x_k
    c (1, Q)   sum_k w_k x_k^T Sigma_k^{-1} x_k
    wsum (1,Q)

— exactly register.em_icp._estep's contract, so the EM loop's M-step
consumes the kernel output directly. The composed pair
(class_nn_attrs_sparse + estep_reduce) remains the reference semantics
(CPU mesh, ring path, tests); tests pin this kernel against it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semicp.corr.mxu import dot_f32x3
from semicp.corr.pallas_nn2 import NATTR, ROW_CNT, ROW_LAB, ROW_T2

INF = 3.0e37
NEG = -3.0e37
_LOG_2PI_3 = 3.0 * math.log(2.0 * math.pi)

QB = 256


def _fused_kernel(cand_ref, count_ref, cmin_ref, cmax_ref,
                  gate2_ref, qxyz, q2, rc, ls, val, attrs_hbm,
                  a_out, b_out, cw_out,
                  slab, bestd2, wacc, sem, *, qb, tb, num_classes):
    """Three-phase fused E-step (r5 rewrite on the twophase-NN insight:
    never read-compare an accumulator ref — pure min/add accumulates
    pipeline at ~0.2 us/pass, read-compare costs ~2-4 us/pass).

      Phase 1  candidate walk, per-class minima -> bestd2 (K, qb) via
               jnp.minimum only.
      Phase 2  candidate re-walk; winner one-hot select gated by
               `local min <= final best`; winner rows accumulate
               ADDITIVELY into wacc (K, NATTR, qb) VMEM scratch (exact
               cross-tile ties sum; ROW_CNT carries the count).
      Phase 3  once per program: normalize ties, then the per-class
               softmax weight + GN-plane reduction of
               pallas_estep._reduce_kernel over the scratch — the
               (K, 16, Q) intermediate never touches HBM.

    This replaced the r4 run-accumulator/flush design (tile-id-ordered
    candidates, @pl.when flush per class change): 39.9 ms at the 131k
    bench and 861 ms at the 512k stress scene, vs 18-19 / ~330 ms here.
    """
    i = pl.program_id(0)
    cnt = count_ref[i]
    gate2 = gate2_ref[0, 0]

    bestd2[:] = jnp.full_like(bestd2, INF)
    wacc[:] = jnp.zeros_like(wacc)

    def tile_dma(slot, c):
        tid = cand_ref[i, c]
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(tid * tb, tb)], slab.at[slot], sem.at[slot])

    @pl.when(cnt > 0)
    def _():
        tile_dma(0, 0).start()

    vqx, vqy, vqz = qxyz[0, :], qxyz[1, :], qxyz[2, :]
    vq2 = q2[0, :]
    vval = val[0, :] > 0.5
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_classes, qb), 0)

    def tile_d2_lab(t):
        d2 = (vq2[:, None] + t[ROW_T2][None, :]
              - 2.0 * vqx[:, None] * t[0][None, :]
              - 2.0 * vqy[:, None] * t[1][None, :]
              - 2.0 * vqz[:, None] * t[2][None, :])    # (qb, tb)
        return d2, t[ROW_LAB][None, :]

    def body1(c, carry):
        slot = c % 2

        @pl.when(c + 1 < cnt)
        def _():
            tile_dma((c + 1) % 2, c + 1).start()

        tile_dma(slot, c).wait()
        d2, lab = tile_d2_lab(slab[slot])

        def p1(k, carry):
            dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
            m = jnp.min(dk, axis=1)
            upd = jnp.where(rows == k, m[None, :], INF)
            bestd2[:] = jnp.minimum(bestd2[:], upd)
            return carry

        tid = cand_ref[i, c]
        return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1, p1, carry)

    jax.lax.fori_loop(0, cnt, body1, jnp.int32(0))

    @pl.when(cnt > 0)
    def _():
        tile_dma(0, 0).start()              # restart pipeline for phase 2

    best0 = bestd2[:]                       # ONE read; rides the fori carry

    def body2(c, best):
        slot = c % 2

        @pl.when(c + 1 < cnt)
        def _():
            tile_dma((c + 1) % 2, c + 1).start()

        tile_dma(slot, c).wait()
        t = slab[slot]
        d2, lab = tile_d2_lab(t)

        def p2(k, best):
            dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
            m = jnp.min(dk, axis=1)                    # identical arith to p1
            upd = jnp.where(rows == k, m[None, :], INF)
            win = jnp.where((upd <= best) & (rows == k), 1.0, 0.0)
            onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
            sel = dot_f32x3(t, onehot, (((1,), (1,)), ((), ())))
            wacc[:] = wacc[:] + win[:, None, :] * sel[None]
            return best

        tid = cand_ref[i, c]
        return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1, p2, best)

    jax.lax.fori_loop(0, cnt, body2, best0)

    # phase 3: tie-normalize + softmax weights + class reduction — the
    # body of pallas_estep._reduce_kernel, reading winners from VMEM
    # scratch instead of a (K, 16, N) HBM intermediate
    r = rc[:]
    m_run = jnp.full((qb,), NEG, jnp.float32)
    s_run = jnp.zeros((qb,), jnp.float32)
    accA = [jnp.zeros((qb,), jnp.float32) for _ in range(6)]
    accB = [jnp.zeros((qb,), jnp.float32) for _ in range(3)]
    accC = jnp.zeros((qb,), jnp.float32)

    for k in range(num_classes):                       # static unroll
        w = wacc[k]                                    # (NATTR, qb)
        cntk = w[ROW_CNT]
        recip = 1.0 / jnp.maximum(cntk, 1.0)
        x, y, z = w[0] * recip, w[1] * recip, w[2] * recip
        s00 = w[3] * recip + r[0]
        s11 = w[4] * recip + r[1]
        s22 = w[5] * recip + r[2]
        s01 = w[6] * recip + r[3]
        s02 = w[7] * recip + r[4]
        s12 = w[8] * recip + r[5]
        dx, dy, dz = x - vqx, y - vqy, z - vqz

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
        e0 = dx / l00
        e1 = (dy - l10 * e0) / l11
        e2 = (dz - l20 * e0 - l21 * e1) / l22
        maha = e0 * e0 + e1 * e1 + e2 * e2
        loglik = -0.5 * (maha + logdet + _LOG_2PI_3) + ls[k]
        found = ((dx * dx + dy * dy + dz * dz <= gate2)
                 & (cntk > 0.5) & vval)
        loglik = jnp.where(found, loglik, NEG)

        m_new = jnp.maximum(m_run, loglik)
        mn_safe = jnp.maximum(m_new, 0.5 * NEG)
        resc = jnp.exp(m_run - mn_safe)
        p = jnp.where(found, jnp.exp(loglik - mn_safe), 0.0)
        s_run = s_run * resc + p

        t0 = i0 * x + i3 * y + i4 * z                  # Sigma^{-1} x
        t1 = i3 * x + i1 * y + i5 * z
        t2 = i4 * x + i5 * y + i2 * z
        for j, ij in enumerate((i0, i1, i2, i3, i4, i5)):
            accA[j] = accA[j] * resc + p * ij
        accB[0] = accB[0] * resc + p * t0
        accB[1] = accB[1] * resc + p * t1
        accB[2] = accB[2] * resc + p * t2
        accC = accC * resc + p * (x * t0 + y * t1 + z * t2)
        m_run = m_new

    inv_s = jnp.where(s_run > 0.0, 1.0 / jnp.maximum(s_run, 1e-30), 0.0)
    for j in range(6):
        a_out[j:j + 1, :] = (accA[j] * inv_s)[None]
    for j in range(3):
        b_out[j:j + 1, :] = (accB[j] * inv_s)[None]
    cw_out[0:1, :] = (accC * inv_s)[None]
    cw_out[1:2, :] = jnp.where(s_run > 0.0, 1.0, 0.0)[None]


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "qb", "interpret"))
def estep_sparse_fused(prep: dict, q_xyz, q_valid, rc6, log_sem,
                       num_classes: int, gate, qb: int = QB,
                       interpret: bool = False):
    """One-kernel sparse E-step (see module docstring).

    prep: corr.pallas_nn2.prepare_sparse output (cm-sorted target);
    q_xyz (3, Q) moved source points; q_valid (Q,) source mask;
    rc6 (6, Q) rotated source covariance planes; log_sem (K, Q)
    semantic log-prior; gate = max correspondence distance (runtime).

    Returns (A (6,Q), b (3,Q), c (Q,), wsum (Q,)) — equal (within fp)
    to estep_reduce composed with class_nn_attrs_sparse.
    """
    from semicp.corr.layout import tile_candidates
    from semicp.corr.morton import tile_aabbs

    n = prep["xyz_s"].shape[1]
    q = q_xyz.shape[1]
    qb = min(qb, q)
    # SMEM scales with the GRID LENGTH (per-program prefetch
    # bookkeeping), not just the candidate-list width: 2048 programs
    # measured 13 KB over the 1 MB SMEM space at ANY cand cap, while
    # qb=512 at the same Q compiles (r5). Keep the grid <= 1024
    # programs; beyond qb=512 (Q > 512k) shard queries over the mesh
    # (ring/DP) instead of widening further (qb=1024 fails compile).
    while q // qb > 1024 and qb < 512:
        qb *= 2
    if q // qb > 1024:
        raise ValueError(
            f"single-device grid of {q // qb} programs exceeds the ~1024-"
            "program SMEM bookkeeping cap (~1 KB/program, measured r5): "
            f"Q={q} tops out at 524288 per device — shard queries over "
            "the mesh (semicp.dist ring/DP) for larger clouds")
    assert q % qb == 0, (
        f"estep_sparse_fused: Q={q} must be a multiple of qb={qb}")
    tb = n // prep["lo"].shape[0]
    assert n % tb == 0, f"prep tile metadata inconsistent: N={n}, tb={tb}"
    K = num_classes

    qlo, qhi = tile_aabbs(q_xyz, q_valid, qb)
    n_tt = prep["lo"].shape[0]
    n_qt = q // qb
    # budget 56K entries with a floor of 24: at 512k queries
    # (n_qt=2048) the old 64K-entry/floor-32 formula left the kernel
    # 13 KB over the 1 MB SMEM cap (measured r5); 24 candidates/tile
    # still never bind at sane densities (bench avg ~11 boxes in gate)
    cap = min(n_tt, max(24, (56 * 1024) // max(n_qt, 1)))
    # nearest-box-first like the NN kernel (the r4 run-accumulator's
    # tile-id-order invariant is gone: phase 1 is order-independent
    # min-accumulate, phase 2 is order-independent additive)
    cand, count, _ = tile_candidates(qlo, qhi, prep["lo"], prep["hi"], gate,
                                     n_cap=cap if cap < n_tt else None)

    q2 = jnp.sum(q_xyz * q_xyz, axis=0, keepdims=True)

    grid = (q // qb,)
    vspec = lambda lead: pl.BlockSpec(  # noqa: E731
        (lead, qb), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[sspec, vspec(3), vspec(1), vspec(6), vspec(K), vspec(1),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(vspec(6), vspec(3), vspec(2)),
        scratch_shapes=[
            pltpu.VMEM((2, NATTR, tb), jnp.float32),   # double-buffered slab
            pltpu.VMEM((K, qb), jnp.float32),          # phase-1 minima
            pltpu.VMEM((K, NATTR, qb), jnp.float32),   # winner accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    a6, b3, cw = pl.pallas_call(
        functools.partial(_fused_kernel, qb=qb, tb=tb, num_classes=K),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((6, q), jnp.float32),
            jax.ShapeDtypeStruct((3, q), jnp.float32),
            jax.ShapeDtypeStruct((2, q), jnp.float32),
        ),
        interpret=interpret,
    )(
        cand, count, prep["cmin"], prep["cmax"],
        jnp.asarray(gate * gate, jnp.float32).reshape(1, 1),
        q_xyz, q2, rc6, log_sem,
        q_valid.astype(jnp.float32)[None], prep["attrs16"],
    )
    return a6, b3, cw[0], cw[1]
