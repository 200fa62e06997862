"""Fully-fused sparse E-step: per-class NN + weights + class reduction
in ONE Pallas kernel.

Measured on the v5e at the bench workload (120k pts, 20 classes): the
fused kernel is bitwise-identical to the composed pipeline (max |diff|
0.0 on A/b/wsum) at 39.9 ms vs the split path's 38.4 ms — the run-
accumulator + per-class-flush machinery costs about what it deletes
(the split path's K-indexed dynamic-slice merges + the separate reduce
kernel). What fusion DOES buy is memory: the split path materializes a
(K, 16, Q) attrs intermediate in HBM (167 MB at bench scale, growing
linearly with the target size), which this kernel never writes — so it
is the right E-step at map-scale targets and is exposed via
`em.fused_estep` (default off: the split path is marginally faster at
scan scale and remains the reference semantics).

The enabling observation: with candidates ordered by TILE ID over the
class-major Morton layout, the class of successive candidate tiles is
non-decreasing (max label of tile t <= min label of tile t' for
t < t'), so each class's winner is FINAL the moment its run of tiles
ends. At that moment the kernel feeds the winner row straight into the
flash-attention-style online softmax over classes (the same math as
pallas_estep._reduce_kernel, one class at a time), and the per-class
winner never touches HBM. Winner state and softmax state are small
STATIC-indexed VMEM scratch; the kernel's only outputs are the
class-collapsed GN planes

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

from semicp.corr.pallas_nn2 import NATTR, ROW_CNT, ROW_LAB, ROW_T2

INF = 3.0e37
NEG = -3.0e37
_LOG_2PI_3 = 3.0 * math.log(2.0 * math.pi)

QB = 256

# soft-state scratch rows: online-softmax running max / denominator,
# then the weighted accumulators
_R_M, _R_S, _R_A, _R_B, _R_C = 0, 1, 2, 8, 11
_NSOFT = 12


def _fused_kernel(cand_ref, count_ref, cmin_ref, cmax_ref,
                  gate2_ref, qxyz, q2, rc, ls, val, attrs_hbm,
                  a_out, b_out, cw_out,
                  slab, run_d2, run_attr, soft, sem, *, qb, tb, guard=True):
    i = pl.program_id(0)
    cnt = count_ref[i]
    gate2 = gate2_ref[0, 0]

    soft[_R_M:_R_M + 1, :] = jnp.full((1, qb), NEG, jnp.float32)
    soft[_R_S:_NSOFT, :] = jnp.zeros((_NSOFT - 1, qb), jnp.float32)

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

    def flush_run(k):
        """Class k's winner is final: fold it into the online softmax
        (the body of pallas_estep._reduce_kernel for one class)."""
        w = run_attr[:]                                # (NATTR, qb)
        x, y, z = w[0], w[1], w[2]
        r = rc[:]
        s00 = w[3] + r[0]
        s11 = w[4] + r[1]
        s22 = w[5] + r[2]
        s01 = w[6] + r[3]
        s02 = w[7] + r[4]
        s12 = w[8] + r[5]
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
        loglik = (-0.5 * (maha + logdet + _LOG_2PI_3)
                  + ls[pl.ds(k, 1), :][0])
        # exact re-computed distance gates the correspondence; w[ROW_CNT]
        # is 1.0 iff a winner exists (normalized one-hot count row)
        found = ((dx * dx + dy * dy + dz * dz <= gate2)
                 & (w[ROW_CNT] > 0.5) & vval)
        loglik = jnp.where(found, loglik, NEG)

        m_old = soft[_R_M, :]
        m_new = jnp.maximum(m_old, loglik)
        mn_safe = jnp.maximum(m_new, 0.5 * NEG)
        resc = jnp.exp(m_old - mn_safe)
        p = jnp.where(found, jnp.exp(loglik - mn_safe), 0.0)

        t0 = i0 * x + i3 * y + i4 * z                  # Sigma^{-1} x
        t1 = i3 * x + i1 * y + i5 * z
        t2 = i4 * x + i5 * y + i2 * z
        soft[_R_M:_R_M + 1, :] = m_new[None]
        soft[_R_S:_R_S + 1, :] = (soft[_R_S, :] * resc + p)[None]
        for j, ij in enumerate((i0, i1, i2, i3, i4, i5)):
            soft[_R_A + j:_R_A + j + 1, :] = (
                soft[_R_A + j, :] * resc + p * ij)[None]
        for j, tj in enumerate((t0, t1, t2)):
            soft[_R_B + j:_R_B + j + 1, :] = (
                soft[_R_B + j, :] * resc + p * tj)[None]
        soft[_R_C:_R_C + 1, :] = (
            soft[_R_C, :] * resc + p * (x * t0 + y * t1 + z * t2))[None]

    def body(c, run_k):
        slot = c % 2

        @pl.when(c + 1 < cnt)
        def _():
            tile_dma((c + 1) % 2, c + 1).start()

        tile_dma(slot, c).wait()
        t = slab[slot]                                 # (16, tb)
        d2 = (vq2[:, None] + t[ROW_T2][None, :]
              - 2.0 * vqx[:, None] * t[0][None, :]
              - 2.0 * vqy[:, None] * t[1][None, :]
              - 2.0 * vqz[:, None] * t[2][None, :])    # (qb, tb)
        lab = t[ROW_LAB][None, :]

        def class_pass(k, run_k):
            changed = k != run_k

            @pl.when(changed & (run_k >= 0))
            def _():
                flush_run(run_k)

            @pl.when(changed)
            def _():
                run_d2[:] = jnp.full_like(run_d2, INF)
                run_attr[:] = jnp.zeros_like(run_attr)

            dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
            m = jnp.min(dk, axis=1)                    # (qb,) exact f32 min
            better = m[None, :] < run_d2[:]
            improved = jnp.max(better.astype(jnp.int32)) > 0

            @pl.when(improved if guard else improved | True)
            def _():
                onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
                sel = jax.lax.dot_general(
                    t, onehot, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # (NATTR, qb)
                sel = sel * (1.0 / jnp.maximum(sel[ROW_CNT, :], 1.0))[None, :]
                run_d2[:] = jnp.where(better, m[None, :], run_d2[:])
                run_attr[:] = jnp.where(better, sel, run_attr[:])

            return k

        tid = cand_ref[i, c]
        return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1,
                                 class_pass, run_k)

    run_k = jax.lax.fori_loop(0, cnt, body, jnp.int32(-1))

    @pl.when(run_k >= 0)
    def _():
        flush_run(run_k)

    s = soft[_R_S, :]
    inv_s = jnp.where(s > 0.0, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    a_out[:] = soft[_R_A:_R_A + 6, :] * inv_s[None, :]
    b_out[:] = soft[_R_B:_R_B + 3, :] * inv_s[None, :]
    cw_out[0:1, :] = (soft[_R_C, :] * inv_s)[None]
    cw_out[1:2, :] = jnp.where(s > 0.0, 1.0, 0.0)[None]


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "qb", "interpret", "guard"))
def estep_sparse_fused(prep: dict, q_xyz, q_valid, rc6, log_sem,
                       num_classes: int, gate, qb: int = QB,
                       interpret: bool = False, guard: bool = True):
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
    # TILE-ID order: the run-accumulator/flush invariant (classes of
    # successive candidates non-decreasing). The cap drops the highest
    # tile ids; never binds below ~0.5M-point targets.
    cand, count, _ = tile_candidates(qlo, qhi, prep["lo"], prep["hi"], gate,
                                     n_cap=cap if cap < n_tt else None,
                                     by_tid=True)

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
            pltpu.VMEM((1, qb), jnp.float32),          # run winner d2
            pltpu.VMEM((NATTR, qb), jnp.float32),      # run winner attrs
            pltpu.VMEM((_NSOFT, qb), jnp.float32),     # online softmax state
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    a6, b3, cw = pl.pallas_call(
        functools.partial(_fused_kernel, qb=qb, tb=tb, guard=guard),
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
