"""Fused per-class NN — sorted tiles + in-kernel attribute selection.

Kernel evolution driven by v5e traces of the full EM loop (the v1
kernel this replaced ran K min/argmin passes over every distance tile,
~(3+6K) VPU ops/candidate -> 5.6 ms per E-step at 8k x 8k, K=8):

1. The target is sorted ONCE per align (it is loop-invariant) — by
   class for the dense kernel, so each target tile spans only 1-2
   classes; per-tile class ranges [cmin_j, cmax_j] arrive via scalar
   prefetch and gate each class pass with @pl.when — real branches,
   absent classes cost nothing. Expected passes/tile ~ 1 + (K-1)/n_tiles.

2. The winner-attribute gather afterwards (9 planes x (K,N) indices)
   ran on XLA's scalar-gather path (~4.2 ms/iteration). Here the
   kernel selects the winner's 16-float attribute row (x,y,z,cov6,pad)
   *inside the tile* with a one-hot MXU matmul
       attrs (16,tb) . onehot^T (qb,tb) -> (16,qb)
   and carries the best row per class in VMEM scratch — the EM loop
   then contains no gathers at all.

Outputs per class: exact min distance (expanded-form, see
bruteforce.py's cancellation note) and the winner's attribute rows.
Winner indices stay internal to the sorted order and are not exposed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e37

QB = 256
TB = 1024
NATTR = 16   # x, y, z, cov6(6), ones, 6 spare — fixed row count for MXU layout
ROW_CNT = 9  # all-ones attr row: winner count under value-equality one-hot
             # (normalizes exact ties in the sparse kernel; 1.0 = found)


def _kernel(cmin_ref, cmax_ref, qx, qy, qz, q2, tx, ty, tz, t2, tlab, attrs,
            out_d2, out_attr, acc_d2, acc_attr, *, num_classes, qb, tb):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_d2[:] = jnp.full_like(acc_d2, INF)
        acc_attr[:] = jnp.zeros_like(acc_attr)

    vqx, vqy, vqz, vq2 = qx[0, :], qy[0, :], qz[0, :], q2[0, :]
    vtx, vty, vtz, vt2 = tx[0, :], ty[0, :], tz[0, :], t2[0, :]
    d2 = (vq2[:, None] + vt2[None, :]
          - 2.0 * vqx[:, None] * vtx[None, :]
          - 2.0 * vqy[:, None] * vty[None, :]
          - 2.0 * vqz[:, None] * vtz[None, :])        # (qb, tb)
    lab = tlab[0, :][None, :]                          # (1, tb)
    col = jax.lax.broadcasted_iota(jnp.int32, (qb, tb), 1)

    cmin = cmin_ref[j]
    cmax = cmax_ref[j]

    for k in range(num_classes):                       # static unroll, predicated
        @pl.when((cmin <= k) & (k <= cmax))
        def _(k=k):
            dk = jnp.where(lab == k, d2, INF)
            m = jnp.min(dk, axis=1)                    # (qb,)
            a = jnp.argmin(dk, axis=1)                 # (qb,)
            onehot = (col == a[:, None]).astype(jnp.float32)
            sel = jax.lax.dot_general(
                attrs[:, :], onehot,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # (NATTR, qb)
            better = m < acc_d2[k, :]
            acc_d2[k, :] = jnp.where(better, m, acc_d2[k, :])
            # acc_attr is (K, NATTR, qb): [k] is a contiguous major-dim
            # slice — middle-dim indexing of (NATTR, K, qb) forced
            # sublane-strided relayouts (measured 2x slower kernel)
            acc_attr[k] = jnp.where(better[None, :], sel, acc_attr[k])

    @pl.when(j == nj - 1)
    def _():
        out_d2[:] = acc_d2[:]
        out_attr[:] = acc_attr[:]


@functools.partial(jax.jit, static_argnames=("num_classes", "qb", "tb", "interpret"))
def class_nn_attrs_pallas(tgt_xyz_s, tgt_label_s, attrs16, q_xyz,
                          num_classes: int, qb: int = QB, tb: int = TB,
                          interpret: bool = False):
    """Per-class NN with fused attribute selection.

    tgt_xyz_s:   (3, N) target coordinate planes, SORTED by class
                 (invalid/padded points sorted last with label >= K)
    tgt_label_s: (N,) sorted labels; invalid rows must hold >= num_classes
    attrs16:     (16, N) attribute rows aligned to the sorted order
    q_xyz:       (3, Q) query planes

    Returns (d2 (K, Q) — INF where a class has no target, attrs
    (K, 16, Q) — the winner's attribute rows, zeros where none).
    """
    n = tgt_xyz_s.shape[1]
    q = q_xyz.shape[1]
    qb = min(qb, q)
    tb = min(tb, n)
    K = num_classes
    # fail loudly: a non-multiple Q/N would silently drop the last
    # partial grid tile AND force Mosaic onto a catastrophically slow
    # unaligned-lane path (measured ~2000x at Q=117964)
    assert q % qb == 0, f"class_nn_attrs_pallas: Q={q} not a multiple of qb={qb}"
    assert n % tb == 0, f"class_nn_attrs_pallas: N={n} not a multiple of tb={tb}"

    tx, ty, tz = tgt_xyz_s[0], tgt_xyz_s[1], tgt_xyz_s[2]
    t2 = tx * tx + ty * ty + tz * tz
    qx, qy, qz = q_xyz[0], q_xyz[1], q_xyz[2]
    q2 = qx * qx + qy * qy + qz * qz

    # per-tile class ranges from the sorted labels (invalid rows >= K
    # make cmin > cmax for all-invalid tiles -> every class pass skips)
    tiles = tgt_label_s.reshape(-1, tb)
    cmax = jnp.max(jnp.where(tiles < K, tiles, -1), axis=1).astype(jnp.int32)
    cmin = jnp.min(jnp.where(tiles < K, tiles, K), axis=1).astype(jnp.int32)

    grid = (q // qb, n // tb)
    qspec = pl.BlockSpec((1, qb), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, tb), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM)
    aspec = pl.BlockSpec((NATTR, tb), lambda i, j, *_: (0, j), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[qspec] * 4 + [tspec] * 5 + [aspec],
        out_specs=(
            pl.BlockSpec((K, qb), lambda i, j, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NATTR, qb), lambda i, j, *_: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, qb), jnp.float32),
            pltpu.VMEM((K, NATTR, qb), jnp.float32),
        ],
    )

    out_d2, out_attr = pl.pallas_call(
        functools.partial(_kernel, num_classes=K, qb=qb, tb=tb),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, q), jnp.float32),
            jax.ShapeDtypeStruct((K, NATTR, q), jnp.float32),
        ),
        interpret=interpret,
    )(
        cmin, cmax,
        qx[None], qy[None], qz[None], q2[None],
        tx[None], ty[None], tz[None], t2[None], tgt_label_s[None],
        attrs16,
    )
    return out_d2, out_attr


def sort_cloud_by_class(xyz, label, cov6, valid, num_classes: int):
    """Sort target arrays by class (invalid last). Returns
    (xyz_s (3,N), label_s (N,) with invalid = num_classes, attrs16 (16,N))."""
    key = jnp.where(valid, jnp.maximum(label, 0), num_classes)
    order = jnp.argsort(key)
    xyz_s = jnp.take(xyz, order, axis=1)
    cov6_s = jnp.take(cov6, order, axis=1)
    label_s = jnp.take(key, order).astype(jnp.int32)
    n = xyz.shape[1]
    ones = jnp.ones((1, n), jnp.float32)
    pad = jnp.zeros((NATTR - 10, n), jnp.float32)
    attrs16 = jnp.concatenate([xyz_s, cov6_s, ones, pad], axis=0)
    return xyz_s, label_s, attrs16


ROW_T2 = 10   # |x|^2 row — rides in the attr slab so the sparse kernel
ROW_LAB = 11  # DMAs ONE (16, tb) tile per candidate (label as float32,
              # exact for class ids; invalid rows hold num_classes)


def prepare_sparse(cloud, num_classes: int, cell: float, tb: int = TB) -> dict:
    """Loop-invariant prep of a cm-sorted target for the sparse kernel.

    The cloud must already be in canonical class-major Morton layout
    (corr.layout.sort_cloud_cm — applied once at preprocess time; this
    function sorts only if handed a raw cloud). Returns xyz_s (3,N),
    label_s (N,) int32 (invalid = num_classes), attrs16 (16,N) with
    x,y,z | cov6 | ones | |x|^2 | label packed row-wise (one DMA slab
    per tile), and the per-tile metadata lo/hi (n_tt,3) + cmin/cmax.
    """
    from semicp.corr.layout import LAYOUT_CM, sort_cloud_cm, tile_meta

    if cloud.layout != LAYOUT_CM:
        cloud = sort_cloud_cm(cloud, num_classes, cell)
    n = cloud.n_pad
    tb = min(tb, n)
    assert n % tb == 0, (
        f"prepare_sparse: N={n} must be a multiple of the target tile "
        f"tb={tb} (pad the cloud to a power of two >= {tb})")
    label_s = jnp.where(cloud.valid, jnp.maximum(cloud.label, 0),
                        num_classes).astype(jnp.int32)
    ones = jnp.ones((1, n), jnp.float32)
    t2 = jnp.sum(cloud.xyz * cloud.xyz, axis=0, keepdims=True)
    pad = jnp.zeros((NATTR - 12, n), jnp.float32)
    attrs16 = jnp.concatenate(
        [cloud.xyz, cloud.cov6, ones, t2, label_s[None].astype(jnp.float32),
         pad], axis=0)
    meta = tile_meta(cloud.xyz, cloud.label, cloud.valid, num_classes, tb)
    return {"xyz_s": cloud.xyz, "label_s": label_s, "attrs16": attrs16, **meta}


def _sparse_kernel(cand_ref, count_ref, cmin_ref, cmax_ref,
                   qxyz, q2, attrs_hbm,
                   out_d2, out_attr, slab, sem, *, qb, tb, num_classes,
                   guard=True, stage=0, merge="plane"):
    """Query-stationary block-sparse NN.

    One grid program per query tile; an inner fori_loop walks ONLY that
    tile's candidate target tiles, double-buffering each (16, tb) attr
    slab HBM->VMEM. The v2 design ran a dense (n_qt, n_tt) grid with
    pruned programs predicated off — at 120k points, ~60k no-op
    programs' fixed grid overhead dominated (55 ms/call). v3 walked
    candidates nearest-box-first at ~9.4 us per candidate tile pair.
    v4 (merge="rmw", kept for kbench) guarded the winner-select with a
    skip-if-no-improvement @pl.when around pl.ds-indexed RMW merges:
    36.8 ms at the bench workload, ~27 ms of it in that cluster.

    v5 (merge="twophase", the product path) comes from one more ladder
    step that finally attributed the cluster: a pure min-ACCUMULATE
    plane merge (`out[:] = minimum(out[:], upd)`) costs ~0.2 us/pass —
    BELOW the old stage-1 floor — while ANY read-then-compare of the
    accumulator (`m < out_d2[:]`, or the guarded pl.ds RMW) pays a
    serialized VMEM round trip of ~2-4 us/pass. The fix is structural:
    never read-compare. Two passes over the candidate list:

    * Phase 1 walks candidates accumulating per-class minima into the
      (K, qb) plane with jnp.minimum only (7.1 ms incl. DMA at the
      bench workload).
    * Phase 2 re-walks (re-DMA — DMA is issue-bound, ~3 ms, and
      overlapped), rebuilds each tile's local minima, and gates the
      one-hot select by `local min <= final best` — a branchless
      full-plane compare against a loop-carried copy of the FINAL
      minima read once. Winner rows accumulate ADDITIVELY (cross-tile
      contributions are disjoint except exact ties, which sum and are
      averaged by a single end normalization via ROW_CNT).
    * The select matmul runs as a bf16x3 split in f32 containers at
      DEFAULT precision (3 MXU passes, lossless for bf16-representable
      terms); HIGHEST's 6-pass f32 emulation costs +2.9 ms (stage 15).

    Bench workload (quiet v5e, 120k pts / 20 classes / ~5062 candidate
    pairs): 16.8 ms/call vs v4's 36.8 — and the guard, the pl.ds RMW,
    and the @pl.when conditionals are gone entirely from the product
    path. Measured and rejected across v4/v5: MXU f32-HIGHEST distance
    tiles (+6.6 ms), run-accumulator merge (+4.7 ms), static-K unroll
    (279 ms), qb=512 (+4 ms), tb=2048 (+7 ms), full-plane merge with
    read-compare `better` masks (merge="plane": 32.9 ms).
    """
    i = pl.program_id(0)
    cnt = count_ref[i]
    out_d2[:] = jnp.full_like(out_d2, INF)
    out_attr[:] = jnp.zeros_like(out_attr)

    def tile_dma(slot, c):
        tid = cand_ref[i, c]
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(tid * tb, tb)], slab.at[slot], sem.at[slot])

    @pl.when(cnt > 0)
    def _():
        tile_dma(0, 0).start()

    vqx, vqy, vqz = qxyz[0, :], qxyz[1, :], qxyz[2, :]
    vq2 = q2[0, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_classes, qb), 0)

    if merge == "twophase":
        # r5 product path, shaped by this round's attribution ladder:
        # a pure min-ACCUMULATE plane merge costs ~0.2 us/pass (Mosaic
        # pipelines it; stage-8 probe ran at 7.1 ms, under the stage-1
        # floor), while ANY pattern that reads the accumulator and
        # compares (`m < out_d2[:]`, or the old guarded pl.ds RMW)
        # pays a serialized VMEM round trip of ~2-4 us/pass — that was
        # the r4 kernel's entire ~27 ms overhead. So: two passes over
        # the candidate list, neither of which ever read-compares.
        #   Phase 1: d2-only walk, per-class minima merged with
        #            jnp.minimum into the (K, qb) plane.
        #   Phase 2: out_d2 is FINAL; re-DMA each tile, rebuild its
        #            local minima, and gate the one-hot select by
        #            `m <= best[k]` (a lane-wise scalar-free compare).
        #            Winner rows accumulate ADDITIVELY — contributions
        #            from different tiles are disjoint except exact
        #            cross-tile ties, which sum and are averaged by the
        #            single end normalization (ROW_CNT carries the
        #            total tie count).
        def body1(c, carry):
            slot = c % 2

            @pl.when(c + 1 < cnt)
            def _():
                tile_dma((c + 1) % 2, c + 1).start()

            tile_dma(slot, c).wait()
            t = slab[slot]
            d2 = (vq2[:, None] + t[ROW_T2][None, :]
                  - 2.0 * vqx[:, None] * t[0][None, :]
                  - 2.0 * vqy[:, None] * t[1][None, :]
                  - 2.0 * vqz[:, None] * t[2][None, :])
            lab = t[ROW_LAB][None, :]

            def p1(k, carry):
                dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
                m = jnp.min(dk, axis=1)
                upd = jnp.where(rows == k, m[None, :], INF)
                out_d2[:] = jnp.minimum(out_d2[:], upd)
                return carry

            tid = cand_ref[i, c]
            return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1,
                                     p1, carry)

        jax.lax.fori_loop(0, cnt, body1, jnp.int32(0))

        if stage == 11:                     # attribution: phase 1 only
            cntrow = out_attr[:, ROW_CNT, :]
            recip = 1.0 / jnp.maximum(cntrow, 1.0)
            out_attr[:, :10, :] = out_attr[:, :10, :] * recip[:, None, :]
            out_attr[:, 10:, :] = jnp.zeros_like(out_attr[:, 10:, :])
            return

        @pl.when(cnt > 0)
        def _():
            tile_dma(0, 0).start()          # restart pipeline for phase 2

        bestall = out_d2[:]                 # ONE read of the final minima;
                                            # rides the fori carry so phase
                                            # 2 never touches out_d2 again

        def body2(c, bestall):
            slot = c % 2

            @pl.when(c + 1 < cnt)
            def _():
                tile_dma((c + 1) % 2, c + 1).start()

            tile_dma(slot, c).wait()
            t = slab[slot]
            d2 = (vq2[:, None] + t[ROW_T2][None, :]
                  - 2.0 * vqx[:, None] * t[0][None, :]
                  - 2.0 * vqy[:, None] * t[1][None, :]
                  - 2.0 * vqz[:, None] * t[2][None, :])
            lab = t[ROW_LAB][None, :]

            def p2(k, bestall):
                dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
                m = jnp.min(dk, axis=1)                # identical arith to p1
                # winner gate fused into one (K, qb) plane: row k where
                # this tile's local min equals the global best (<= since
                # m >= best always), other rows masked by upd == INF
                upd = jnp.where(rows == k, m[None, :], INF)
                win = jnp.where((upd <= bestall) & (rows == k), 1.0, 0.0)
                onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
                if stage == 13:  # attribution: skip the select matmul
                    sel = t[:, 0:qb] + onehot[0:NATTR, 0:qb]
                elif stage == 15:  # attribution: HIGHEST 6-pass emulation
                    sel = jax.lax.dot_general(
                        t, onehot,
                        (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )                                  # (NATTR, qb)
                else:
                    # bf16x3 split (corr.mxu): 3 lossless MXU passes vs
                    # HIGHEST's 6-pass f32 emulation (-2.9 ms, stage 15).
                    # Precision is pinned in the helper so the caller's
                    # matmul-precision context (em_icp traces under
                    # "highest") cannot silently double the MXU work.
                    from semicp.corr.mxu import dot_f32x3
                    sel = dot_f32x3(t, onehot, (((1,), (1,)), ((), ())))
                out_attr[:] = out_attr[:] + win[:, None, :] * sel[None]
                return bestall

            tid = cand_ref[i, c]
            return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1,
                                     p2, bestall)

        jax.lax.fori_loop(0, cnt, body2, bestall)

        # exact-tie averaging, once per program (see class_pass "plane")
        cntrow = out_attr[:, ROW_CNT, :]
        recip = 1.0 / jnp.maximum(cntrow, 1.0)
        out_attr[:, :10, :] = out_attr[:, :10, :] * recip[:, None, :]
        out_attr[:, 10:, :] = jnp.zeros_like(out_attr[:, 10:, :])
        return

    def body(c, carry):
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
        lab = t[ROW_LAB][None, :]                      # float class ids

        # cost-attribution ladder for scripts/kbench.py (stage=0 is the
        # product path; stubs produce WRONG results by design):
        #   1: skip winner-select matmul + merge   2: skip the class
        #   loop (one unmasked min)                3: DMA + loop only
        if stage == 3:
            out_d2[0:1, :] = jnp.minimum(out_d2[0:1, :], t[0:1, 0:qb])
            return carry
        if stage == 2:
            m = jnp.min(d2, axis=1)
            out_d2[0:1, :] = jnp.minimum(out_d2[0:1, :], m[None, :])
            return carry
        if stage == 1:
            def cheap_pass(k, carry):
                dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
                m = jnp.min(dk, axis=1)
                onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
                out_d2[0:1, :] = jnp.minimum(
                    out_d2[0:1, :], m[None, :] + onehot[:, 0][None, :])
                return carry
            tid0 = cand_ref[i, c]
            return jax.lax.fori_loop(cmin_ref[tid0], cmax_ref[tid0] + 1,
                                     cheap_pass, carry)

        # Class-major sort makes a tile's classes the contiguous range
        # [cmin, cmax] (usually one class) — a DYNAMIC loop over that
        # range keeps cost and compile time independent of K.
        if merge == "plane":
            # r5 branchless merge: the r4 ladder attributed ~27 ms of the
            # 36.8 ms call to the guarded select/merge cluster (~3.5-7 us
            # per EXECUTED pass of @pl.when + pl.ds RMW machinery,
            # resistant to every layout tried). This variant removes the
            # conditional and the dynamic slices entirely: winners merge
            # into the FULL (K, qb) / (K, NATTR, qb) planes with a
            # row-mask select — ~82k lane-aligned VPU elements, well
            # under the fixed cost of the branch+dynamic-slice cluster.
            # Tie normalization (ROW_CNT) happens ONCE after the
            # candidate loop: the merge REPLACES rows (never
            # accumulates), so the final rows are plain sums of exact-
            # tie winners and a single end normalization is equivalent.
            def class_pass(k, carry):
                dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
                m = jnp.min(dk, axis=1)                # (qb,) exact f32 min
                if stage == 7:  # attribution: fixed-row d2 merge only
                    onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
                    out_d2[0:1, :] = jnp.minimum(
                        out_d2[0:1, :], m[None, :] + onehot[:, 0][None, :])
                    return carry
                if stage == 8:  # attribution: plane merge via pure minimum
                    upd = jnp.where(rows == k, m[None, :], INF)
                    out_d2[:] = jnp.minimum(out_d2[:], upd)
                    return carry
                if stage == 9:  # attribution: plane read+compare, row write
                    bet = (rows == k) & (m[None, :] < out_d2[:])
                    out_d2[0:1, :] = jnp.minimum(
                        out_d2[0:1, :],
                        m[None, :] + bet[0:1, :].astype(jnp.float32))
                    return carry
                better = (rows == k) & (m[None, :] < out_d2[:])  # (K, qb)
                onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
                if stage == 4:      # attribution: skip the select matmul
                    sel = t[:, 0:qb] + onehot[0:NATTR, 0:qb]
                else:
                    sel = jax.lax.dot_general(
                        t, onehot,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                  # (NATTR, qb)
                out_d2[:] = jnp.where(better, m[None, :], out_d2[:])
                if stage != 5:      # attribution: 5 = skip attr merge
                    out_attr[:] = jnp.where(
                        better[:, None, :], sel[None], out_attr[:])
                return carry

            tid = cand_ref[i, c]
            return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1,
                                     class_pass, carry)

        def class_pass(k, carry):
            dk = jnp.where(lab == k.astype(jnp.float32), d2, INF)
            # m is always finite: class k has >= 1 valid column in this
            # tile (cmin/cmax are computed over valid labels only)
            m = jnp.min(dk, axis=1)                    # (qb,) exact f32 min
            prev = out_d2[pl.ds(k, 1), :]              # (1, qb)
            better = m[None, :] < prev
            improved = jnp.max(better.astype(jnp.int32)) > 0

            # nearest-box-first: most queries settle on their class's
            # first candidate, so later passes often improve NOTHING
            # and the whole select/merge is skipped
            @pl.when(improved if guard else improved | True)
            def _():
                # winner one-hot by VALUE equality (no argmin — its
                # Mosaic lowering measured ~29 us/pass); wrong-class
                # columns sit at INF > m so no (dk < INF) gate is
                # needed; exact ties average via the all-ones attr row
                # (ROW_CNT) normalizer
                onehot = jnp.where(dk == m[:, None], 1.0, 0.0)
                sel = jax.lax.dot_general(
                    t, onehot,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # (NATTR, qb)
                sel = sel * (1.0 / jnp.maximum(sel[ROW_CNT, :], 1.0))[None, :]
                out_d2[pl.ds(k, 1), :] = jnp.where(better, m[None, :], prev)
                preva = out_attr[pl.ds(k, 1), :, :]    # (1, NATTR, qb)
                out_attr[pl.ds(k, 1), :, :] = jnp.where(
                    better[:, None, :], sel[None], preva)

            return carry

        tid = cand_ref[i, c]
        return jax.lax.fori_loop(cmin_ref[tid], cmax_ref[tid] + 1,
                                 class_pass, carry)

    jax.lax.fori_loop(0, cnt, body, jnp.int32(0))

    if merge == "plane" and stage in (0, 4):
        # exact-tie averaging, hoisted out of the per-pass loop: each
        # winning row is the un-normalized sum over value-equal ties,
        # with ROW_CNT holding the tie count (then 1.0 = found)
        cntrow = out_attr[:, ROW_CNT, :]               # (K, qb)
        recip = 1.0 / jnp.maximum(cntrow, 1.0)
        out_attr[:, :10, :] = out_attr[:, :10, :] * recip[:, None, :]

    # contract: attr rows beyond the 10 (xyz, cov6, found) are zero —
    # the slab's t2/label transport rows must not leak to consumers
    out_attr[:, 10:, :] = jnp.zeros_like(out_attr[:, 10:, :])


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "qb", "interpret",
                                    "guard", "stage", "merge"))
def class_nn_attrs_sparse(prep: dict, q_xyz, q_valid, num_classes: int,
                          gate, qb: int = QB, interpret: bool = False,
                          guard: bool = True, stage: int = 0,
                          merge: str = "twophase"):
    """Block-sparse per-class NN: class-major Morton tiles + AABB pruning.

    Same contract as `class_nn_attrs_pallas` for every correspondence
    within `gate` of its query (beyond the gate both report INF-or-
    rejected; the E-step gates there anyway). prep comes from
    `prepare_sparse`. Queries should be cm/Morton-sorted so query tiles
    cover compact regions (what makes AABB pruning bite); exactness does
    not depend on it. Replaces the reference's per-class kd-tree query
    (SURVEY.md §2.1 "Per-class kd-tree NN search") with an
    O(N * tiles-in-gate) data-layout kernel. `gate` is a runtime scalar.
    """
    from semicp.corr.layout import tile_candidates
    from semicp.corr.morton import tile_aabbs

    # the stage != 0 attribution stubs produce WRONG results by design
    # (see _sparse_kernel); only the kbench harness may reach them
    import os
    assert stage == 0 or os.environ.get("SEMICP_KBENCH") == "1", (
        f"class_nn_attrs_sparse: stage={stage} is a kbench-only "
        "attribution stub (set SEMICP_KBENCH=1 to run it deliberately)")

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
        f"class_nn_attrs_sparse: Q={q} must be a multiple of the query "
        f"block qb={qb} (pad queries to a power of two >= {qb})")
    tb = n // prep["lo"].shape[0]         # static: tile size from prep shapes
    assert n % tb == 0, f"prep tile metadata inconsistent: N={n}, tb={tb}"
    K = num_classes

    qlo, qhi = tile_aabbs(q_xyz, q_valid, qb)
    # the candidate lists ride in scalar-prefetch SMEM (1 MB total): at
    # map scale the uncapped (n_qt, n_tt) matrix overflows it, so cap
    # candidates per query tile, budgeting ~256 KB. Nearest-box-first
    # ordering means a binding cap drops the FARTHEST boxes — at the
    # default gate the cap never binds below ~0.5M-point maps (bench
    # scale: n_tt=128 < cap=128)
    n_tt = prep["lo"].shape[0]
    n_qt = q // qb
    # budget 56K entries with a floor of 24: at 512k queries
    # (n_qt=2048) the old 64K-entry/floor-32 formula left the kernel
    # 13 KB over the 1 MB SMEM cap (measured r5); 24 candidates/tile
    # still never bind at sane densities (bench avg ~11 boxes in gate)
    cap = min(n_tt, max(24, (56 * 1024) // max(n_qt, 1)))
    # nearest-box-first: maximizes the kernel's skip-if-no-improvement
    # guard hit rate (see _sparse_kernel)
    cand, count, _ = tile_candidates(qlo, qhi, prep["lo"], prep["hi"], gate,
                                     n_cap=cap if cap < n_tt else None)

    q2 = jnp.sum(q_xyz * q_xyz, axis=0, keepdims=True)                  # (1,Q)

    grid = (q // qb,)
    qspec = pl.BlockSpec((3, qb), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    q2spec = pl.BlockSpec((1, qb), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    # the packed attr planes stay in HBM; the kernel DMAs only the
    # candidate tiles it actually visits
    aspec = pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[qspec, q2spec, aspec],
        out_specs=(
            pl.BlockSpec((K, qb), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, NATTR, qb), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NATTR, tb), jnp.float32),   # double-buffered slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out_d2, out_attr = pl.pallas_call(
        functools.partial(_sparse_kernel, qb=qb, tb=tb, num_classes=K,
                          guard=guard, stage=stage, merge=merge),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((K, q), jnp.float32),
            jax.ShapeDtypeStruct((K, NATTR, q), jnp.float32),
        ),
        interpret=interpret,
    )(
        cand, count, prep["cmin"], prep["cmax"],
        q_xyz, q2, prep["attrs16"],
    )
    return out_d2, out_attr

def class_nn_attrs_xla(tgt_xyz, tgt_label, tgt_valid, tgt_cov6, q_xyz, num_classes: int):
    """XLA fallback with the same contract (CPU mesh / tests)."""
    from semicp.corr.bruteforce import class_nn

    idx, d2 = class_nn(tgt_xyz, jnp.maximum(tgt_label, 0),
                       tgt_valid, q_xyz, num_classes)
    n = tgt_xyz.shape[1]
    flat = jnp.concatenate(
        [tgt_xyz.reshape(-1), tgt_cov6.reshape(-1),
         jnp.ones((n,), jnp.float32),
         jnp.zeros(((NATTR - 10) * n,), jnp.float32)]
    )
    offs = jnp.arange(NATTR, dtype=jnp.int32)[None, :, None] * n
    attrs = jnp.take(flat, idx[:, None] + offs)        # (K, 16, Q)
    attrs = jnp.where((d2 < INF)[:, None], attrs, 0.0)
    return d2, attrs
