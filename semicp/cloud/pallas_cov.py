"""Fused moment-covariance kernel — radius-neighborhood GICP covariances.

Preprocessing redesign (SURVEY.md §3.4) driven by v5e measurements: the
kNN path (full-row distances + top_k + neighbor gathers) costs ~20 ms at
8k points and scales O(N^2) with expensive sort machinery. This kernel
computes, in ONE streaming pass over distance tiles, the ten masked
moments of each point's neighborhood

    n, Sx, Sy, Sz, Sxx, Syy, Szz, Sxy, Sxz, Syz
    (mask = same class & dist < radius & valid)

from which the empirical covariance follows in a cheap XLA epilogue
(C = S2/n - mean mean^T, then the rank-1 GICP clamp, sym3.regularize).

Semantics note: the reference uses k=20 nearest neighbors; this uses a
fixed radius. After the (1,1,eps) eigenvalue clamp only the eigenvector
frame survives, and on locally planar/structured geometry both
neighborhoods estimate the same frame — the numpy oracle supports both
(OracleParams.cov_method) so parity is tested like-for-like.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 256
TB = 1024
NMOM = 10


def _kernel(r2_ref, qx, qy, qz, q2, qlab, tx, ty, tz, t2, tlab,
            out_ref, acc, *, qb, tb):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    r2 = r2_ref[0, 0]
    vqx, vqy, vqz, vq2 = qx[0, :], qy[0, :], qz[0, :], q2[0, :]
    vtx, vty, vtz, vt2 = tx[0, :], ty[0, :], tz[0, :], t2[0, :]
    d2 = (vq2[:, None] + vt2[None, :]
          - 2.0 * vqx[:, None] * vtx[None, :]
          - 2.0 * vqy[:, None] * vty[None, :]
          - 2.0 * vqz[:, None] * vtz[None, :])          # (qb, tb)
    m = (d2 < r2) & (qlab[0, :][:, None] == tlab[0, :][None, :])
    w = m.astype(jnp.float32)

    x = vtx[None, :]
    y = vty[None, :]
    z = vtz[None, :]
    acc[0, :] += jnp.sum(w, axis=1)
    acc[1, :] += jnp.sum(w * x, axis=1)
    acc[2, :] += jnp.sum(w * y, axis=1)
    acc[3, :] += jnp.sum(w * z, axis=1)
    acc[4, :] += jnp.sum(w * x * x, axis=1)
    acc[5, :] += jnp.sum(w * y * y, axis=1)
    acc[6, :] += jnp.sum(w * z * z, axis=1)
    acc[7, :] += jnp.sum(w * x * y, axis=1)
    acc[8, :] += jnp.sum(w * x * z, axis=1)
    acc[9, :] += jnp.sum(w * y * z, axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("qb", "tb", "interpret"))
def neighborhood_moments_pallas(xyz, label, valid, radius,
                                qb: int = QB, tb: int = TB,
                                interpret: bool = False):
    """(10, N) masked neighborhood moments of every point (self-inclusive).

    `radius` may be a python float or a traced scalar (the density-adaptive
    path, covariance.estimate_radius) — it enters the kernel via SMEM.
    """
    n = xyz.shape[1]
    qb = min(qb, n)
    tb = min(tb, n)
    tx, ty, tz = xyz[0], xyz[1], xyz[2]
    t2 = tx * tx + ty * ty + tz * tz
    lab = jnp.where(valid, label, -1).astype(jnp.int32)
    # invalid queries get label -2 so they never match anything (their
    # covariance falls back to identity via the count check)
    qlab = jnp.where(valid, label, -2).astype(jnp.int32)
    r2 = jnp.asarray(radius, jnp.float32).reshape(1, 1) ** 2

    grid = (n // qb, n // tb)
    sspec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((1, qb), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, tb), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((NMOM, qb), lambda i, j: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, qb=qb, tb=tb),
        grid=grid,
        in_specs=[sspec] + [qspec] * 5 + [tspec] * 5,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((NMOM, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NMOM, qb), jnp.float32)],
        interpret=interpret,
    )(r2, tx[None], ty[None], tz[None], t2[None], qlab[None],
      tx[None], ty[None], tz[None], t2[None], lab[None])
    return out


def neighborhood_moments_xla(xyz, label, valid, radius, qb: int = 512):
    """XLA fallback (CPU mesh / tests): same contract, tiled matmuls."""
    n = xyz.shape[1]
    qb = min(qb, n)
    tx, ty, tz = xyz[0], xyz[1], xyz[2]
    t2 = tx * tx + ty * ty + tz * tz
    lab = jnp.where(valid, label, -1).astype(jnp.int32)
    qlab_all = jnp.where(valid, label, -2).astype(jnp.int32)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    feats = jnp.stack([jnp.ones_like(tx), tx, ty, tz,
                       tx * tx, ty * ty, tz * tz,
                       tx * ty, tx * tz, ty * tz])       # (10, N)

    def block(args):
        bqx, bqy, bqz, bq2, blab = args
        d2 = (bq2[:, None] + t2[None, :]
              - 2.0 * (bqx[:, None] * tx[None, :]
                       + bqy[:, None] * ty[None, :]
                       + bqz[:, None] * tz[None, :]))
        w = ((d2 < r2) & (blab[:, None] == lab[None, :])).astype(jnp.float32)
        return jnp.einsum("qn,mn->mq", w, feats)

    blocks = (tx.reshape(-1, qb), ty.reshape(-1, qb), tz.reshape(-1, qb),
              t2.reshape(-1, qb), qlab_all.reshape(-1, qb))
    out = jax.lax.map(block, blocks)                     # (n/qb, 10, qb)
    return jnp.moveaxis(out, 1, 0).reshape(NMOM, n)


def _sparse_kernel(cand_ref, count_ref, ctr_ref, r2_ref,
                   qxyz, qlab, tslab_hbm, out_ref, slab, sem, *, qb, tb):
    """Candidate-walk moments (r5): one grid program per query tile, an
    inner fori over ONLY that tile's candidate tiles with double-
    buffered (8, tb) slab DMA, and a pure ADDITIVE accumulate into the
    output block. The previous design ran a dense (n_qt, n_cap) grid
    with pruned programs predicated off — at 131k points ~85% of the
    8192 programs were no-ops paying fixed grid overhead (the same v2
    pathology the NN kernel shed in r3)."""
    i = pl.program_id(0)
    cnt = count_ref[i]
    out_ref[:] = jnp.zeros_like(out_ref)

    def tile_dma(slot, c):
        tid = cand_ref[i, c]
        return pltpu.make_async_copy(
            tslab_hbm.at[:, pl.ds(tid * tb, tb)], slab.at[slot], sem.at[slot])

    @pl.when(cnt > 0)
    def _():
        tile_dma(0, 0).start()

    # Center both tiles on the query tile's AABB midpoint: moments of
    # centered coordinates keep Sxx ~ O(r^2) instead of O(40m^2), so
    # the f32 cov epilogue (S2/n - mean^2) loses no digits to
    # cancellation. Covariance is translation-invariant, so the
    # epilogue needs no un-centering.
    cx, cy, cz = ctr_ref[i, 0], ctr_ref[i, 1], ctr_ref[i, 2]
    qx, qy, qz = qxyz[0, :] - cx, qxyz[1, :] - cy, qxyz[2, :] - cz
    q2 = qx * qx + qy * qy + qz * qz                   # (qb,)
    vqlab = qlab[0, :]

    def body(c, carry):
        slot = c % 2

        @pl.when(c + 1 < cnt)
        def _():
            tile_dma((c + 1) % 2, c + 1).start()

        tile_dma(slot, c).wait()
        t = slab[slot]                                 # (8, tb)
        tx, ty, tz = t[0] - cx, t[1] - cy, t[2] - cz
        t2 = tx * tx + ty * ty + tz * tz               # (tb,)
        d2 = (q2[:, None] + t2[None, :]
              - 2.0 * qx[:, None] * tx[None, :]
              - 2.0 * qy[:, None] * ty[None, :]
              - 2.0 * qz[:, None] * tz[None, :])       # (qb, tb)
        w = jnp.where((d2 < r2_ref[0]) &
                      (vqlab[:, None] == t[3][None, :]), 1.0, 0.0)
        feats = jnp.concatenate([
            jnp.ones((1, tx.shape[0]), jnp.float32),
            tx[None], ty[None], tz[None],
            (tx * tx)[None], (ty * ty)[None], (tz * tz)[None],
            (tx * ty)[None], (tx * tz)[None], (ty * tz)[None],
        ], axis=0)                                     # (10, tb)
        # bf16x3 split (corr.mxu): centered coords keep every feats term
        # O(r^2 + tile^2)-small, and w is exact 0/1 — 3 lossless MXU
        # passes vs HIGHEST's 6-pass f32 emulation
        from semicp.corr.mxu import dot_f32x3
        out_ref[:] = out_ref[:] + dot_f32x3(
            feats, w, (((1,), (1,)), ((), ())))        # (10, qb)
        return carry

    jax.lax.fori_loop(0, cnt, body, jnp.int32(0))


@functools.partial(jax.jit,
                   static_argnames=("num_classes", "qb", "tb", "n_cap",
                                    "interpret"))
def neighborhood_moments_sparse(xyz, label, valid, radius, num_classes: int,
                                qb: int = QB, tb: int = 512, n_cap: int = 16,
                                interpret: bool = False):
    """Block-sparse masked neighborhood moments over a cm-sorted cloud.

    Requires canonical class-major Morton layout (corr.layout) so tile
    AABB + class-range pruning applies: candidate target tiles per query
    tile are the same-class tiles within `radius` (measured ~2-4 at
    KITTI density vs a 371 ms dense sweep of all of them). The grid's
    second dim is the static cap `n_cap`, nearest-box-first; overflow
    beyond it drops the FARTHEST tiles only (geometrically implausible
    at sane densities — would need > n_cap*tb same-class points within
    `radius` of one query tile).

    Returns (10, N) moments of per-query-tile CENTERED coordinates —
    identical covariances through the standard epilogue (translation
    invariance), NOT bitwise-equal raw moments.
    """
    from semicp.corr.layout import tile_meta, tile_candidates
    from semicp.corr.morton import tile_aabbs

    n = xyz.shape[1]
    qb = min(qb, n)
    tb = min(tb, n)
    assert n % qb == 0 and n % tb == 0, (
        f"moments_sparse: N={n} must be a multiple of qb={qb} and tb={tb}")

    # grid-length SMEM cap (see pallas_nn2): keep <= 1024 programs
    while n // qb > 1024 and qb < 512:
        qb *= 2
    if n // qb > 1024:
        raise ValueError(
            f"single-device grid of {n // qb} programs exceeds the ~1024-"
            "program SMEM bookkeeping cap (~1 KB/program, measured r5): "
            f"N={n} tops out at 524288 per device — shard the cloud over "
            "the mesh for larger maps")

    qmeta = tile_meta(xyz, label, valid, num_classes, qb)
    tmeta = tile_meta(xyz, label, valid, num_classes, tb)
    cand, count, _ = tile_candidates(
        qmeta["lo"], qmeta["hi"], tmeta["lo"], tmeta["hi"], radius,
        n_cap=n_cap,
        q_range=(qmeta["cmin"], qmeta["cmax"]),
        t_range=(tmeta["cmin"], tmeta["cmax"]),
    )
    ctr = 0.5 * (qmeta["lo"] + qmeta["hi"])
    ctr = jnp.where(jnp.isfinite(ctr), ctr, 0.0)       # all-invalid tiles
    r2 = (jnp.asarray(radius, jnp.float32) ** 2).reshape(1)

    # packed (8, N) target slab — one DMA per candidate tile: xyz rows,
    # float label row (exact for class ids; -1 = invalid), 4 pad rows
    tlab = jnp.where(valid, label, -1).astype(jnp.float32)
    qlab = jnp.where(valid, label, -2).astype(jnp.float32)
    tslab = jnp.concatenate(
        [xyz, tlab[None], jnp.zeros((4, n), jnp.float32)], axis=0)

    grid = (n // qb,)
    qspec = pl.BlockSpec((3, qb), lambda i, *_: (0, i), memory_space=pltpu.VMEM)
    qlspec = pl.BlockSpec((1, qb), lambda i, *_: (0, i), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[qspec, qlspec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NMOM, qb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, tb), jnp.float32),       # double-buffered slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_sparse_kernel, qb=qb, tb=tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NMOM, n), jnp.float32),
        interpret=interpret,
    )(cand, count, ctr, r2, xyz, qlab[None], tslab)
    return out


def neighborhood_moments_auto(xyz, label, valid, radius, num_classes=None,
                              layout: str = "raw"):
    """Dispatch: block-sparse kernel on cm-sorted clouds (TPU), dense
    Pallas otherwise; XLA fallback on CPU."""
    if jax.default_backend() == "cpu":
        return neighborhood_moments_xla(xyz, label, valid, radius)
    if layout == "cm" and num_classes is not None:
        return neighborhood_moments_sparse(xyz, label, valid, radius,
                                           num_classes)
    return neighborhood_moments_pallas(xyz, label, valid, radius)
