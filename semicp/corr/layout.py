"""Canonical cloud layout: class-major + Morton-within-class sort.

The TPU substitute for BOTH of the reference's spatial structures —
per-class FLANN kd-trees (expected usage in semantic_icp.hpp, SURVEY.md
§2.1 row "Per-class kd-tree NN search") and the per-point kNN pass of
covariance estimation (SURVEY.md §2.2 step 1) — is one data layout:

  sort points by (class, Morton code), invalid last.

Consequences the kernels exploit:
  * Within any fixed-size tile of the sorted array, labels are
    NON-DECREASING, so a tile's classes form the contiguous range
    [cmin, cmax] (usually a single class; 2+ only at class boundaries).
    The block-sparse NN kernel loops over exactly that range — no
    K-wide static unroll, compile cost and run cost independent of the
    class count.
  * Each tile covers a compact region OF ONE CLASS, so per-tile AABBs
    prune by the correspondence gate (NN) or by radius + class-range
    overlap (covariance) — the O(N^2) -> O(N * c) move with zero
    pointers and fully static shapes.

Sorting happens ONCE per cloud at preprocess time (covariance
estimation shares the layout), marked by `Cloud.layout == "cm"`; align
then skips its own per-align sorts. The sort composes two stable
argsort passes (Morton, then class) because 20 classes x 30 Morton bits
does not fit an int32 key and TPUs have no int64.
"""

from __future__ import annotations

import jax.numpy as jnp

from semicp.cloud.cloud import Cloud
from semicp.corr.morton import morton_codes, tile_aabbs, box_dist2

LAYOUT_CM = "cm"  # class-major, Morton-within-class, invalid last


def class_morton_order(xyz, label, valid, num_classes: int, cell: float):
    """Permutation sorting by (class, Morton), invalid last (class = K).

    One lexicographic lax.sort over (class, code) — 20 classes x 30
    Morton bits exceeds an int32 key and TPUs have no int64, but a
    two-key sort needs neither (and measured ~2x faster than the
    two-pass stable-argsort composition it replaced).
    """
    import jax

    code = morton_codes(xyz, valid, cell)
    cls = jnp.where(valid, jnp.maximum(label, 0), num_classes).astype(jnp.int32)
    iota = jnp.arange(cls.shape[0], dtype=jnp.int32)
    _, _, perm = jax.lax.sort((cls, code, iota), num_keys=2, is_stable=True)
    return perm


def sort_cloud_cm(cloud: Cloud, num_classes: int, cell: float) -> Cloud:
    """Return the cloud in canonical class-major Morton order."""
    order = class_morton_order(cloud.xyz, cloud.label, cloud.valid,
                               num_classes, cell)
    return cloud.replace(
        xyz=jnp.take(cloud.xyz, order, axis=1),
        label=jnp.take(cloud.label, order),
        cov6=jnp.take(cloud.cov6, order, axis=1),
        valid=jnp.take(cloud.valid, order),
        layout=LAYOUT_CM,
    )


def tile_meta(xyz, label, valid, num_classes: int, tile: int) -> dict:
    """Per-tile metadata over a cm-sorted cloud (loop-invariant, cheap).

    Returns lo/hi (n_t, 3) exact AABBs over valid points and
    cmin/cmax (n_t,) int32 class ranges (cmin > cmax for all-invalid
    tiles, whose AABBs are +-inf and prune against any gate anyway).
    """
    n = xyz.shape[1]
    assert n % tile == 0, (
        f"tile_meta: N={n} must be a multiple of the tile size {tile}")
    lo, hi = tile_aabbs(xyz, valid, tile)
    lab = jnp.where(valid, jnp.maximum(label, 0), -1).reshape(-1, tile)
    cmax = jnp.max(lab, axis=1).astype(jnp.int32)
    cmin = jnp.min(jnp.where(lab >= 0, lab, num_classes), axis=1).astype(jnp.int32)
    return {"lo": lo, "hi": hi, "cmin": cmin, "cmax": cmax}


def tile_candidates(qlo, qhi, tlo, thi, gate, n_cap: int | None = None,
                    q_range=None, t_range=None, by_tid: bool = False):
    """Per-query-tile candidate target-tile lists under a distance gate.

    Exactness invariant: box_dist2 lower-bounds every point-pair
    distance between two tiles, so a tile beyond the gate cannot hold
    any correspondence the caller would accept (SURVEY.md §7 hard part
    #1, restated for tiles). `gate` may be a traced scalar.

    q_range/t_range: optional (cmin, cmax) pairs; when given, tiles
    whose class ranges do not overlap the query tile's are also pruned
    (used by same-class covariance neighborhoods).

    n_cap: optional static cap on candidates per query tile. Candidates
    are ordered nearest-box-first, so a cap drops the FARTHEST tiles;
    the returned `overflow` scalar counts dropped tiles (0 = exact).

    by_tid: order candidates by ascending tile id instead of nearest-
    box-first. Over a class-major layout tile ids are class-sorted, so
    the class of successive candidates is NON-DECREASING — the sparse
    NN kernel exploits this to accumulate winners in a single run
    buffer and flush each class row exactly once (with n_cap, the cap
    then drops the highest tile ids, not the farthest boxes).

    Returns (cand (n_qt, C) int32 — real candidates first, tail
    repeating the last real one so the kernel pipeline re-fetches no new
    block — count (n_qt,) int32, overflow () int32).
    """
    bd2 = box_dist2(qlo, qhi, tlo, thi)                      # (n_qt, n_tt)
    gate2 = gate * gate * (1.0 + 1e-5) + 1e-6
    mask = bd2 <= gate2
    if q_range is not None and t_range is not None:
        qmin, qmax = q_range
        tmin, tmax = t_range
        mask = mask & (qmin[:, None] <= tmax[None, :]) \
                    & (tmin[None, :] <= qmax[:, None])
    count = jnp.sum(mask, axis=1).astype(jnp.int32)
    if by_tid:
        tid = jnp.arange(mask.shape[1], dtype=jnp.int32)[None, :]
        key = jnp.where(mask, tid, mask.shape[1]).astype(jnp.int32)
    else:
        # nearest-box-first among candidates, non-candidates last
        key = jnp.where(mask, bd2, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    n_tt = tlo.shape[0]
    if n_cap is not None and n_cap < n_tt:
        overflow = jnp.maximum(jnp.max(count) - n_cap, 0)
        order = order[:, :n_cap]
        count = jnp.minimum(count, n_cap)
    else:
        overflow = jnp.int32(0)
    last = jnp.take_along_axis(order, jnp.maximum(count - 1, 0)[:, None], axis=1)
    cols = jnp.arange(order.shape[1], dtype=jnp.int32)
    cand = jnp.where(cols[None, :] < count[:, None], order, last)
    return cand, count, overflow
