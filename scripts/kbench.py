"""Sparse-NN kernel variant sweep at the bench workload (r4 perf lab).

Times class_nn_attrs_sparse on the chip across the two r4 design axes
(d2 on MXU vs VPU expanded form; run-accumulator merge vs v3-style
K-indexed dynamic-slice RMW) so kernel changes are attributed by
measurement, not guessed. Run on a QUIET host — bench numbers taken
while pytest hammers the CPUs are skewed.

    python scripts/kbench.py [n_points] [n_classes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SEMICP_KBENCH"] = "1"  # unlock the stage attribution stubs


def drain(out):
    """block_until_ready is a no-op under the axon tunnel; a one-element
    host fetch of the newest output drains the serialized device stream
    (see bench._drain)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def steady(fn, reps=20):
    drain(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    drain(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from semicp.cloud import make_cloud, preprocess_cloud
    from semicp.config import Config
    from semicp.corr.pallas_nn2 import class_nn_attrs_sparse, prepare_sparse
    from semicp.data import make_pair, make_scene

    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    n_classes = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_pad = 1 << int(np.ceil(np.log2(n_points)))
    cfg = Config().override({"cloud.n_pad": n_pad,
                             "cloud.num_classes": n_classes})

    rng = np.random.default_rng(0)
    tgt_pts, tgt_lab = make_scene(rng, n_points=n_points, extent=40.0,
                                  n_classes=n_classes)
    tgt_lab = tgt_lab - 1
    src_pts, src_lab, _ = make_pair(
        rng, tgt_pts, tgt_lab, np.array([0.5, -0.2, 0.05, 0.01, -0.02, 0.04]),
        noise=0.02, dropout=0.1, n_classes=n_classes)

    pre = jax.jit(lambda c: preprocess_cloud(c, cfg))
    src = pre(make_cloud(src_pts, src_lab, n_pad=n_pad))
    tgt = pre(make_cloud(tgt_pts, tgt_lab, n_pad=n_pad))
    prep = jax.jit(lambda c: prepare_sparse(c, n_classes, cfg.corr.cell))(tgt)
    prep = jax.block_until_ready(prep)
    q = src.xyz

    print(f"workload: n={n_points} pad={n_pad} K={n_classes} "
          f"gate={cfg.corr.max_dist} dev={jax.devices()[0].platform}")
    gate2 = cfg.corr.max_dist ** 2
    ref = None
    for merge, guard in (("twophase", True), ("plane", True), ("rmw", True)):
        fn = lambda: class_nn_attrs_sparse(  # noqa: E731
            prep, q, src.valid, num_classes=n_classes,
            gate=cfg.corr.max_dist, guard=guard, merge=merge)
        ms = steady(fn)
        d2, at = fn()
        if ref is None:
            ref = np.asarray(d2)
        else:
            # the exactness contract holds WITHIN the gate only;
            # beyond it variants may legally pick different far columns
            f = ref <= gate2 * (1 - 1e-5)
            err = np.abs(np.asarray(d2)[f] - ref[f]).max() if f.any() else 0
            assert err < 1e-2, f"variant disagrees within gate: {err}"
        print(f"  merge={merge} guard={int(guard)}: {ms:8.2f} ms/call")

    # cost-attribution ladder: successively stubbed kernel stages bound
    # where the per-candidate time actually goes (stage docstrings in
    # pallas_nn2._sparse_kernel). Stages 1-3 ladder the single-loop
    # paths (merge="rmw"); 11/13/15 ladder the twophase product path.
    for merge, stage, label in (
            ("rmw", 1, "no sel/merge (d2+min+onehot)"),
            ("rmw", 2, "d2+min only, static class"),
            ("rmw", 3, "DMA + loop only"),
            ("twophase", 11, "phase 1 only (min-accumulate)"),
            ("twophase", 13, "no select matmul"),
            ("twophase", 15, "HIGHEST 6-pass select matmul")):
        fn = lambda: class_nn_attrs_sparse(  # noqa: E731
            prep, q, src.valid, num_classes=n_classes,
            gate=cfg.corr.max_dist, stage=stage, merge=merge)
        ms = steady(fn)
        print(f"  {merge} stage {stage} [{label}]: {ms:8.2f} ms/call")

    # tile-shape sweep: per-pass fixed overhead dominates (see ladder),
    # so fewer/fatter passes trade elementwise waste for fixed cost
    gate2 = cfg.corr.max_dist ** 2
    inside = ref <= gate2 * (1 - 1e-5)
    for qb, tb in ((256, 1024), (256, 2048), (512, 1024), (512, 2048),
                   (256, 4096), (512, 4096)):
        try:
            prep_t = jax.jit(lambda c: prepare_sparse(
                c, n_classes, cfg.corr.cell, tb=tb))(tgt)
            prep_t = jax.block_until_ready(prep_t)
            fn = lambda: class_nn_attrs_sparse(  # noqa: E731
                prep_t, q, src.valid, num_classes=n_classes,
                gate=cfg.corr.max_dist, qb=qb)
            ms = steady(fn)
            d2, _ = fn()
            err = np.abs(np.asarray(d2)[inside] - ref[inside]).max()
            assert err < 1e-2, f"tile sweep disagrees within gate: {err}"
            print(f"  qb={qb} tb={tb}: {ms:8.2f} ms/call")
        except Exception as e:
            print(f"  qb={qb} tb={tb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
