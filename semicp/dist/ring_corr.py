"""Ring correspondence: points-sharded NN over mesh-sharded map blocks.

Reference counterpart: NONE — the reference holds one scan pair in RAM
(SURVEY.md §2.3 row "Sequence/context parallel"). This is the
registration-domain isomorph of ring attention: the map lives sharded
as blocks across devices, each device holds a shard of query (source)
points, and blocks rotate around the mesh with `jax.lax.ppermute` so
every query shard sees every map block. Blockwise min-merging keeps
peak memory at (query shard + one map block), exactly like blockwise
softmax accumulation in ring attention (SURVEY.md §5 "Long-context /
sequence parallelism").

Engine: each shard class-sorts its map block ONCE before the ring spins
(the sort is loop-invariant; the SORTED planes + packed attribute rows
are what rotate), so every ring step runs the fused Pallas NN kernel —
no scalar gathers anywhere in the rotation (VERDICT r1 item 4). The XLA
fallback remains for the CPU mesh; `engine="dense", interpret=True`
lets CI execute the kernel ring on the 8-device CPU mesh.

Used for scan-to-map correspondence when the map exceeds one device
(configs 4-5, BASELINE.json:10-11).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from semicp.corr.pallas_nn2 import (
    class_nn_attrs_pallas,
    class_nn_attrs_xla,
    sort_cloud_by_class,
)

INF = 3.0e37


def _merge(best, new):
    """Elementwise min-merge of (d2 (K,Q), attrs (K,16,Q)) pairs."""
    d2_b, at_b = best
    d2_n, at_n = new
    take = d2_n < d2_b
    return (jnp.where(take, d2_n, d2_b),
            jnp.where(take[:, None, :], at_n, at_b))


def prepare_ring_block(blk_xyz, blk_label, blk_valid, blk_cov6,
                       num_classes: int, engine: str):
    """Loop-invariant per-shard block prep (inside shard_map).

    For the dense engine the block is class-sorted ONCE and the sorted
    planes + packed attribute rows are what rotate; an EM loop calling
    `ring_sweep` each iteration pays this only once. After a full sweep
    (n_dev rotations) every device holds its original block again, so
    the prepared block is reusable across sweeps."""
    if engine == "dense":
        xyz_s, label_s, attrs16 = sort_cloud_by_class(
            blk_xyz, blk_label, blk_cov6, blk_valid, num_classes)
        return (xyz_s, label_s, attrs16)
    return (blk_xyz, blk_label, blk_valid, blk_cov6)


def ring_sweep(q_xyz, blk0, num_classes: int, axis: str, engine: str,
               interpret: bool = False):
    """One full ring rotation: my query shard vs every map block.

    blk0 comes from `prepare_ring_block`. The map block rotates
    `axis`-size times; comms (ppermute) overlap the next step's compute
    under XLA's scheduler. Returns the global per-class NN of my query
    shard against the WHOLE map: (d2 (K, Qs), attrs (K, 16, Qs))."""
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    if engine == "dense":
        def nn(blk):
            bx, blab, battrs = blk
            return class_nn_attrs_pallas(bx, blab, battrs, q_xyz,
                                         num_classes=num_classes,
                                         interpret=interpret)
    else:
        def nn(blk):
            bx, blab, bval, bcov = blk
            return class_nn_attrs_xla(bx, blab, bval, bcov, q_xyz,
                                      num_classes)

    def step(carry, _):
        best, blk = carry
        best = _merge(best, nn(blk))
        blk = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), blk)
        return (best, blk), None

    k = num_classes
    qs = q_xyz.shape[1]
    init_best = (jnp.full((k, qs), INF),
                 jnp.zeros((k, 16, qs), jnp.float32))
    (best, _), _ = jax.lax.scan(step, (init_best, blk0), None, length=n_dev)
    return best


def ring_class_nn_local(q_xyz, blk_xyz, blk_label, blk_valid, blk_cov6,
                        num_classes: int, axis: str, engine: str = "xla",
                        interpret: bool = False):
    """Per-device body: prepare my block, then one full ring sweep."""
    blk0 = prepare_ring_block(blk_xyz, blk_label, blk_valid, blk_cov6,
                              num_classes, engine)
    return ring_sweep(q_xyz, blk0, num_classes, axis, engine, interpret)


def make_ring_nn(mesh: Mesh, num_classes: int, axis: str = "blocks",
                 engine: str = "auto", interpret: bool | None = None):
    """Jitted ring NN: queries sharded on `axis`, map blocks sharded on
    `axis`; result sharded like the queries.

    engine: "auto" picks the fused Pallas kernel on TPU and the XLA
    fallback on the CPU mesh; force "dense" (optionally with
    interpret=True) or "xla" explicitly.
    """
    if engine == "auto":
        on_cpu = jax.default_backend() == "cpu"
        engine = "xla" if on_cpu else "dense"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    spec_q = P(None, axis)      # (3, Q) split along points
    spec_b = P(None, axis)      # (3, N) split into blocks
    spec_l = P(axis)

    fn = jax.shard_map(
        functools.partial(ring_class_nn_local, num_classes=num_classes,
                          axis=axis, engine=engine, interpret=interpret),
        mesh=mesh,
        in_specs=(spec_q, spec_b, spec_l, spec_l, spec_b),
        out_specs=(P(None, axis), P(None, None, axis)),
        check_vma=False,
    )
    return jax.jit(fn)
