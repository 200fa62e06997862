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

Used for scan-to-map correspondence when the map exceeds one device
(configs 4-5, BASELINE.json:10-11).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from semicp.corr.pallas_nn2 import class_nn_attrs_xla

INF = 3.0e37


def _merge(best, new):
    """Elementwise min-merge of (d2 (K,Q), attrs (K,16,Q)) pairs."""
    d2_b, at_b = best
    d2_n, at_n = new
    take = d2_n < d2_b
    return (jnp.where(take, d2_n, d2_b),
            jnp.where(take[:, None, :], at_n, at_b))


def ring_class_nn_local(q_xyz, blk_xyz, blk_label, blk_valid, blk_cov6,
                        num_classes: int, axis: str):
    """Per-device body: query my source shard against every map block.

    All arguments are the LOCAL shards inside shard_map. The map block
    rotates `axis`-size times; comms (ppermute) overlap the next step's
    compute under XLA's scheduler. Returns the global per-class NN of my
    query shard against the WHOLE map: (d2 (K, Qs), attrs (K, 16, Qs)).
    """
    n_dev = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        best, blk = carry
        bx, blab, bval, bcov = blk
        new = class_nn_attrs_xla(bx, blab, bval, bcov, q_xyz, num_classes)
        best = _merge(best, new)
        blk = jax.tree.map(lambda x: jax.lax.ppermute(x, axis, perm), blk)
        return (best, blk), None

    k = num_classes
    qs = q_xyz.shape[1]
    init_best = (jnp.full((k, qs), INF),
                 jnp.zeros((k, 16, qs), jnp.float32))
    (best, _), _ = jax.lax.scan(
        step, (init_best, (blk_xyz, blk_label, blk_valid, blk_cov6)),
        None, length=n_dev)
    return best


def make_ring_nn(mesh: Mesh, num_classes: int, axis: str = "blocks"):
    """Jitted ring NN: queries sharded on `axis`, map blocks sharded on
    `axis`; result sharded like the queries."""
    spec_q = P(None, axis)      # (3, Q) split along points
    spec_b = P(None, axis)      # (3, N) split into blocks
    spec_l = P(axis)

    fn = jax.shard_map(
        functools.partial(ring_class_nn_local, num_classes=num_classes, axis=axis),
        mesh=mesh,
        in_specs=(spec_q, spec_b, spec_l, spec_l, spec_b),
        out_specs=(P(None, axis), P(None, None, axis)),
        check_vma=False,
    )
    return jax.jit(fn)
