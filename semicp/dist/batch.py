"""Scan-pair data parallelism: independent alignments sharded over chips.

Reference counterpart: none (SURVEY.md §2.3 row "Data parallel" — new
capability). The registration engine has no weights, so DP here means a
batch of (src, tgt) cloud pairs laid out along a mesh axis, each device
running the full EM alignment for its shard of pairs:

    shard_map over mesh axis "pairs"  x  vmap within the shard

Used by config 5's multi-sequence batch SLAM (BASELINE.json:11) and by
the odometry driver to align many consecutive pairs at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semicp.cloud.cloud import Cloud
from semicp.config import Config
from semicp.register.em_icp import _align_impl


def _batch_align_local(src_batch: Cloud, tgt_batch: Cloud, T0_batch,
                       gate, mi, cfg: Config):
    """vmap the whole EM program over a local batch of pairs."""
    return jax.vmap(lambda s, t, T0: _align_impl(s, t, T0, gate, mi, cfg))(
        src_batch, tgt_batch, T0_batch
    )


def batched_align(mesh: Mesh, cfg: Config, axis: str = "pairs"):
    """Return a jitted fn aligning a batch of pairs sharded over `axis`.

    The returned fn takes (src_batch, tgt_batch, T0_batch) where every
    leaf's leading dim is the batch dim (a multiple of the mesh axis
    size) and returns a batched AlignResult with the same leading dim.
    Optional `gate` / `max_iters` keywords are runtime operands of the
    one compiled program (batch SLAM's wide-gate loop-closure
    verification reuses the odometry program with zero recompiles).
    """
    spec = P(axis)
    # check_vma=False: the EM/GN loops carry scalar literals (lam, cost)
    # that start replicated and become axis-varying after the first body
    # iteration; each pair's program is independent so the vma check is
    # vacuous here.
    fn = jax.shard_map(
        functools.partial(_batch_align_local, cfg=cfg),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(), P()),
        out_specs=spec,
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def wrapper(src_batch, tgt_batch, T0_batch, gate=None, max_iters=None):
        g = jnp.float32(cfg.corr.max_dist if gate is None else gate)
        mi = jnp.int32(cfg.em.max_iters if max_iters is None else max_iters)
        return jitted(src_batch, tgt_batch, T0_batch, g, mi)

    wrapper._jitted = jitted      # tests assert trace counts (_cache_size)
    return wrapper


def shard_batch(mesh: Mesh, batch, axis: str = "pairs"):
    """device_put a host batch with its leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim >= 1
        else jax.device_put(x, NamedSharding(mesh, P())),
        batch,
    )
