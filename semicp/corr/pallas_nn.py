"""Fused per-class NN — the Pallas flagship kernel (BASELINE.json:5).

Replaces HOT LOOP #1 of the reference (per-point, per-class
kdtree->nearestKSearch; SURVEY.md §3.1). The XLA formulation
(corr/bruteforce.class_nn) is HBM-bound: the (QB,TB) distance tile
materializes between the matmul and the K masked-min passes, so every
candidate costs (1+K) HBM touches. This kernel keeps the whole tile in
VMEM/registers: per grid step it forms the distance block from planar
coordinate refs and folds it straight into (K, QB) running min/argmin
scratch — candidates never leave the chip.

Grid: (Q/QB, N/TB); the target axis is the inner (minor) dimension so
each query block's accumulators persist in VMEM scratch across target
tiles and write out once on the last tile.

Contract identical to class_nn: exact per-class argmin of the expanded
distance |q|^2+|t|^2-2q.t (same cancellation caveat, see bruteforce.py),
invalid targets excluded via label = -1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e37  # python float: jnp scalars would be captured consts in the kernel

# Swept on v5e (8k x 8k, K=8): (256,1024) -> 0.045 ms; (512,512) VMEM-OOMs
# because the unrolled K loop keeps ~K tile temporaries live.
QB = 256
TB = 1024


def _nn_kernel(qx, qy, qz, q2, tx, ty, tz, t2, tlab,
               out_d2, out_idx, acc_d2, acc_idx, *, num_classes, tb):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_d2[:] = jnp.full_like(acc_d2, INF)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    # distance block (QB, TB) — lives in VMEM only
    vqx, vqy, vqz, vq2 = qx[0, :], qy[0, :], qz[0, :], q2[0, :]
    vtx, vty, vtz, vt2 = tx[0, :], ty[0, :], tz[0, :], t2[0, :]
    d2 = (vq2[:, None] + vt2[None, :]
          - 2.0 * vqx[:, None] * vtx[None, :]
          - 2.0 * vqy[:, None] * vty[None, :]
          - 2.0 * vqz[:, None] * vtz[None, :])
    lab = tlab[0, :][None, :]
    base = j * tb

    for k in range(num_classes):  # static unroll
        dk = jnp.where(lab == k, d2, INF)
        m = jnp.min(dk, axis=1)
        a = jnp.argmin(dk, axis=1).astype(jnp.int32) + base
        better = m < acc_d2[k, :]
        acc_d2[k, :] = jnp.where(better, m, acc_d2[k, :])
        acc_idx[k, :] = jnp.where(better, a, acc_idx[k, :])

    @pl.when(j == nj - 1)
    def _():
        out_d2[:] = acc_d2[:]
        out_idx[:] = acc_idx[:]


@functools.partial(jax.jit, static_argnames=("num_classes", "qb", "tb", "interpret"))
def class_nn_pallas(tgt_xyz, tgt_label, tgt_valid, q_xyz, num_classes: int,
                    qb: int = QB, tb: int = TB, interpret: bool = False):
    """Drop-in replacement for bruteforce.class_nn (same signature/returns)."""
    n = tgt_xyz.shape[1]
    q = q_xyz.shape[1]
    qb = min(qb, q)
    tb = min(tb, n)
    K = num_classes

    tx, ty, tz = tgt_xyz[0], tgt_xyz[1], tgt_xyz[2]
    t2 = tx * tx + ty * ty + tz * tz
    qx, qy, qz = q_xyz[0], q_xyz[1], q_xyz[2]
    q2 = qx * qx + qy * qy + qz * qz
    # invalid targets can never win any class
    lab = jnp.where(tgt_valid, tgt_label, -1)

    grid = (q // qb, n // tb)
    qspec = pl.BlockSpec((1, qb), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, tb), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((K, qb), lambda i, j: (0, i), memory_space=pltpu.VMEM)

    out_d2, out_idx = pl.pallas_call(
        functools.partial(_nn_kernel, num_classes=K, tb=tb),
        grid=grid,
        in_specs=[qspec] * 4 + [tspec] * 5,
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((K, q), jnp.float32),
            jax.ShapeDtypeStruct((K, q), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, qb), jnp.float32),
            pltpu.VMEM((K, qb), jnp.int32),
        ],
        interpret=interpret,
    )(
        qx[None], qy[None], qz[None], q2[None],
        tx[None], ty[None], tz[None], t2[None], lab[None],
    )
    return out_idx, out_d2


def class_nn_auto(tgt_xyz, tgt_label, tgt_valid, q_xyz, num_classes: int):
    """Pallas on TPU, XLA brute force elsewhere (tests/CPU mesh)."""
    if jax.default_backend() == "cpu":
        from semicp.corr.bruteforce import class_nn

        return class_nn(tgt_xyz, tgt_label, tgt_valid, q_xyz, num_classes)
    return class_nn_pallas(tgt_xyz, tgt_label, tgt_valid, q_xyz, num_classes)
