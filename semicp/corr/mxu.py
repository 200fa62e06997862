"""MXU helpers shared by the Pallas kernels.

Mosaic lowers an f32 dot_general at HIGHEST precision as a 6-pass bf16
emulation, and rejects explicit bf16 operands ("Bad lhs type") in these
kernels. The fast exact path measured on v5e (pallas_nn2 stage-15
ladder: -2.9 ms/call at the bench workload) is a 3-term split in f32
CONTAINERS: each term's values are bf16-representable, so DEFAULT
precision (bf16 truncation, one MXU pass per term) drops no bits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_f32x3(a, b, dimension_numbers):
    """Exact-to-~f32 dot_general via a bf16x3 split of `a` (3 MXU passes).

    `b` must be exactly bf16-representable (e.g. a 0/1 one-hot or mask
    plane) — it is NOT split. Use when the caller would otherwise need
    Precision.HIGHEST on f32 operands inside a Pallas TPU kernel.
    """
    dot = lambda x: jax.lax.dot_general(  # noqa: E731
        x, b, dimension_numbers,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = a - a_hi
    a_mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = r1 - a_mid
    return dot(a_hi) + dot(a_mid) + dot(a_lo)
