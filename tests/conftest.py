"""Test harness config: force an 8-device CPU mesh (SURVEY.md §4.6).

Tests never touch the real TPU — they run on a virtual 8-device CPU
backend so distributed code paths (shard_map, psum, ppermute) execute in
one process, and so `pytest -n` workers don't fight over the single chip.
Must run before jax initializes its backends, hence module level here.

Exception: the opt-in compiled-kernel lane (VERDICT r1 item 7) keeps the
real chip — `SEMICP_TPU_TESTS=1 pytest -m tpu` runs the Pallas
equivalence asserts with interpret=False on hardware (serialized; never
combine with -n).
"""

import os

TPU_LANE = os.environ.get("SEMICP_TPU_TESTS") == "1"

if not TPU_LANE:
    # The axon sitecustomize registers the TPU plugin and pins
    # jax_platforms at interpreter start, so env vars alone are too
    # late/ignored — override via jax.config after import (verified to
    # stick).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

if os.environ.get("SEMICP_TEST_COMPILE_CACHE", "1") != "0":
    # Persistent XLA compile cache for the suite: entries are keyed by
    # HLO content hash, so stale entries cannot be wrong-by-content —
    # they just stop hitting when code changes. The suite is compile-
    # dominated (~9 min cold at -n 4); warm runs reclaim most of it.
    # Opt out with SEMICP_TEST_COMPILE_CACHE=0.
    from semicp.cli.common import setup_jax

    setup_jax(os.path.expanduser("~/.cache/semicp_xla_test"))

if os.environ.get("SEMICP_DEBUG_NANS") == "1":
    # Numeric-sanitization lane (SURVEY.md §5 "race detection /
    # sanitizers"): every jitted program traps on the first NaN it
    # produces instead of propagating it into a silently-degraded pose.
    # Run once per round: SEMICP_DEBUG_NANS=1 pytest -q. The eig3
    # zero-matrix NaN (commit 752b253) is this lane's target bug class.
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
