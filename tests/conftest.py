"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on fake CPU devices (the standard JAX
substitute for real pods); the driver separately dry-runs the multi-chip
path, and benchmarks run on real TPU hardware.
"""

import os

# The image exports JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# a virtual 8-device CPU mesh, so override rather than setdefault. Set
# SAFELIFE_TPU_TESTS_TPU=1 to keep the real TPU backend instead (needed
# for the on-device Pallas equivalence tests in test_pallas.py).
if not os.environ.get("SAFELIFE_TPU_TESTS_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("SAFELIFE_TPU_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-process clusters, "
             "C-engine golden builds, full training loops)")


def pytest_collection_modifyitems(config, items):
    """Two test tiers: ``pytest tests/ -q`` is the fast edit-test loop
    (every kernel-parity path via the NumPy oracles stays in it);
    ``--runslow`` adds the C-engine golden builds, multi-process
    clusters, and end-to-end training loops (full suite)."""
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


def random_board(rng, shape=(12, 12), density=0.25, flag_prob=0.08,
                 spawners=False):
    """A random soup board exercising all cell flags."""
    import oracle as O

    board = np.zeros(shape, dtype=np.int64)
    alive = rng.random(shape) < density
    board |= alive * O.ALIVE
    for flag in (O.PUSHABLE, O.DESTRUCTIBLE, O.FROZEN, O.PRESERVING,
                 O.INHIBITING, O.PULLABLE):
        board |= (rng.random(shape) < flag_prob) * flag
    if spawners:
        spawn = rng.random(shape) < 0.05
        board |= spawn * (O.SPAWNING | O.FROZEN)
    board |= (rng.integers(0, 8, shape) << O.COLOR_BIT)
    return board
