"""Equivalence tests for the Pallas observation recenter kernel.

The kernel (safelife_tpu/ops/obs.py) must be bit-identical to the XLA
one-hot-matmul formulation ``get_obs_batch`` — which the rest of the
suite pins against the reference semantics (``safelife_env.py:105-146``,
``helper_utils.py:42-75``). These tests run the kernel in Pallas
interpret mode so the CPU suite covers it; tests/test_pallas.py re-runs
the compiled form on a real TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from safelife_tpu import ops
from safelife_tpu.env import env as E


def _case(rng, b, a, n_exits, h=26, w=26):
    board = jnp.asarray(rng.integers(0, 2 ** 16, (b, h, w)), jnp.int32)
    goals = jnp.asarray(rng.integers(0, 2 ** 16, (b, h, w)), jnp.int32)
    locs = jnp.asarray(rng.integers(0, min(h, w), (b, a, 2)), jnp.int32)
    mask = jnp.asarray(rng.random((b, a)) < 0.8)
    el = jnp.asarray(rng.integers(0, min(h, w), (b, n_exits, 2)), jnp.int32)
    ev = jnp.asarray(rng.random((b, n_exits)) < 0.7)
    return board, goals, locs, mask, el, ev


@pytest.mark.parametrize("view", [(25, 25), (15, 15), (26, 26), (7, 9)])
@pytest.mark.parametrize("a,n_exits", [(1, 1), (3, 2)])
def test_matches_xla_views(view, a, n_exits):
    rng = np.random.default_rng(hash((view, a, n_exits)) % 2 ** 31)
    board, goals, locs, mask, el, ev = _case(rng, 16, a, n_exits)
    cfg = E.EnvConfig(view_shape=view, output_channels=None)
    ref = E.get_obs_batch(cfg, board, goals, locs, mask, el, ev)
    center = jnp.where(mask[..., None], locs, 0)
    got = ops.recenter_views_pallas(
        board, goals, center[..., 0], center[..., 1], el, ev,
        view_shape=view, interpret=True)
    assert got.dtype == ref.dtype and got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_keep_white_goals():
    rng = np.random.default_rng(7)
    board, goals, locs, mask, el, ev = _case(rng, 8, 1, 1)
    cfg = E.EnvConfig(view_shape=(25, 25), output_channels=None,
                      remove_white_goals=False)
    ref = E.get_obs_batch(cfg, board, goals, locs, mask, el, ev)
    center = jnp.where(mask[..., None], locs, 0)
    got = ops.recenter_views_pallas(
        board, goals, center[..., 0], center[..., 1], el, ev,
        view_shape=(25, 25), remove_white_goals=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_no_exits():
    rng = np.random.default_rng(11)
    board, goals, locs, mask, el, ev = _case(rng, 8, 1, 1)
    el0 = jnp.zeros((8, 0, 2), jnp.int32)
    ev0 = jnp.zeros((8, 0), bool)
    cfg = E.EnvConfig(view_shape=(25, 25), output_channels=None)
    ref = E.get_obs_batch(cfg, board, goals, locs, mask, el0, ev0)
    center = jnp.where(mask[..., None], locs, 0)
    got = ops.recenter_views_pallas(
        board, goals, center[..., 0], center[..., 1], el0, ev0,
        view_shape=(25, 25), interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_sharded_matches_unsharded():
    """recenter_views_sharded (the custom_partitioning wrapper fleet/
    multi-chip env steps route through) is bit-identical to the plain
    kernel when jitted over a lane-sharded multi-device mesh, and the
    output stays lane-sharded (no forced replication)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(99)
    board, goals, locs, mask, el, ev = _case(rng, 64, 2, 2)
    center = jnp.where(mask[..., None], locs, 0)
    args = (board, goals, center[..., 0], center[..., 1], el, ev)
    ref = ops.recenter_views_pallas(*args, view_shape=(25, 25),
                                    interpret=True)

    mesh = Mesh(np.array(jax.devices()), ("env",))
    lane = lambda x: jax.device_put(
        x, NamedSharding(mesh, P("env", *([None] * (x.ndim - 1)))))
    sharded_args = tuple(lane(x) for x in args)
    f = jax.jit(lambda *a: ops.recenter_views_sharded(
        *a, view_shape=(25, 25), interpret=True))
    got = f(*sharded_args)
    assert "env" in str(got.sharding)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
