"""On-device equivalence tests for the fused Pallas physics kernels.

The CPU test suite (conftest forces JAX_PLATFORMS=cpu) cannot execute
Mosaic kernels, so these tests skip there; run them on a TPU host with

    JAX_PLATFORMS= python -m pytest tests/test_pallas.py --no-header -q

(or any invocation where jax.default_backend() == "tpu"). They assert
bit-exact agreement between :mod:`safelife_tpu.ops.physics` and the XLA
formulations in :mod:`safelife_tpu.core` that the rest of the suite
validates against the NumPy oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU kernels need a real TPU backend",
)


def _soup(rng, b, h, w, n_agents, spawners=False):
    from safelife_tpu.core import cells as C

    board = np.zeros((b, h, w), np.int32)
    alive = rng.random((b, h, w)) < 0.2
    board |= alive * (C.ALIVE | C.DESTRUCTIBLE)
    board |= ((rng.random((b, h, w)) < 0.1) * C.FROZEN).astype(np.int32)
    board |= ((rng.random((b, h, w)) < 0.05)
              * (C.PUSHABLE | C.PULLABLE)).astype(np.int32)
    board |= ((rng.random((b, h, w)) < 0.03) * C.EXIT).astype(np.int32)
    board |= (alive * (rng.integers(0, 8, (b, h, w)) << C.COLOR_BIT)
              ).astype(np.int32)
    if spawners:
        board |= ((rng.random((b, h, w)) < 0.02)
                  * (C.SPAWNING | C.FROZEN)).astype(np.int32)
    locs = rng.integers(2, min(h, w) - 2, (b, n_agents, 2)).astype(np.int32)
    for i in range(b):
        for k in range(n_agents):
            board[i, locs[i, k, 0], locs[i, k, 1]] = C.PLAYER
    return jnp.asarray(board), jnp.asarray(locs)


@pytest.mark.parametrize("n_agents", [1, 3])
def test_fused_matches_xla(n_agents):
    from safelife_tpu.core import actions as AC, advance as ADV, scoring
    from safelife_tpu.ops import physics as P

    rng = np.random.default_rng(3)
    b, h, w = 64, 26, 26
    board, locs = _soup(rng, b, h, w, n_agents)
    acts = jnp.asarray(rng.integers(0, 9, (b, n_agents)), jnp.int32)
    sp = jnp.full((b,), 0.3, jnp.float32)

    xb, xl = jax.vmap(AC.execute_actions)(board, locs, acts)
    xb = ADV.advance_board_deterministic(xb)
    xc = scoring.agent_cells(xb, xl)

    pb, plc, pc = jax.jit(
        lambda bb, ll, aa: P.fused_actions_advance(
            bb.reshape(b, h * w), ll, aa, sp, 0,
            h=h, w=w, stochastic=False)
    )(board, locs, acts)
    np.testing.assert_array_equal(np.asarray(pb).reshape(b, h, w),
                                  np.asarray(xb))
    np.testing.assert_array_equal(np.asarray(plc), np.asarray(xl))
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(xc))


@pytest.mark.parametrize("p", [0.0, 1.0])
def test_stochastic_advance_edge_probs(p):
    """p=0 and p=1 make the spawn draws deterministic -> exact compare."""
    from safelife_tpu.core import advance as ADV
    from safelife_tpu.ops import physics as P

    rng = np.random.default_rng(4)
    b, h, w = 64, 26, 26
    board, _ = _soup(rng, b, h, w, 1, spawners=True)
    ref = ADV.advance_board(board, jax.random.PRNGKey(0), p)
    out = jax.jit(
        lambda bb: P.advance_pallas(
            bb.reshape(b, h * w), jnp.full((b,), p, jnp.float32), 7,
            h=h, w=w, stochastic=True)
    )(board).reshape(b, h, w)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spawn_fraction():
    from safelife_tpu.core import advance as ADV
    from safelife_tpu.ops import physics as P

    rng = np.random.default_rng(5)
    b, h, w = 256, 26, 26
    board, _ = _soup(rng, b, h, w, 1, spawners=True)
    elig = np.asarray(ADV.spawn_eligible(board))
    det = np.asarray(ADV.advance_board_deterministic(board))
    out = np.asarray(jax.jit(
        lambda bb: P.advance_pallas(
            bb.reshape(b, h * w), jnp.full((b,), 0.3, jnp.float32), 123,
            h=h, w=w, stochastic=True)
    )(board)).reshape(b, h, w)
    frac = ((out != det) & elig).sum() / max(elig.sum(), 1)
    assert 0.25 < frac < 0.35


def test_obs_kernel_matches_xla_compiled():
    """Compiled (Mosaic) form of the obs recenter kernel, on-device.

    The CPU suite covers the same equivalence in interpret mode
    (tests/test_obs_kernel.py); this asserts the compiled kernel agrees.
    """
    from safelife_tpu import ops
    from safelife_tpu.env import env as E

    rng = np.random.default_rng(3)
    b, h, w, a, e = 64, 26, 26, 2, 2
    board = jnp.asarray(rng.integers(0, 2 ** 16, (b, h, w)), jnp.int32)
    goals = jnp.asarray(rng.integers(0, 2 ** 16, (b, h, w)), jnp.int32)
    locs = jnp.asarray(rng.integers(0, 26, (b, a, 2)), jnp.int32)
    mask = jnp.asarray(rng.random((b, a)) < 0.8)
    el = jnp.asarray(rng.integers(0, 26, (b, e, 2)), jnp.int32)
    ev = jnp.asarray(rng.random((b, e)) < 0.7)
    cfg = E.EnvConfig(view_shape=(25, 25), output_channels=None)
    ref = E.get_obs_batch(cfg, board, goals, locs, mask, el, ev)
    center = jnp.where(mask[..., None], locs, 0)
    got = ops.recenter_views_pallas(
        board, goals, center[..., 0], center[..., 1], el, ev,
        view_shape=(25, 25))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_obs_kernel_sharded_compiled_lowering():
    """recenter_views_sharded under a REAL mesh with the compiled kernel.

    The virtual-8-device CPU suite can only exercise the
    custom_partitioning wrapper in interpret mode
    (test_obs_kernel.py::test_sharded_matches_unsharded); this runs the
    same wrapper through an actual Mosaic lowering on a TPU mesh (1-way
    on a single chip — degenerate partitioning, but the
    custom_partitioning partition/infer machinery and the compiled
    kernel path are both engaged, which is what a multi-chip mesh runs
    per-device). Kill switch for real multi-chip meshes until measured
    there: SAFELIFE_TPU_OBS_KERNEL=0 (ops/obs.py::use_obs_kernel).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from safelife_tpu import ops

    rng = np.random.default_rng(9)
    b, h, w, a, e = 64, 26, 26, 2, 2
    board = jnp.asarray(rng.integers(0, 2 ** 16, (b, h, w)), jnp.int32)
    goals = jnp.asarray(rng.integers(0, 2 ** 16, (b, h, w)), jnp.int32)
    cy = jnp.asarray(rng.integers(0, h, (b, a)), jnp.int32)
    cx = jnp.asarray(rng.integers(0, w, (b, a)), jnp.int32)
    el = jnp.asarray(rng.integers(0, 26, (b, e, 2)), jnp.int32)
    ev = jnp.asarray(rng.random((b, e)) < 0.7)

    direct = ops.recenter_views_pallas(
        board, goals, cy, cx, el, ev, view_shape=(25, 25))

    mesh = Mesh(np.array(jax.devices()[:1]), ("env",))
    lane = lambda x: jax.device_put(  # noqa: E731
        x, NamedSharding(mesh, PartitionSpec(
            "env", *([None] * (x.ndim - 1)))))
    args = tuple(lane(x) for x in (board, goals, cy, cx, el, ev))
    fn = jax.jit(lambda *xs: ops.recenter_views_sharded(
        *xs, view_shape=(25, 25)))
    with mesh:
        got = fn(*args)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(got))
