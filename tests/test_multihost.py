"""Genuine multi-process distributed tests (2-process CPU cluster).

The virtual 8-device mesh tests (test_parallel.py) prove sharded ==
unsharded within one process; these tests spawn a REAL 2-process JAX
cluster over a localhost coordinator and assert that

* ``initialize_distributed`` wires both processes into one fleet,
* cross-process collectives produce the single-process answer,
* ``per_host_seed`` gives distinct, reproducible per-host level streams,
* ``gather_episodes`` delivers every host's episode records to host 0.

Each worker runs in a subprocess (its own JAX runtime); the test asserts
on their exit codes and printed results.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
import jax.numpy as jnp
import numpy as np
from safelife_tpu.parallel import mesh as M

proc, nprocs = M.initialize_distributed(
    coordinator_address="localhost:" + port, num_processes=2,
    process_id=pid)
assert (proc, nprocs) == (pid, 2), (proc, nprocs)
assert jax.process_count() == 2
assert len(jax.devices()) == 4, len(jax.devices())        # global
assert len(jax.local_devices()) == 2                      # per host

# --- cross-process collective parity -------------------------------
mesh = M.make_mesh()
from jax.sharding import NamedSharding, PartitionSpec as P
sharding = NamedSharding(mesh, P(M.ENV_AXIS))
global_shape = (8,)
full = np.arange(8, dtype=np.float32) * 3.5
arr = jax.make_array_from_callback(
    global_shape, sharding, lambda idx: full[idx])
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
np.testing.assert_allclose(float(total), full.sum())

# --- per-host seeds: distinct across hosts, equal across calls -----
mine = M.per_host_seed(1234).generate_state(4)
again = M.per_host_seed(1234).generate_state(4)
other = M.per_host_seed(1234, process_index=1 - pid).generate_state(4)
assert (mine == again).all()
assert (mine != other).any()

# --- episode gather: both hosts' records arrive everywhere ---------
recs = {"reward": np.full((3,), float(pid)),
        "level_idx": np.arange(3) + 10 * pid}
out = M.gather_episodes(recs)
assert out["reward"].shape == (6,)
assert set(out["level_idx"].tolist()) == {0, 1, 2, 10, 11, 12}
if M.is_logging_host():
    assert pid == 0

# --- multihost level pool: allgathered union, global metadata ------
from safelife_tpu.io.iterator import LevelPoolManager, \
    SafeLifeLevelIterator
it = SafeLifeLevelIterator(
    "random/append-still-easy", seed=M.per_host_seed(77), num_workers=0)
mgr = LevelPoolManager(it, pool_size=2)
assert mgr.pool.num_levels == 4        # 2 hosts x 2 local levels
meta = mgr.level_meta()
assert set(meta) == {0, 1, 2, 3}
# Host slices carry their own (distinct per-host stream) level names.
own = [meta[2 * pid + i]["name"] for i in range(2)]
assert all("append-still-easy" in n for n in own), own
assert all("append-still-easy" in meta[i]["name"] for i in range(4)), meta
# Refresh stays collective and keeps the pool replicated & global.
mgr.refresh(1)
assert mgr.pool.num_levels == 4
# Foreign-slot name propagation after a (simulated) checkpoint restore:
# every slot masked as restored/slot-N on every host, then each host
# refreshes one slot of its own slice. The owner's 'fresh' flag must
# drop the mask on BOTH hosts (pre-round-5 regression: non-owners kept
# restored/slot-N forever), while unswapped slots keep it.
mgr._restored_meta = {g: {"name": "restored/slot-%d" % g}
                      for g in range(4)}
meta.update({g: dict(mgr._restored_meta[g]) for g in range(4)})
mgr.refresh(1)
# The first refresh consumed local slot 0, so this one swaps local
# slot 1 of each host's slice.
swapped = {2 * h + 1 for h in range(2)}
for g in range(4):
    if g in swapped:
        assert g not in mgr._restored_meta, (pid, g)
        assert "append-still-easy" in meta[g]["name"], (pid, g, meta[g])
    else:
        assert meta[g]["name"] == "restored/slot-%d" % g, (pid, g, meta[g])
mgr.close()
print("WORKER_OK", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # The axon TPU-tunnel PJRT plugin (if present on PYTHONPATH) breaks
    # CPU-cluster coordination — these workers must run pure-CPU JAX.
    inherited = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                 if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + inherited)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            "worker %d failed:\n%s" % (pid, out[-4000:])
        assert ("WORKER_OK %d" % pid) in out


def test_per_host_seed_single_process():
    from safelife_tpu.parallel import mesh as M

    a = M.per_host_seed(7, 0)
    b = M.per_host_seed(7, 1)
    assert (a.generate_state(4) != b.generate_state(4)).any()
    # Stable across SeedSequence inputs too.
    root = np.random.SeedSequence(7)
    c = M.per_host_seed(root, 0)
    assert (a.generate_state(4) == c.generate_state(4)).all()


@pytest.mark.slow
def test_two_process_global_mesh_training(tmp_path):
    """End-to-end fleet training: 2 processes x 2 devices train ONE
    global SPMD program (lanes sharded fleet-wide, learner replicated).
    Both processes must report bitwise-identical parameter checksums
    (the replication invariant) and the collective Orbax checkpoint
    must be written."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = tmp_path / "run"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo
    port = _free_port()
    # start_new_session + killpg: a timeout must take down the whole
    # launcher process group, not just the launcher — a surviving fleet
    # worker blocks on the coordination barrier forever and leaks.
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts/launch_multihost.py"),
         "--local", "2", "--devices-per-proc", "2",
         "--port", str(port), "--",
         "train", str(data_dir), "-e", "append-still",
         "--steps", "1500", "--batch", "8", "--skip-benchmark",
         "-x", '{"validation.num_levels": 0}'],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=1200)
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, 9)
        proc.communicate()
        raise
    assert proc.returncode == 0, out[-4000:]
    # Replication invariant: every report's parameter checksum appears
    # once per process with BITWISE-identical values — params evolve
    # only through psum'd gradients, so any drift is real corruption.
    # The loss scalar is deliberately NOT held to that bar: XLA's CPU
    # backend recomputes replicated scalars per host with thread-order-
    # nondeterministic reductions (~1e-3 relative wobble under load).
    import re
    reports = re.findall(
        r"n=(\d+): loss=([\d.eE+-]+).*?pcheck=([\d.eE+-]+)", out)
    by_step = {}
    for step, loss, pcheck in reports:
        by_step.setdefault(step, []).append((loss, pcheck))
    assert by_step, "no training reports in output:\n" + out[-2000:]
    for step, vals in by_step.items():
        assert len(vals) == 2, (step, vals)
        (loss_a, pc_a), (loss_b, pc_b) = vals
        assert pc_a == pc_b, (step, vals)
        assert abs(float(loss_a) - float(loss_b)) <= (
            1e-2 * max(1.0, abs(float(loss_a)))), (step, vals)
    ckpts = os.listdir(data_dir / "checkpoints")
    assert any(c.isdigit() for c in ckpts), ckpts

    # Resume the fleet from the collective checkpoint: every process
    # must restore (incl. the globally-replicated level pool, which the
    # pool manager slices back to host-local arrays) and the replication
    # invariant must hold across the resumed reports too.
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts/launch_multihost.py"),
         "--local", "2", "--devices-per-proc", "2",
         "--port", str(port), "--",
         "train", str(data_dir), "-e", "append-still",
         "--steps", "3000", "--batch", "8", "--skip-benchmark",
         "-x", '{"validation.num_levels": 0}'],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=1200)
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, 9)
        proc.communicate()
        raise
    assert proc.returncode == 0, out[-4000:]
    restores = re.findall(r"restored checkpoint at step (\d+)", out)
    assert len(restores) == 2, out[-2000:]  # one per process
    assert "old format" not in out  # the pool came back with it
    reports = re.findall(r"n=(\d+):.*?pcheck=([\d.eE+-]+)", out)
    by_step = {}
    for step, pcheck in reports:
        by_step.setdefault(step, []).append(pcheck)
    assert by_step, "no training reports in output:\n" + out[-2000:]
    for step, vals in by_step.items():
        assert len(vals) == 2 and vals[0] == vals[1], (step, vals)


@pytest.mark.slow
def test_two_process_global_mesh_dqn(tmp_path):
    """Fleet DQN: lanes + n-step rings shard fleet-wide; the learner and
    the replay buffer replicate (inserts allgather the global batch's
    rows; identical sample keys keep every replica's optimizer step
    bitwise-identical). Asserts the same replication invariant as the
    PPO fleet test."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = tmp_path / "run"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts/launch_multihost.py"),
         "--local", "2", "--devices-per-proc", "2",
         "--port", str(port), "--",
         "train", str(data_dir), "-e", "append-still", "--algo", "dqn",
         "--steps", "1200", "--batch", "8", "--skip-benchmark",
         "-x", ('{"validation.num_levels": 0, "dqn.replay_initial": 256,'
                ' "dqn.replay_size": 2048, "dqn.report_interval": 320}')],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=1200)
    except subprocess.TimeoutExpired:
        os.killpg(proc.pid, 9)
        proc.communicate()
        raise
    assert proc.returncode == 0, out[-4000:]
    import re
    reports = re.findall(r"n=(\d+): loss=.*?pcheck=([\d.eE+-]+)", out)
    by_step = {}
    for step, pcheck in reports:
        by_step.setdefault(step, []).append(pcheck)
    assert by_step, "no training reports in output:\n" + out[-2000:]
    for step, vals in by_step.items():
        assert len(vals) == 2 and vals[0] == vals[1], (step, vals)
    ckpts = os.listdir(data_dir / "checkpoints")
    assert any(c.isdigit() for c in ckpts), ckpts
