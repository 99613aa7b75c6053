#!/usr/bin/env python
"""Launch a multi-process (multi-host) training run.

The role the reference fills with its gcloud rsync+tmux scripts
(``gcloud/start-remote-job``), restated for the JAX distributed runtime:
every process gets the standard coordinator environment
(``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``)
and runs the ordinary train CLI, which joins the fleet via
``safelife_tpu.parallel.mesh.initialize_distributed``.

Two modes:

* ``--local N``: spawn N processes on this machine (CPU backend, each
  with ``--devices-per-proc`` virtual devices) — the smoke-test topology
  used by tests/test_multihost.py, scaled to a full training run.
* ``--print-env``: print the per-host environment exports for launching
  across real hosts (one line per host) instead of spawning anything;
  paste into your cluster launcher of choice.

Examples::

    python scripts/launch_multihost.py --local 2 -- \
        train /tmp/run -e append-still --steps 20000 --batch 8
    python scripts/launch_multihost.py --print-env --hosts h0:1234,h1 -- \
        train gs://bucket/run -e append-spawn
"""

import argparse
import ctypes
import os
import signal
import subprocess
import sys
import time


def _die_with_parent():
    """preexec_fn: have the kernel SIGKILL this worker if the launcher
    dies (even by SIGKILL, e.g. a test-harness timeout) — a lone fleet
    worker otherwise blocks on the coordination barrier forever and
    leaks. A fresh session (setsid) additionally makes the worker a
    group leader, so the launcher can killpg its whole subtree —
    including procgen pool children wedged at fork that ignore the
    worker's own teardown."""
    os.setsid()
    PR_SET_PDEATHSIG = 1
    ctypes.CDLL(None).prctl(PR_SET_PDEATHSIG, signal.SIGKILL)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", type=int, default=None, metavar="N",
                    help="spawn N local CPU processes")
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--port", type=int, default=47001)
    ap.add_argument("--print-env", action="store_true")
    ap.add_argument("--hosts", default=None,
                    help="comma-separated host[:port] list; first is the "
                         "coordinator")
    ap.add_argument("cli", nargs=argparse.REMAINDER,
                    help="arguments after '--' go to `python -m "
                         "safelife_tpu`")
    args = ap.parse_args()
    cli = [a for a in args.cli if a != "--"]

    if args.print_env:
        hosts = (args.hosts or "host0").split(",")
        coord = hosts[0] if ":" in hosts[0] else hosts[0] + ":47001"
        for i, h in enumerate(hosts):
            print("# on %s:" % h.split(":")[0])
            print("JAX_COORDINATOR_ADDRESS=%s JAX_NUM_PROCESSES=%d "
                  "JAX_PROCESS_ID=%d python -m safelife_tpu %s"
                  % (coord, len(hosts), i, " ".join(cli)))
        return 0

    n = args.local or 2
    procs = []
    for pid in range(n):
        env = dict(os.environ)
        # Local smoke clusters are pure-CPU; TPU-tunnel PJRT plugins on
        # PYTHONPATH break CPU-cluster coordination.
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=("--xla_force_host_platform_device_count=%d"
                       % args.devices_per_proc),
            JAX_COORDINATOR_ADDRESS="localhost:%d" % args.port,
            JAX_NUM_PROCESSES=str(n),
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "safelife_tpu"] + cli, env=env,
            preexec_fn=_die_with_parent))
    # Poll the fleet instead of waiting serially: one worker dying (a
    # crash, an assertion) must take the rest down, or the survivors
    # block on the coordination barrier forever.
    rc = 0
    try:
        live = list(procs)
        while live:
            time.sleep(0.2)
            for p in list(live):
                code = p.poll()
                if code is None:
                    continue
                live.remove(p)
                rc |= code
                if code != 0:
                    for q in live:
                        q.terminate()
    finally:
        # Kill each worker's whole process group: pool children wedged at
        # fork survive the worker's own teardown, and a survivor holding
        # the launcher's stdout pipe keeps whoever collects our output
        # waiting for EOF forever.
        for p in procs:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            if p.poll() is None:
                p.kill()
            p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
