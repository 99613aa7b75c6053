"""Level-generation throughput: host (C++ annealer) vs device-batched.

The host path anneals one region at a time (~10 levels/s/worker); the
device path (procgen/batched.py) runs N lockstep annealing chains per
jit call. MEASURED (TPU v5e, round 4): the device path peaks at ~0.5x
ONE host worker (b=8/64/256 → 2.0/3.6/2.7 levels/s vs host ~7) — a
documented negative result; see the procgen/batched.py docstring.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python bench/bench_procgen.py
CPU comparison:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python bench/bench_procgen.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

TASK = "random/append-still"
DEVICE_BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
HOST_N = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from safelife_tpu.io.iterator import SafeLifeLevelIterator

    log("device:", jax.devices()[0].device_kind)

    host = SafeLifeLevelIterator(TASK, seed=0, num_workers=0)
    next(host)  # warm annealer library
    t0 = time.perf_counter()
    for _ in range(HOST_N):
        next(host)
    host_rate = HOST_N / (time.perf_counter() - t0)
    log("host: %.1f levels/s (single worker)" % host_rate)

    dev = SafeLifeLevelIterator(TASK, seed=0, device_batch=DEVICE_BATCH)
    t0 = time.perf_counter()
    first = [next(dev) for _ in range(DEVICE_BATCH)]
    log("device first batch of %d: %.1fs (incl. compile)"
        % (DEVICE_BATCH, time.perf_counter() - t0))
    t0 = time.perf_counter()
    second = [next(dev) for _ in range(DEVICE_BATCH)]
    dt = time.perf_counter() - t0
    log("device: %.1f levels/s at batch %d (%.2f s/batch)"
        % (DEVICE_BATCH / dt, DEVICE_BATCH, dt))
    log("speedup vs single host worker: %.1fx"
        % (DEVICE_BATCH / dt / host_rate))
    assert len(first) == len(second) == DEVICE_BATCH


if __name__ == "__main__":
    main()
