#!/usr/bin/env python
"""Freeze benchmark archives for the six multi-agent tasks.

The reference ships no frozen levels for its multi-agent tasks (its
`level_iterator.py:344-357` gen_benchmarks was only ever run for the 8
single-agent suites), so multi-agent results could previously only be
reported against freshly generated validation levels. This generates
``num`` fixed levels per task from the validation spec of each
multi-agent task (training/env_factory.py task registry) under a single
recorded seed and packs them as one archive per task into
``safelife_tpu/levels/benchmarks/multi-agent-v1/`` — packaged, so
benchmark rows become reproducible against a frozen suite.

Deterministic: seed 20260820, per-task streams via SeedSequence.spawn in
task-name order, num_workers=0 (strictly sequential generation).

Usage:  python scripts/gen_multiagent_benchmarks.py [num_per_task]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safelife_tpu.io import levels as L                      # noqa: E402
from safelife_tpu.io.iterator import SafeLifeLevelIterator   # noqa: E402

SEED = 20260820
# task name -> generator spec (the task's validation_levels entry).
TASKS = [
    ("asym1", "random/multi-agent/asym1"),
    ("asym2", "random/multi-agent/asym2"),
    ("multi-build-coop", "random/multi-agent/build-coop"),
    ("multi-build-compete", "random/multi-agent/build-compete"),
    ("multi-build-parallel", "random/multi-agent/build-parallel"),
    ("multi-prune", "random/multi-agent/prune-still"),
]


def main():
    num = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = os.path.join(L.LEVEL_DIRECTORY, "benchmarks",
                           "multi-agent-v1")
    os.makedirs(out_dir, exist_ok=True)
    root = np.random.SeedSequence(SEED)
    for (task, spec), task_seed in zip(TASKS, root.spawn(len(TASKS))):
        out_file = os.path.join(out_dir, task + ".npz")
        if os.path.exists(out_file):
            print("exists:", out_file)
            continue
        it = SafeLifeLevelIterator(spec, seed=task_seed, num_workers=0)
        lvs = []
        for i in range(num):
            lv = next(it)
            lv.name = "%s-%03d.npz" % (task, i + 1)
            lvs.append(lv)
            if (i + 1) % 10 == 0:
                print("%s: %d/%d" % (task, i + 1, num), flush=True)
        L.save_archive(lvs, out_file)
        print("wrote:", out_file)

    # Byte-stability manifest: the packaged archives are frozen; any
    # regeneration drift (numpy/procgen changes) must fail loudly in
    # tests/test_env.py rather than silently moving the benchmark.
    import hashlib
    with open(os.path.join(out_dir, "SHA256SUMS"), "w") as f:
        for task, _ in TASKS:
            path = os.path.join(out_dir, task + ".npz")
            h = hashlib.sha256(open(path, "rb").read()).hexdigest()
            f.write("%s  %s.npz\n" % (h, task))
    print("wrote:", os.path.join(out_dir, "SHA256SUMS"))


if __name__ == "__main__":
    main()
