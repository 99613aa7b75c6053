#!/usr/bin/env python
"""Snapshot a training run's evidence into the repo's results/ dir.

VERDICT round-4 item 7: TPU-queue outputs used to vanish into /tmp with
nothing committed, so half-finished queues landed zero evidence. This
script copies the durable artifacts of one run directory (produced by
``python -m safelife_tpu train`` or ``scripts/ref_ppo_run.py``) into
``results/<name>/``:

  * ``summary.json`` — episode counts + benchmark/validation summary
    stats (reward frac, side effects, combined score) and wall-clock
    metadata scraped from the run;
  * ``benchmark-data.json.gz`` — the full per-episode benchmark sweep
    records, if the run did one;
  * ``training-log.json.gz`` — the full per-episode training curve
    (what scripts/parity_curves.py consumes; it reads .gz transparently).

Usage:
  python scripts/snapshot_run.py RUN_DIR [RESULTS_NAME]
"""

import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safelife_tpu.loggers import summarize_run_file  # noqa: E402


def gz_copy(src, dst):
    with open(src, "rb") as f, gzip.open(dst, "wb", compresslevel=9) as g:
        shutil.copyfileobj(f, g)


def main():
    run_dir = sys.argv[1].rstrip("/")
    name = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(run_dir)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "results", name)
    os.makedirs(out, exist_ok=True)

    summary = {"run_dir": run_dir, "name": name}
    for kind in ("training", "validation", "benchmark"):
        src = os.path.join(run_dir, "%s-log.json" % kind)
        if kind == "benchmark":
            src = os.path.join(run_dir, "benchmark-data.json")
        if not os.path.exists(src):
            continue
        try:
            records = json.load(open(src))
        except ValueError:
            continue
        summary["%s_episodes" % kind] = len(records)
        try:
            s = summarize_run_file(src)
        except (KeyError, ValueError, TypeError):
            s = None  # e.g. training logs without side-effect records
        if s is not None:
            summary[kind] = {k: (None if v is None else round(float(v), 4))
                             for k, v in s.items()}
        if kind == "training":
            # Wall-clock: span of the episode timestamps (records are
            # already parsed above; don't re-read a multi-MB log).
            # Both stacks log ISO-8601 strings (ours timezone-aware,
            # the reference naive).
            from datetime import datetime
            times = []
            for r in records:
                if isinstance(r, dict) and "time" in r:
                    try:
                        t = datetime.fromisoformat(str(r["time"]))
                        times.append(t.replace(tzinfo=None))
                    except ValueError:
                        pass
            if len(times) >= 2:
                summary["training_wall_s"] = round(
                    (max(times) - min(times)).total_seconds(), 1)
    tlog = os.path.join(run_dir, "training-log.json")
    if os.path.exists(tlog):
        gz_copy(tlog, os.path.join(out, "training-log.json.gz"))
    bdata = os.path.join(run_dir, "benchmark-data.json")
    if os.path.exists(bdata):
        gz_copy(bdata, os.path.join(out, "benchmark-data.json.gz"))
    vlog = os.path.join(run_dir, "validation-log.json")
    if os.path.exists(vlog):
        gz_copy(vlog, os.path.join(out, "validation-log.json.gz"))

    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(summary, sort_keys=True))


if __name__ == "__main__":
    main()
