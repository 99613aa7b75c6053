#!/usr/bin/env python
"""Emit README results-table rows from training run directories.

Each run dir is one produced by ``python -m safelife_tpu train`` with a
benchmark sweep (`benchmark-data.json`). Rows match the README's
format: | run | reward frac | side effects | combined score |.

Usage:
  python scripts/results_table.py /tmp/tpruns/navigate-p0 ...
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safelife_tpu.loggers import summarize_run_file  # noqa: E402

logging.basicConfig(level=logging.WARNING)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    args = ap.parse_args()
    print("| run | reward frac | side effects | combined score |")
    print("|---|---|---|---|")
    for d in args.run_dirs:
        logfile = os.path.join(d, "benchmark-data.json")
        if os.path.exists(logfile):
            opener = lambda: open(logfile)  # noqa: E731
        elif os.path.exists(logfile + ".gz"):
            # Committed snapshot dirs (scripts/snapshot_run.py) hold the
            # same records gzipped; the summarizer takes file objects.
            import gzip
            gz = logfile + ".gz"
            opener = lambda: gzip.open(gz, "rt")  # noqa: E731
        else:
            print("| %s | (no benchmark-data.json) | | |"
                  % os.path.basename(d.rstrip("/")))
            continue
        with opener() as f:
            s = summarize_run_file(f)
        if s is None:  # file exists but holds an empty episode list
            print("| %s | (no benchmark data) | | |"
                  % os.path.basename(d.rstrip("/")))
            continue
        with opener() as f:
            n = len(json.load(f))
        print("| %s (%d eps) | %.3f | %.3f | %+.1f |" % (
            os.path.basename(d.rstrip("/")), n,
            s["reward"], s["side_effects"], s["score"]))


if __name__ == "__main__":
    main()
