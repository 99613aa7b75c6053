#!/usr/bin/env python
"""Learning-curve parity analysis: reference torch PPO vs this repo.

BASELINE.md's correctness north star asks for "PPO steps-to-reward parity
on append-still within seed variance". This script consumes the episode
logs written by both training stacks (the reference's
``safelife_logger.py:262-354`` and our ``loggers.py`` write the same
per-episode JSON records) and reports, per run:

  * steps-to-threshold: the cumulative env-step count at which the
    rolling mean episode reward fraction (reward / reward_possible,
    window of 50 episodes) first reaches a threshold, for several
    thresholds;
  * the final rolling reward fraction and success rate.

Cumulative env steps are reconstructed as the running sum of episode
lengths — identical bookkeeping on both sides (both run 16 env lanes, so
the in-flight-episode lag is matched).

Usage:
  python scripts/parity_curves.py --ref /tmp/refppo-s1 /tmp/refppo-s2 ... \
      --ours /tmp/tpuppo-s1 ... [--markdown]
"""

import argparse
import gzip
import json
import os

import numpy as np

THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5)
WINDOW = 50


def load_episodes(run_dir):
    path = os.path.join(run_dir, "training-log.json")
    if os.path.exists(path):
        with open(path) as f:
            records = json.load(f)
    else:  # committed snapshot (scripts/snapshot_run.py)
        with gzip.open(path + ".gz", "rt") as f:
            records = json.load(f)
    lengths = np.array([r["length"] for r in records], dtype=np.int64)
    frac = np.array([r["reward"] / max(r["reward_possible"], 1)
                     for r in records], dtype=np.float64)
    success = np.array([bool(r["success"]) for r in records],
                       dtype=np.float64)
    steps = np.cumsum(lengths)
    return steps, frac, success


def rolling(x, w):
    if len(x) < w:
        return np.array([])
    c = np.cumsum(np.insert(x, 0, 0.0))
    return (c[w:] - c[:-w]) / w


def analyze(run_dir):
    steps, frac, success = load_episodes(run_dir)
    rf = rolling(frac, WINDOW)
    rs = rolling(success, WINDOW)
    rsteps = steps[WINDOW - 1:]
    out = {"episodes": len(steps), "total_steps": int(steps[-1])}
    for t in THRESHOLDS:
        idx = np.argmax(rf >= t) if (rf >= t).any() else -1
        out["steps_to_%.1f" % t] = (
            int(rsteps[idx]) if idx >= 0 else None)
    out["final_frac"] = float(rf[-200:].mean()) if len(rf) else None
    out["final_success"] = float(rs[-200:].mean()) if len(rs) else None
    return out


def fmt_steps(v):
    return "—" if v is None else "%.2fM" % (v / 1e6) if v >= 1e5 \
        else "%dk" % round(v / 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", nargs="+", required=True)
    ap.add_argument("--ours", nargs="+", required=True)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    rows = []
    for side, dirs in (("reference", args.ref), ("ours", args.ours)):
        for d in dirs:
            a = analyze(d)
            a["side"] = side
            a["run"] = os.path.basename(d.rstrip("/"))
            rows.append(a)

    cols = (["steps_to_%.1f" % t for t in THRESHOLDS]
            + ["final_frac", "final_success"])
    if args.markdown:
        print("| run | " + " | ".join(
            c.replace("steps_to_", "steps→").replace("_", " ")
            for c in cols) + " |")
        print("|---" * (len(cols) + 1) + "|")
        for r in rows:
            cells = [("%s %s" % (r["side"], r["run"]))]
            for c in cols:
                v = r[c]
                if c.startswith("steps_to"):
                    cells.append(fmt_steps(v))
                else:
                    cells.append("—" if v is None else "%.3f" % v)
            print("| " + " | ".join(cells) + " |")
    else:
        for r in rows:
            print(json.dumps(r))

    # Seed-variance verdict per threshold: is each side's mean within the
    # other side's [min, max] seed range?
    print()
    for t in THRESHOLDS:
        key = "steps_to_%.1f" % t
        ref = [r[key] for r in rows if r["side"] == "reference"]
        our = [r[key] for r in rows if r["side"] == "ours"]
        if None in ref or None in our or not ref or not our:
            continue
        lo = min(min(ref), min(our))
        hi = max(max(ref), max(our))
        overlap = (min(max(ref), max(our)) - max(min(ref), min(our)))
        print("threshold %.1f: ref %s ours %s  %s" % (
            t,
            "[%s..%s]" % (fmt_steps(min(ref)), fmt_steps(max(ref))),
            "[%s..%s]" % (fmt_steps(min(our)), fmt_steps(max(our))),
            "ranges OVERLAP" if overlap >= 0 else
            "disjoint (gap %s of span %s)" % (
                fmt_steps(-overlap), fmt_steps(hi - lo))))


if __name__ == "__main__":
    main()
