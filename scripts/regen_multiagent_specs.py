#!/usr/bin/env python
"""Regenerate the multi-agent procgen parameter specs.

The multi-agent task *parameter values* (agent rosters, per-agent points
tables, region compositions) are a distribution-parity target: levels
generated here must be drawn from the same difficulty distribution as the
reference's multi-agent tasks (reference
``safelife/levels/random/multi-agent/*.yaml``). This script parses the
reference specs and re-emits them in this repo's yaml format, asserting
that the emitted files parse back to exactly the same values.

It also writes ``prune-still.yaml``: the reference's ``multi-prune`` task
registry names ``random/multi-agent/prune-still`` but ships no such file
(a dangling reference); we synthesize a two-agent variant of our own
prune-still spec so the task is actually trainable.

Run from the repo root:  python scripts/regen_multiagent_specs.py
"""

import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/safelife/levels/random/multi-agent"
OUT_DIR = os.path.join(REPO, "safelife_tpu/levels/random/multi-agent")

HEADERS = {
    "asym1": "Asymmetric two-agent task: cyan builds its own goals while\n"
             "magenta earns on magenta goals and is penalized for red "
             "cells.",
    "asym1-pretrain-cyanonly": "Cyan-only pretraining slice of asym1.",
    "asym1-pretrain-redonly": "Magenta-only pretraining slice of asym1 "
                              "(red pattern region).",
    "asym2": "Harder asymmetric task variant.",
    "build-compete": "Red and yellow agents race for the same blue goals.",
    "build-coop": "Two identical default agents share one build task.",
    "build-parallel": "Cyan and magenta each build their own color goals "
                      "in\nseparate regions.",
    "prune-still": "Two-agent prune task (our addition: the reference's\n"
                   "multi-prune registry names this file but never "
                   "shipped it).",
}


def emit(data, name):
    """Write one spec in this repo's format and verify value parity."""
    header = HEADERS.get(name, "Multi-agent task parameters.")
    body = yaml.safe_dump(data, default_flow_style=False, sort_keys=False,
                          width=78)
    text = "".join("# %s\n" % line for line in header.split("\n"))
    text += "---\n" + body
    path = os.path.join(OUT_DIR, name + ".yaml")
    with open(path, "w") as f:
        f.write(text)
    with open(path) as f:
        assert yaml.safe_load(f) == data, "round-trip mismatch: %s" % name
    print("wrote", os.path.relpath(path, REPO))


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    if not os.path.isdir(REF_DIR):
        sys.exit("reference multi-agent specs not found at %s" % REF_DIR)
    for fn in sorted(os.listdir(REF_DIR)):
        if not fn.endswith(".yaml"):
            continue
        with open(os.path.join(REF_DIR, fn)) as f:
            data = yaml.safe_load(f)
        emit(data, fn[:-5])

    # Our prune-still spec: this repo's single-agent prune-still values
    # with a two-agent roster.
    with open(os.path.join(
            REPO, "safelife_tpu/levels/random/prune-still.yaml")) as f:
        base = yaml.safe_load(f)
    base["agents"] = ["default", "default"]
    emit(base, "prune-still")


if __name__ == "__main__":
    main()
