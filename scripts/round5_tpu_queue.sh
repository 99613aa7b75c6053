#!/bin/sh
# Round-5 TPU job queue, stage 1: the nine remaining v1.0 results-table
# runs (VERDICT round-4 item 2; navigate-p0 landed in round 4). One chip
# -> strictly sequential. Unlike round 4's queue (whose outputs vanished
# into /tmp — VERDICT item 7), every run snapshots its evidence into
# results/v1.0/<name>/ and commits it IMMEDIATELY, so a half-finished
# queue still lands committed artifacts.
#
# Run from a frozen copy of the repo (library code pinned at the commit
# whose XLA compile cache is already warm); snapshots land in the live
# repo at $LIVE.
set -x
LIVE=${LIVE:-/root/repo}
OUT=${OUT:-/tmp/tpruns5}
mkdir -p "$OUT"

commit_results() {
    # Commit only the named results path; retry around concurrent
    # index.lock use by the interactive session.
    path=$1; msg=$2
    for i in 1 2 3 4 5 6 7 8 9 10; do
        (cd "$LIVE" && git add "$path" && git commit -m "$msg" -- "$path") \
            && return 0
        sleep 20
    done
    echo "COMMIT FAILED: $path"
}

run() {
    task=$1; pen=$2; episodes=$3
    name="$task-p$pen"
    echo "=== $name (benchmark $episodes episodes) start: $(date -u +%H:%M:%S)"
    rm -rf "$OUT/$name"
    python -m safelife_tpu train "$OUT/$name" \
        --algo ppo -e "$task" --steps 6e6 --seed 1 \
        --benchmark-episodes "$episodes" \
        -x "{\"side_effect.penalty\": $pen}" \
        > "$OUT/$name.log" 2>&1
    rc=$?
    echo "=== $name done rc=$rc: $(date -u +%H:%M:%S)"
    python "$LIVE/scripts/snapshot_run.py" "$OUT/$name" "v1.0/$name"
    commit_results "results/v1.0/$name" \
        "results: $name v1.0 benchmark run (PPO 6M steps, penalty $pen)"
}

# One row per task first (partial completion still fills the table),
# second-penalty rows after. prune-spawn p0 sweeps the full 1000
# episodes to measure the spawn-task scoring wall time.
run prune-spawn 1.0 400
run append-dynamic 1.0 400
run prune-dynamic 1.0 400
run prune-still-hard 1.0 400
run prune-spawn 0 1000
run navigate 1.0 400
run append-dynamic 0 400
run prune-dynamic 0 400
run prune-still-hard 0 400
echo STAGE1_DONE
