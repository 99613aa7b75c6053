#!/bin/sh
# Fill the v1.0 results table (VERDICT round-2 item 3): train + benchmark
# PPO at side-effect penalty 0 and 1.0 on the five frozen tasks that had
# no README rows — navigate, prune-spawn, append-dynamic, prune-dynamic,
# prune-still-hard. 6M env steps (the reference default,
# start-training.py:44), 400 benchmark episodes like the existing rows,
# except the prune-spawn penalty-0 run which sweeps the full 1000
# episodes to record the MEASURED spawn-task scoring wall time
# (PARITY.md previously estimated ~42 min).
set -e
OUT=${OUT:-/tmp/tpruns}
mkdir -p "$OUT"
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
    echo "=== $name done: $(date -u +%H:%M:%S)"
}
# One row per task first (partial completion still fills the table),
# second-penalty rows after.
run navigate 0 400
run prune-spawn 1.0 400
run append-dynamic 1.0 400
run prune-dynamic 1.0 400
run prune-still-hard 1.0 400
run prune-spawn 0 1000
run navigate 1.0 400
run append-dynamic 0 400
run prune-dynamic 0 400
run prune-still-hard 0 400
echo ALL_DONE
