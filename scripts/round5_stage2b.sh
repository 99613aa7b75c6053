#!/bin/sh
# Round-5 stage 2b: remaining v1.0 results-table runs, reordered after
# the first penalized-dynamic row (append-dynamic p1.0) came back
# collapsed-to-inaction (the reference paper's own dynamic-task result):
# no-penalty rows first so every remaining task gets an informative row,
# the 1000-episode prune-spawn-p0 timing run, then the remaining
# penalty rows. Runs under the round-5 HEAD (scanned-minibatch learner
# -> ~3x faster cold compiles than stage 2's frozen copy).
set -x
LIVE=${LIVE:-/root/repo}
OUT=${OUT:-/tmp/tpruns5}
mkdir -p "$OUT"

commit_results() {
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
    echo "=== $name done rc=$?: $(date -u +%H:%M:%S)"
    python "$LIVE/scripts/snapshot_run.py" "$OUT/$name" "v1.0/$name"
    commit_results "results/v1.0/$name" \
        "results: $name v1.0 benchmark run (PPO 6M steps, penalty $pen)"
}

run prune-still-hard 0 400
run append-dynamic 0 400
run prune-dynamic 0 400
run prune-spawn 0 1000
run prune-still-hard 1.0 400
run navigate 1.0 400
echo STAGE2B_DONE

python bench/bench_train.py --grid > "$OUT/bench_train.jsonl" 2>"$OUT/bench_train.log"
cp "$OUT/bench_train.jsonl" "$LIVE/results/bench_train_r05.jsonl"
commit_results "results/bench_train_r05.jsonl" \
    "results: learner throughput grid (packed/unpacked x f32/bf16)"
echo STAGE3_BENCH_DONE
