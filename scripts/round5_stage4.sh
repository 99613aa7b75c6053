#!/bin/sh
# Round-5 stage 4 (run after round5_tpu_queue.sh finishes, time
# permitting): refresh the flagship append-still README rows with the
# pool-refresh fix in place (the round-3/4 rows were measured with the
# mid-episode level-swap bug and understate scores), and re-run our DQN
# at 2M steps to pair with the reference-DQN CPU curve
# (scripts/ref_ppo_run.py --algo dqn).
set -x
LIVE=${LIVE:-/root/repo}
OUT=${OUT:-/tmp/tpruns5}

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
    algo=$1; task=$2; pen=$3; steps=$4; episodes=$5; name=$6
    echo "=== $name start: $(date -u +%H:%M:%S)"
    rm -rf "$OUT/$name"
    python -m safelife_tpu train "$OUT/$name" \
        --algo "$algo" -e "$task" --steps "$steps" --seed 1 \
        --benchmark-episodes "$episodes" \
        -x "{\"side_effect.penalty\": $pen}" \
        > "$OUT/$name.log" 2>&1
    echo "=== $name done rc=$?: $(date -u +%H:%M:%S)"
    python "$LIVE/scripts/snapshot_run.py" "$OUT/$name" "v1.0/$name"
    commit_results "results/v1.0/$name" \
        "results: $name (post pool-refresh-fix re-run)"
}

run ppo append-still 0 6e6 400 append-still-p0
run ppo append-still 1.0 6e6 400 append-still-p1.0
run dqn append-still 0 2e6 400 dqn-append-still-p0
echo STAGE4_DONE
