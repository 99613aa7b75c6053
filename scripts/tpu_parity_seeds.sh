#!/bin/sh
# Our side of the learning-curve parity comparison (BASELINE.md north
# star; VERDICT round-2 item 2): PPO on append-still, matched to the
# reference configuration — 16 env lanes (the reference's env count,
# base_algo.py:191-244 steps 16 serial envs), identical hyperparameters
# (training/ppo.py replicates training/ppo.py:26-43), penalty 0,
# 1.2M env steps, 3 seeds. Benchmark sweeps skipped (curves only).
set -e
STEPS=${STEPS:-1200000}
OUT=${OUT:-/tmp/tpuppo}
for seed in 1 2 3; do
    rm -rf "$OUT-s$seed"
    python -m safelife_tpu train "$OUT-s$seed" \
        --algo ppo -e append-still --batch 16 \
        --steps "$STEPS" --seed "$seed" --skip-benchmark \
        > "$OUT-s$seed.log" 2>&1
    echo "seed $seed done"
done
echo ALL_DONE
