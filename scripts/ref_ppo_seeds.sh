#!/bin/sh
# Sequential reference-PPO seed sweep for learning-curve parity
# (BASELINE.md north star; VERDICT round-2 item 2). One CPU core on this
# box, so: single-threaded torch, seeds run back to back, nice'd.
set -e
STEPS=${STEPS:-1200000}
OUT=${OUT:-/tmp/refppo}
for seed in 1 2 3; do
    rm -rf "$OUT-s$seed"
    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 nice -n 10 \
        python scripts/ref_ppo_run.py "$OUT-s$seed" \
        --steps "$STEPS" --seed "$seed" \
        --torch-threads 1 > "$OUT-s$seed.log" 2>&1
    echo "seed $seed done"
done
echo ALL_DONE
