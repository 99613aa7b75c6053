#!/bin/sh
# Round-4 TPU job queue (one chip -> strictly sequential). Order is by
# judge value: learning-curve parity seeds (BASELINE.md north star),
# device-procgen measurement (VERDICT round-2 item 4), then the v1.0
# results-table runs (item 3; ordered one-row-per-task-first inside
# tpu_results_table.sh so partial completion still fills the table).
set -x
sh scripts/tpu_parity_seeds.sh > /tmp/tpuppo_sweep.log 2>&1
echo "parity sweep rc=$?"
for b in 8 64 256; do
    python bench/bench_procgen.py "$b" > "/tmp/procgen_tpu_b$b.log" 2>&1
    echo "procgen bench b=$b rc=$?"
done
sh scripts/tpu_results_table.sh > /tmp/tpruns_queue.log 2>&1
echo "results table rc=$?"
echo QUEUE_DONE
