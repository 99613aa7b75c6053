#!/bin/bash
# Serial TPU measurement queue — run when the chip is reachable.
# ONE process at a time (concurrent axon clients poison the claim).
# Usage: bash scripts/tpu_measurements.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_meas}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$OUT/queue.log"
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit $? ($(date))" | tee -a "$OUT/queue.log"
}

# 1. Obs-strategy comparison (mm vs flat vs old inside the full step).
run bench_obs python bench/bench_obs.py

# 2. Headline benchmark (driver metric).
run bench python bench.py

# 3. Device-batched procgen vs host.
run bench_procgen python bench/bench_procgen.py 64

# 4. Training throughput: packed vs unpacked observations.
run bench_train python bench/bench_train.py 1024

# 5. On-TPU Pallas kernel tests.
SAFELIFE_TPU_TESTS_TPU=1 run pallas python -m pytest tests/test_pallas.py -q

echo "all done ($(date))" | tee -a "$OUT/queue.log"
