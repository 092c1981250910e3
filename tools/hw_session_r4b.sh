#!/bin/bash
# Serialized r4 continuation measurement battery (one jax process at a
# time — the box has ONE CPU core; see CLAUDE.md).  Logs to /tmp/r4b/.
set -u
mkdir -p /tmp/r4b
cd "$(dirname "$0")/.."

run() {  # run <log-name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  ( "$@" ) >"/tmp/r4b/${name}.log" 2>&1
  echo "--- rc=$? tail:"
  tail -15 "/tmp/r4b/${name}.log" | sed -e 's/\x1b\[[0-9;]*m//g'
}

# 1. e2e reconstruct split, factored fusion ON (new default) vs OFF
run 1_recon_factored python tools/profile_recon.py
run 2_recon_dense env CASPR_TPU_FACTORED_FUSION=0 python tools/profile_recon.py

# 2. headline bench at batch 16 (reconstruct only — train leg separate)
run 3_bench env CASPR_BENCH_TRAIN=0 python bench.py

# 3. batch saturation sweep
run 4_bench_b24 env CASPR_BENCH_TRAIN=0 CASPR_BENCH_BATCH=24 python bench.py
run 5_bench_b32 env CASPR_BENCH_TRAIN=0 CASPR_BENCH_BATCH=32 python bench.py

# 4. SA1 / FP5 op-level stages
run 6_sa1 python tools/profile_sa1.py

# 5. train-step split
run 7_train python tools/profile_train.py
