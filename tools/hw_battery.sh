#!/bin/bash
# Orchestrated hardware measurement battery for the r3 kernel work.
# Runs each stage SERIALLY (one jax process at a time — single CPU core,
# XLA compiles are single-threaded) with a timeout, logging to
# /tmp/battery/.  Ordered by information value so a partial run still
# answers the biggest questions first.
#
# Usage: bash tools/hw_battery.sh [stage-to-start-from]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/battery
START="${1:-0}"

run() {  # run <num> <name> <timeout> <cmd...>
  local num="$1" name="$2" tmo="$3"; shift 3
  [ "$num" -lt "$START" ] && { echo "skip $num $name"; return; }
  echo "=== stage $num: $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/battery/${num}_${name}.log" 2>&1
  echo "rc=$? -> /tmp/battery/${num}_${name}.log"
  tail -25 "/tmp/battery/${num}_${name}.log"
  mkdir -p artifacts/battery_r3   # persist per-stage (survives round end)
  cp "/tmp/battery/${num}_${name}.log" artifacts/battery_r3/ 2>/dev/null
}

run 0 sanity     120  python -u -c "import jax; print(jax.devices())"
run 1 bench      7200 python -u bench.py  # covers the preset-fallback chain (up to 3 cold compiles)
run 2 pn2_default 2400 python -u tools/ab_pointnet2.py
run 3 pn2_d2_0   2400 env CASPR_TPU_FUSED_D2=0 python -u tools/ab_pointnet2.py
run 4 pn2_onehot 2400 env CASPR_TPU_GATHER=onehot python -u tools/ab_pointnet2.py
run 5 pn2_interp_dense 2400 env CASPR_TPU_INTERP=dense python -u tools/ab_pointnet2.py
run 6 pn2_dma_allc 2400 env CASPR_TPU_GATHER_DMA_ALLC=1 python -u tools/ab_pointnet2.py
run 7 ab_gather  2400 python -u tools/ab_gather.py
run 8 bench_train 2400 python -u tools/bench_train.py
run 9 bench_train_discrete 2400 env CASPR_TPU_ODE_BWD=discrete python -u tools/bench_train.py
run 10 eval_legs  2400 python -u tools/bench_eval_legs.py
run 11 dyngather 2400 python -u tools/probe_dyngather2.py
run 12 ballquery 2400 python -u tools/ab_ballquery.py
run 13 export_check 2400 python -u tools/export_model.py --out /tmp/exported_hw --batch 1 --steps 3 --points 256 --loose-platform-check --check
run 14 pn2_blk   2400 env CASPR_TPU_GATHER=blk python -u tools/ab_pointnet2.py
run 15 pn2_bf16acts 2400 env CASPR_TPU_SA_BF16_ACTS=1 python -u tools/ab_pointnet2.py
run 16 bench_matmul_cast 2400 env CASPR_TPU_MATMUL_CAST=1 python -u bench.py
run 17 bench_bf16_combo 2400 env CASPR_TPU_MATMUL_CAST=1 CASPR_TPU_SA_BF16_ACTS=1 python -u bench.py
run 18 pn2_fps_level 2400 env CASPR_TPU_FPS=level python -u tools/ab_pointnet2.py
run 19 cnf_tile512  2400 env BT=160 CASPR_TPU_CNF_TILE=512 python -u tools/bench_cnf.py
run 20 cnf_tile2048 2400 env BT=160 CASPR_TPU_CNF_TILE=2048 python -u tools/bench_cnf.py
{
  echo "# battery summary $(date)"
  grep -h "seqs/sec\|metric\|ms\b" /tmp/battery/*.log 2>/dev/null | head -80
} > /tmp/battery/SUMMARY.txt
# Persist into the repo so the numbers survive a round-end auto-commit
# even if nobody is around to transcribe them into BENCHMARKS.md.
mkdir -p artifacts/battery_r3
cp /tmp/battery/*.log /tmp/battery/SUMMARY.txt artifacts/battery_r3/ 2>/dev/null
echo "=== battery done ($(date +%H:%M:%S)) — see /tmp/battery/SUMMARY.txt (copied to artifacts/battery_r3/) ==="
