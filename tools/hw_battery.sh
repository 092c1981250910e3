#!/bin/bash
# Orchestrated hardware measurement battery for the kernel work.
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
DEST=artifacts/battery_r4

persist() {  # strip ANSI escapes + axon infra lines before committing logs
  mkdir -p "$DEST"
  sed -e 's/\x1b\[[0-9;]*m//g' \
      -e '/axon_terminal::\|axon_host::\|Source Location Trace\|libtpu_init_utils/d' \
      "$1" > "$DEST/$(basename "$1")"
}

run() {  # run <num> <name> <timeout> <cmd...>
  local num="$1" name="$2" tmo="$3"; shift 3
  [ "$num" -lt "$START" ] && { echo "skip $num $name"; return 0; }
  echo "=== stage $num: $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/battery/${num}_${name}.log" 2>&1
  local rc=$?
  echo "rc=$rc -> /tmp/battery/${num}_${name}.log"
  tail -25 "/tmp/battery/${num}_${name}.log"
  persist "/tmp/battery/${num}_${name}.log"
  return $rc
}

run 0 sanity     120  python -u -c "import jax; print(jax.devices())"
# Numeric gate FIRST: no timing below means anything if a kernel is wrong
# (r3 shipped a bit-wrong default gather that only this would have caught).
run 1 exactness  1800 python -u tools/hw_exactness.py
if [ $? -ne 0 ] && [ "$START" -le 1 ]; then
  echo "!!! EXACTNESS GATE FAILED — aborting battery; fix numerics first."
  exit 1
fi
run 2 bench      7200 python -u bench.py  # covers the preset-fallback chain
run 3 pn2_default 2400 python -u tools/ab_pointnet2.py
run 4 pn2_d2_0   2400 env CASPR_TPU_FUSED_D2=0 python -u tools/ab_pointnet2.py
run 5 pn2_onehot 2400 env CASPR_TPU_GATHER=onehot python -u tools/ab_pointnet2.py
run 6 pn2_interp_dense 2400 env CASPR_TPU_INTERP=dense python -u tools/ab_pointnet2.py
run 7 ab_gather  2400 python -u tools/ab_gather.py
run 8 bench_train 2400 python -u tools/bench_train.py
run 9 bench_train_discrete 2400 env CASPR_TPU_ODE_BWD=discrete python -u tools/bench_train.py
run 10 eval_legs  2400 python -u tools/bench_eval_legs.py
run 11 ballquery 2400 python -u tools/ab_ballquery.py
run 12 export_check 2400 python -u tools/export_model.py --out /tmp/exported_hw --batch 1 --steps 3 --points 256 --loose-platform-check --check
run 13 cnf_tiles 2400 env BT=160 python -u tools/bench_cnf.py
run 14 profile_pn2 3600 python -u tools/profile_pn2.py
{
  echo "# battery summary $(date)"
  grep -h "seqs/sec\|metric\|ms \|PASS\|FAIL" /tmp/battery/*.log 2>/dev/null | head -100
} > /tmp/battery/SUMMARY.txt
persist /tmp/battery/SUMMARY.txt
echo "=== battery done ($(date +%H:%M:%S)) — see /tmp/battery/SUMMARY.txt (persisted to $DEST/) ==="
