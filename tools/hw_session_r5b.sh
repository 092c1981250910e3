#!/bin/bash
# r5 batch 4 (rebuilt after the 8/19 tunnel drop): the measurement stages
# that were queued when the tunnel went down, plus the factored-FP-conv1
# A/B (commit 7d02474, not yet hardware-measured).  Serialized — one jax
# process at a time (single CPU core, see CLAUDE.md).
#
# Usage: bash tools/hw_session_r5b.sh [stage-to-start-from]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5b
START="${1:-40}"
DEST=artifacts/battery_r5

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
  timeout "$tmo" "$@" >"/tmp/r5b/${num}_${name}.log" 2>&1
  local rc=$?
  echo "rc=$rc -> /tmp/r5b/${num}_${name}.log"
  tail -15 "/tmp/r5b/${num}_${name}.log"
  persist "/tmp/r5b/${num}_${name}.log"
  return $rc
}

run 40 sanity 180 python -u -c "import jax; print(jax.devices())"
# Numeric gate FIRST — no timing below means anything if a kernel is wrong.
run 41 exactness 1800 python -u tools/hw_exactness.py
if [ $? -ne 0 ] && [ "$START" -le 41 ]; then
  echo "!!! EXACTNESS GATE FAILED — aborting battery; fix numerics first."
  exit 1
fi
# Factored FP conv1 A/B (HEAD default vs reference order)
run 42 pn2_default 2400 python -u tools/ab_pointnet2.py
run 43 pn2_factored_fp0 2400 env CASPR_TPU_FACTORED_FP=0 python -u tools/ab_pointnet2.py
# Remaining unmeasured opt-ins
run 44 pn2_shuf_rows 2400 env CASPR_TPU_GATHER_SHUF_ROWS=1 python -u tools/ab_pointnet2.py
run 45 pn2_bf16_acts 2400 env CASPR_TPU_SA_BF16_ACTS=1 python -u tools/ab_pointnet2.py
run 46 profile_pn2 3600 python -u tools/profile_pn2.py
# Headline + b48 ceiling re-check (shuf gather deleted the 3x split tables)
run 47 bench_b32 7200 python -u bench.py
run 48 bench_b48 7200 env CASPR_BENCH_BATCH=48 python -u bench.py
run 49 profile_train 3600 python -u tools/profile_train.py
run 50 profile_recon 3600 python -u tools/profile_recon.py
# Final-defaults quality artifact (VERDICT r4 #2 re-run under r5 defaults)
run 51 eval_final 7200 python -u test.py --data-cfg data/configs/demo.cfg \
  --weights artifacts/demo_trained.pkl --eval-shape-recon-observed \
  --seq-len 10 --num-pts 2048 --batch-size 3 --out /tmp/r5b/eval_final
if [ -f /tmp/r5b/eval_final/test_log.txt ]; then
  mkdir -p "$DEST/eval_final"
  cp /tmp/r5b/eval_final/test_log.* "$DEST/eval_final/"
fi
echo "=== r5b battery done ($(date +%H:%M:%S)) — logs in /tmp/r5b, persisted to $DEST ==="
