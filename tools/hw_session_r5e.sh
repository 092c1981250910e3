#!/bin/bash
# r5 batch 7: the manual (stream-stacked) CNF dynamics VJP — the train
# step's per-NFE backward cost is the last lever for the <=200 ms
# target.  Gate first (manual vs autodiff on device), then per-call
# A/B at the train recipe shapes, then the full train step both ways.
# Also carries the r5d leftovers: the fixed train profile and the b64
# saturation probe.  Serialized — one jax process at a time.
#
# Usage: bash tools/hw_session_r5e.sh [stage-to-start-from]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5e
START="${1:-80}"
DEST=artifacts/battery_r5

persist() {
  mkdir -p "$DEST"
  sed -e 's/\x1b\[[0-9;]*m//g' \
      -e '/axon_terminal::\|axon_host::\|Source Location Trace\|libtpu_init_utils/d' \
      "$1" > "$DEST/$(basename "$1")"
}

run() {
  local num="$1" name="$2" tmo="$3"; shift 3
  [ "$num" -lt "$START" ] && { echo "skip $num $name"; return 0; }
  echo "=== stage $num: $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/r5e/${num}_${name}.log" 2>&1
  local rc=$?
  echo "rc=$rc -> /tmp/r5e/${num}_${name}.log"
  tail -15 "/tmp/r5e/${num}_${name}.log"
  persist "/tmp/r5e/${num}_${name}.log"
  return $rc
}

# Exactness gate with the new manual-VJP check — abort on violation
run 80 exactness 3600 python -u tools/hw_exactness.py || {
  echo "EXACTNESS GATE FAILED — aborting session"; exit 1; }
# Train profile re-run (r4b stage 7 / r5b stage 49 both crashed; the
# donated-carry fix is in) — the fwd/bwd/opt split that sizes the wins
run 81 profile_train 3600 python -u tools/profile_train.py
# Per-call dynamics VJP at the train recipe shapes (BT=25, N=1024)
run 82 cnf_bwd_xla 1800 env CASPR_TPU_CNF_BWD=xla BT=25 N=1024 \
    python -u tools/bench_cnf_bwd.py
run 83 cnf_bwd_manual 1800 env CASPR_TPU_CNF_BWD=manual BT=25 N=1024 \
    python -u tools/bench_cnf_bwd.py
# Full train step A/B (fwd + adjoint bwd + Adam at reference recipe)
run 84 train_xla 3600 env CASPR_TPU_CNF_BWD=xla python -u tools/bench_train.py
run 85 train_manual 3600 env CASPR_TPU_CNF_BWD=manual \
    python -u tools/bench_train.py
# b64 saturation probe (b48 fits at 35.18; b64 OOMed every r4 preset —
# re-check with the split gather's 3x bf16 tables gone)
run 86 bench_b64 3600 env CASPR_BENCH_BATCH=64 python -u bench.py
echo "=== r5e done ($(date +%H:%M:%S)) ==="
echo "If stage 85 beats 84: flip _bwd_mode auto -> manual, re-run"
echo "stages 80+85, then the defaults bench (python bench.py) as the"
echo "driver-facing number; update BENCHMARKS.md/CLAUDE.md."
