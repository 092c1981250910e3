#!/bin/bash
# Follow-up measurement stages (run AFTER tools/hw_battery.sh completes —
# same serialization rule: one jax process at a time).  Covers opt-ins the
# main battery doesn't A/B.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/battery
START="${1:-20}"
DEST=artifacts/battery_r4

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
  timeout "$tmo" "$@" >"/tmp/battery/${num}_${name}.log" 2>&1
  local rc=$?
  echo "rc=$rc -> /tmp/battery/${num}_${name}.log"
  tail -25 "/tmp/battery/${num}_${name}.log"
  persist "/tmp/battery/${num}_${name}.log"
  return $rc
}

# SA bf16 activations (bit-identical convs on TPU, half HBM bytes on the
# big grouped intermediates) — unmeasured opt-in from r3
run 20 pn2_bf16_acts 2400 env CASPR_TPU_SA_BF16_ACTS=1 python -u tools/ab_pointnet2.py
# eval legs with the new batched chamfer (r4) vs the r3 75 ms number
run 21 eval_legs_chunk4 2400 env CASPR_TPU_CD_CHUNK=4 python -u tools/bench_eval_legs.py
run 22 eval_legs_chunk30 2400 env CASPR_TPU_CD_CHUNK=30 python -u tools/bench_eval_legs.py
echo "=== battery2 done ($(date +%H:%M:%S)) ==="
