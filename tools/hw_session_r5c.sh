#!/bin/bash
# r5 batch 5: lanes-packed SA conv stack + packed-emit gather measurement
# (ops/sa_packed.py, CASPR_TPU_SA_STACK=packed).  Run AFTER
# hw_session_r5b.sh.  Serialized — one jax process at a time.
#
# Usage: bash tools/hw_session_r5c.sh [stage-to-start-from]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5c
START="${1:-60}"
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
  timeout "$tmo" "$@" >"/tmp/r5c/${num}_${name}.log" 2>&1
  local rc=$?
  echo "rc=$rc -> /tmp/r5c/${num}_${name}.log"
  tail -15 "/tmp/r5c/${num}_${name}.log"
  persist "/tmp/r5c/${num}_${name}.log"
  return $rc
}

# Numeric gate first (now includes the packed gather + packed stack)
run 60 exactness 1800 python -u tools/hw_exactness.py
if [ $? -ne 0 ] && [ "$START" -le 60 ]; then
  echo "!!! EXACTNESS GATE FAILED — aborting; fix numerics first."
  exit 1
fi
# Op-level A/B: stack-only and full gather+stack chains at SA1/SA2 shapes
run 61 ab_sa_stack 2400 python -u tools/ab_sa_stack.py
# End-to-end encoder under the packed stack
run 62 pn2_packed 2400 env CASPR_TPU_SA_STACK=packed python -u tools/ab_pointnet2.py
echo "=== r5c done ($(date +%H:%M:%S)) ==="
