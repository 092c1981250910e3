#!/bin/bash
# r5 batch 6: post-r5c follow-ups — the re-run of the crashed train
# profile (donated-carry fix in tools/profile_train.py), the b64
# saturation probe now that shuf freed the split gather's HBM, and a
# defaults re-confirmation bench.  Run AFTER hw_session_r5c.sh.
# Serialized — one jax process at a time.
#
# Usage: bash tools/hw_session_r5d.sh [stage-to-start-from]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5d
START="${1:-70}"
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
  timeout "$tmo" "$@" >"/tmp/r5d/${num}_${name}.log" 2>&1
  local rc=$?
  echo "rc=$rc -> /tmp/r5d/${num}_${name}.log"
  tail -15 "/tmp/r5d/${num}_${name}.log"
  persist "/tmp/r5d/${num}_${name}.log"
  return $rc
}

# Re-run of battery r4b stage 7 / r5b stage 49: full train-step profile
# (the donated (params, opt, state) carry is now chained through the
# timing loop instead of re-passing deleted buffers)
run 70 profile_train 3600 python -u tools/profile_train.py
# b64 saturation probe (b48 fits under r5-defaults at 35.18 seqs/sec;
# b64 OOMed every preset in r4 — re-check with the split tables gone)
run 71 bench_b64 3600 env CASPR_BENCH_BATCH=64 python -u bench.py
# Defaults bench at the new default batch (48) — the driver-facing number
run 72 bench_defaults 3600 python -u bench.py
echo "=== r5d done ($(date +%H:%M:%S)) ==="
