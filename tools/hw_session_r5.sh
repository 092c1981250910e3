#!/bin/bash
# Serialized r5 hardware battery — encoder kernel A/Bs after the
# lane-shuffle (shuf) gather flip.  ONE jax process at a time (single
# CPU core; see CLAUDE.md).  Logs to $OUT (default /tmp/r5).
#
# Stages:
#  10  ab_pointnet2, r5 defaults (shuf gather, MXU interp, factored SA)
#  11  ab_pointnet2, CASPR_TPU_INTERP=shuf
#  12  ab_pointnet2, CASPR_TPU_SA=fused3 (+ interp shuf)
#  13  ab_pointnet2, CASPR_TPU_SA=fused3, interp default
#  14  profile_pn2 stage breakdown at the stage-10..13 winner (edit env!)
#  15  bench.py reconstruct at b32 under final defaults
#  16  bench_train at final defaults
#  17  bench_train with CASPR_TPU_MATMUL_CAST=1 (adjoint bwd bf16 A/B)
set -u
OUT=${OUT:-/tmp/r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

START=${1:-10}

run() {
  local n=$1; shift
  if [ "$n" -lt "$START" ]; then return; fi
  echo "=== stage $n: $* ==="
  timeout 3600 "$@" > "$OUT/${n}.log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))"
}

run 10 python tools/ab_pointnet2.py
run 11 env CASPR_TPU_INTERP=shuf python tools/ab_pointnet2.py
run 12 env CASPR_TPU_SA=fused3 CASPR_TPU_INTERP=shuf python tools/ab_pointnet2.py
run 13 env CASPR_TPU_SA=fused3 python tools/ab_pointnet2.py
run 14 python tools/profile_pn2.py
run 15 python bench.py
run 16 python tools/bench_train.py
run 17 env CASPR_TPU_MATMUL_CAST=1 python tools/bench_train.py

echo "battery done; logs in $OUT"
