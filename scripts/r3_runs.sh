#!/bin/bash
# Round-3 sequential TPU measurement plan (run one at a time; the chip
# wedges if experiments stack — CLAUDE.md). Each run appends one JSON
# line + timing context to /tmp/r3_results.log.
set -u
LOG=/tmp/r3_results.log
cd /root/repo

run() {
  local tag="$1"; shift
  echo "=== $tag [$(date -u +%H:%M:%S)] $*" >> "$LOG"
  timeout 3600 env "$@" python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? [$(date -u +%H:%M:%S)]" >> "$LOG"
  sleep 10
}

case "${1:-all}" in
  warm)   # warm-cache flagship rerun (the driver-shaped number)
    run warm1024k1 PROTON_BENCH_N=1024 PROTON_BENCH_K=1 ;;
  k2)     # the BASELINE north star
    run k2_512  PROTON_BENCH_N=512  PROTON_BENCH_K=2
    run k2_1024 PROTON_BENCH_N=1024 PROTON_BENCH_K=2 ;;
  f64)    # accurate-mode H1 at scale
    run f64_512  PROTON_BENCH_N=512  PROTON_BENCH_K=1 PROTON_BENCH_PRECISION=f64
    run f64_1024 PROTON_BENCH_N=1024 PROTON_BENCH_K=1 PROTON_BENCH_PRECISION=f64 ;;
  4096)   # stretch: lean path
    run lean4096 PROTON_BENCH_N=4096 PROTON_BENCH_K=1 ;;
  *) echo "usage: r3_runs.sh {warm|k2|f64|4096}" ;;
esac
