#!/bin/bash
# Round-5 TPU follow-up queue (after the grid sweep): the three missing
# bench_core on-chip numbers, the pure-FHE decode artifact, the dbc sweep,
# then the remaining bicubic@16384 grid cells.
set -u
cd /root/repo
echo "=== bench_core: cubic ct*ct + harmonics_order64 (VERDICT r4 item 2) ==="
timeout 3000 python scripts/bench_core.py --only cubic_ctct_relin16,cubic_ctct_faithful,harmonics_order 2>&1
echo "=== pure-FHE decode on chip (VERDICT r4 item 4) ==="
timeout 3000 bash scripts/decode_pure_fhe.sh 2>&1
echo "=== relin dbc sweep (VERDICT r4 missing-6) ==="
timeout 3000 bash scripts/dbc_sweep.sh 2>&1
echo "=== grid: bicubic@16384 ==="
FHETPU_BENCH_STAGE_TIMEOUT=2700 python -m fhetpu.bench.benchmark \
  --out bench_results/grid --workdir /tmp/fhetpu_grid5 \
  --pipelines bicubic --ns 16384 \
  --pmods 11,31,101,307,1009,3001,10007,30011,100003 2>&1
echo "=== FOLLOWUP DONE ==="
