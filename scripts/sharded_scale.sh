#!/bin/bash
# Sharded stencil engine at scale (VERDICT r4 item 7): one committed
# 8-device CPU-mesh CLI run at a non-trivial size -- 48x48 (the reference's
# own benchmark image, full size) -> 24x24 bilinear, ENCRYPTED fracts +
# relinearization, n=4096/t=101 (the largest ring whose noise budget admits
# the ct*ct bilinear chain; the bicubic chain needs n=8192, whose host-CPU
# cost is ~1.3 s/interp -- see docs/scaling.md for that arithmetic and the
# TPU artifacts that cover bicubic).  A 96x96 run was attempted first: the
# 8-virtual-device XLA:CPU halo graph materialized ~92 GB of host buffers
# (every "device" is the same RAM), so the committed size is the largest
# that fits this 2-vCPU/125GB driver host comfortably alongside the TPU
# sweep; per-device halo-byte arithmetic for larger meshes is in
# docs/scaling.md.  The sharded run must decode to the SAME image as the
# single-device streaming-window run: identical math, different engine.
set -eu
cd /root/repo
W=/tmp/fhetpu_shardscale
OUT=bench_results/sharded_scale.txt
mkdir -p $W
export PYTHONPATH=/root/repo:${PYTHONPATH:-} JAX_PLATFORMS=cpu
: > $OUT
log() { echo "$@" | tee -a $OUT; }
run() { "$@" 2>&1 | tee -a $OUT; }
IMG=/root/reference/image/boazbarak.jpg
ARGS=(--keydir $W/keys --width 24 --height 24 --relin --dbc 16)
log "# 48x48 -> 24x24 bilinear, encrypted fracts + relin, n=4096 t=101 dbc=16"
log "## client --send"
run python -m fhetpu.cli.client_resize --send -f $IMG -c $W/c2s.bin \
    --cmod 4096 --pmod 101 "${ARGS[@]}"
log "## server --sharded (8-device CPU mesh, sp halo engine)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
run timeout 7200 python -m fhetpu.cli.server_resize -i $W/c2s.bin \
    -c $W/s2c_sharded.bin "${ARGS[@]}" --sharded --verbose
log "## server single-device (streaming-window engine)"
run timeout 7200 python -m fhetpu.cli.server_resize -i $W/c2s.bin \
    -c $W/s2c_single.bin "${ARGS[@]}"
log "## client --recieve (sharded)"
run python -m fhetpu.cli.client_resize --recieve -f $IMG \
    -i $W/s2c_sharded.bin -o $W/out_sharded.png "${ARGS[@]}"
log "## client --recieve (single)"
run python -m fhetpu.cli.client_resize --recieve -f $IMG \
    -i $W/s2c_single.bin -o $W/out_single.png "${ARGS[@]}"
log "## decoded-image comparison"
python - <<'EOF' | tee -a bench_results/sharded_scale.txt
import numpy as np
from PIL import Image
a = np.asarray(Image.open('/tmp/fhetpu_shardscale/out_sharded.png'))
b = np.asarray(Image.open('/tmp/fhetpu_shardscale/out_single.png'))
diff = np.abs(a.astype(int) - b.astype(int))
print(f"sharded-vs-single: max|diff|={diff.max()} mismatching px={int((diff!=0).sum())}/{a.size}")
EOF
log "# done"
