#!/bin/bash
# Pure-FHE Taylor decode ON THE CHIP (VERDICT r4 item 4): the component we
# fixed relative to the reference's buggy-and-never-executed overload
# (fhe_decode.h:202-242, the :229 j/i bug).  Config inside the documented
# plaintext digit-growth envelope (pipelines/rle_decode.py
# approximated_step_fhe docstring): t=2^24, 10 fractional digits, degree 2,
# amplitudes < 50; n=16384 is the one ring whose noise budget admits the
# relinearized Taylor chain (bfv/noise.py estimate_taylor_decode).
# Writes bench_results/decode_pure_fhe.txt: RMS vs input + per-step timing;
# the server also logs the runtime noise-gate estimate.
set -eu
cd /root/repo
W=/tmp/fhetpu_purefhe
OUT=bench_results/decode_pure_fhe.txt
mkdir -p $W
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
# constant-per-channel 4x4 image: one RLE run per row (4 pairs/channel,
# 12 total) -- each eager Taylor pair chain stages ~5 GB of client-side
# buffers on the remote-TPU path, and the earlier 24-pair content was
# OOM-killed at 130 GB.  Amplitudes inside the <~50 envelope.
python - <<'EOF'
from PIL import Image
import numpy as np
img = np.zeros((4, 4, 3), np.uint8)
img[..., 0], img[..., 1], img[..., 2] = 40, 25, 10
Image.fromarray(img, 'RGB').save('/tmp/fhetpu_purefhe/dark4.png')
EOF
: > $OUT
log() { echo "$@" | tee -a $OUT; }
run() { "$@" 2>&1 | tee -a $OUT; }
# NOTE: the decode protocol's params.txt carries no t (matching the
# reference, whose client/server must be launched with identical flags),
# so --pmod/--fcoeff ride on EVERY stage including the server.
FLAGS=(--keydir $W/keys --order 64 --degree 2 --relin --dbc 16
       --pmod 16777216 --fcoeff 10)
log "# pure-FHE Taylor decode, n=16384 t=2^24 fcoeff=10 degree=2 order=64 relin dbc=16"
log "## client --send"
run python -m fhetpu.cli.client_decode --send -f $W/dark4.png -c $W/c2s.bin \
    --cmod 16384 "${FLAGS[@]}"
log "## server --pure-fhe (TPU)"
run timeout 7200 python -m fhetpu.cli.server_decode -i $W/c2s.bin \
    -c $W/s2c.bin --pure-fhe "${FLAGS[@]}"
log "## client --recieve"
run python -m fhetpu.cli.client_decode --recieve -f $W/dark4.png \
    -i $W/s2c.bin -o $W/out.png --cmod 16384 \
    "${FLAGS[@]}"
log "## RMS vs input"
python - <<'EOF' | tee -a bench_results/decode_pure_fhe.txt
import numpy as np
from PIL import Image
a = np.asarray(Image.open('/tmp/fhetpu_purefhe/out.png')).astype(np.float64)
b = np.asarray(Image.open('/tmp/fhetpu_purefhe/dark4.png')).astype(np.float64)
print(f"RMS_vs_input,{np.sqrt(((a-b)**2).mean()):.4f},")
EOF
log "# done"
log "## trusted-overload oracle (same series params, plaintext math, CPU)"
JAX_PLATFORMS=cpu run timeout 600 python -m fhetpu.cli.server_decode \
    -i $W/c2s.bin -c $W/s2c_trusted.bin --platform cpu "${FLAGS[@]}"
JAX_PLATFORMS=cpu run python -m fhetpu.cli.client_decode --recieve \
    -f $W/dark4.png -i $W/s2c_trusted.bin -o $W/out_trusted.png \
    --cmod 16384 "${FLAGS[@]}"
python - <<'PYEOF' | tee -a bench_results/decode_pure_fhe.txt
import numpy as np
from PIL import Image
a = np.asarray(Image.open('/tmp/fhetpu_purefhe/out.png')).astype(np.float64)
b = np.asarray(Image.open('/tmp/fhetpu_purefhe/out_trusted.png')).astype(np.float64)
print(f"pure-FHE vs trusted RMS,{np.sqrt(((a-b)**2).mean()):.4f},")
print(f"pure-FHE vs trusted max px diff,{int(np.abs(a-b).max())},")
PYEOF
