#!/bin/bash
# Relinearization dbc sweep (VERDICT r4 missing-6): the reference grid
# carries dbc in {16,32,60} but never builds evaluation keys (SURVEY 2.4) --
# ours actually relinearizes, so the sweep is a beyond-reference result:
# noise budget + RMS + per-op ms as a function of the decomposition bit
# count, encrypted-fract ct*ct bilinear at n=4096/t=101, 16x16 -> 8x8
# through the real CLI protocol.  Writes bench_results/dbc_sweep/.
set -eu
cd /root/repo
W=/tmp/fhetpu_dbc
OUT=bench_results/dbc_sweep
mkdir -p $W $OUT
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
python - <<'EOF'
from PIL import Image
Image.open('/root/reference/image/boazbarak.jpg').convert('RGB').resize((16,16)).save('/tmp/fhetpu_dbc/boaz16.png')
EOF
# u32 primes cap digit_bits at 30 (the reference's {16,32,60} targets its
# 62-bit SEAL primes); the meaningful sweep for a <2^30-prime RNS chain is
# within [8, 30] -- same role: relin-noise vs key-size/time trade.
for DBC in 8 16 30; do
  log=$OUT/bilinear_relin_4096_101_dbc${DBC}.txt
  : > $log
  echo "== dbc=$DBC ==" | tee -a $log
  rm -rf $W/keys $W/c2s.bin $W/s2c.bin
  S=(--keydir $W/keys --width 8 --height 8 --relin --dbc $DBC)
  python -m fhetpu.cli.client_resize --send -f $W/boaz16.png -c $W/c2s.bin \
      --cmod 4096 --pmod 101 "${S[@]}" >> $log 2>&1
  timeout 1800 python -m fhetpu.cli.server_resize -i $W/c2s.bin \
      -c $W/s2c.bin "${S[@]}" --verbose >> $log 2>&1
  python -m fhetpu.cli.client_resize --recieve -f $W/boaz16.png \
      -i $W/s2c.bin -o $W/out_dbc${DBC}.png "${S[@]}" >> $log 2>&1
  grep -E "noise|Linear,|RMSError|Encryption|Decryption" $log | tail -6
done
