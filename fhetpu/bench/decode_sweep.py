"""Decode-pipeline sweep (port of benchmark/decode.py).

The reference sweeps the Fourier-step hyperparameters over the encrypted
run-length decode pipeline (benchmark/decode.py:4-12): one --send, then for
each (degree, delta) a server run + a --recieve producing
``decode_out/out_<degree>_<delta>.png``.  (The reference script calls stale
binary names ``decode_client``/``decode_server``; this port drives the real
drivers.)

Usage: python -m fhetpu.bench.decode_sweep [--image PATH] [--out DIR]
       [--quick] [--pure-fhe] [--order N] [--cmod N] [--pmod T]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

DEGREE = [8, 16, 32, 48, 64]  # benchmark/decode.py:4
DELTA = [0.1, 0.2, 0.3, 0.4, 0.5]  # benchmark/decode.py:5


def run(cmd, log, env=None):
    with open(log, "a") as f:
        f.write("$ " + " ".join(cmd) + "\n")
        f.flush()
        return subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                              env=env).returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="/root/reference/image/boazbarak.jpg")
    ap.add_argument("--out", default="./decode_out")
    ap.add_argument("--workdir", default="./decodework")
    ap.add_argument("--quick", action="store_true",
                    help="single (degree, delta) config (smoke)")
    ap.add_argument("--pure-fhe", action="store_true",
                    help="sweep the pure homomorphic Fourier-step path")
    ap.add_argument("--order", type=int, default=64)
    ap.add_argument("--cmod", type=int, default=4096)
    ap.add_argument("--pmod", type=int, default=1 << 14)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    os.makedirs(args.workdir, exist_ok=True)
    keydir = os.path.join(args.workdir, "keys")
    c2s = os.path.join(args.workdir, "c2s.bin")
    s2c = os.path.join(args.workdir, "s2c.bin")
    log = os.path.join(args.out, "sweep.log")
    open(log, "w").close()
    env = dict(os.environ)
    if args.platform:
        env["FHETPU_PLATFORM"] = args.platform

    py = [sys.executable, "-m"]
    common = ["--cmod", str(args.cmod), "--pmod", str(args.pmod),
              "--order", str(args.order), "--keydir", keydir]
    send = py + ["fhetpu.cli.client_decode", "--send", "-f", args.image,
                 "-c", c2s] + common
    if args.pure_fhe:
        send += ["--relin"]
    rc = run(send, log, env)
    if rc:
        print(f"send FAILED rc={rc}", flush=True)
        return rc

    grid = [(12, 0.5)] if args.quick else [
        (dg, dl) for dg in DEGREE for dl in DELTA
    ]
    for degree, delta in grid:
        print(degree, delta, flush=True)
        srv = py + ["fhetpu.cli.server_decode", "-i", c2s, "-c", s2c,
                    "--degree", str(degree), "--delta", str(delta)] + common
        if args.pure_fhe:
            srv += ["--pure-fhe"]
        rc = run(srv, log, env)
        out = os.path.join(args.out, f"out_{degree}_{delta}.png")
        rc |= run(py + ["fhetpu.cli.client_decode", "--recieve",
                        "-f", args.image, "-i", s2c, "-o", out] + common,
                  log, env)
        if rc:
            print(f"  FAILED rc={rc}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
