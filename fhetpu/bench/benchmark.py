"""Sweep driver (port of benchmark/benchmark.py): runs client -> server ->
client for the resize and jpeg pipelines over a (poly_n, plain_mod, dbc)
grid, one log file per configuration, scraping the per-op CSV rows the
drivers print (Encryption,/Decryption,/DCT,/Linear,/Cubic,/RMSError,).

Usage: python -m fhetpu.bench.benchmark [--image PATH] [--out LOGDIR]
       [--quick] [--pipelines resize,jpeg]
"""

from __future__ import annotations

import argparse
import itertools
import os
import subprocess
import sys

# the reference's grid (benchmark/benchmark.py:5-9)
POLY_N = [2048, 4096, 8192, 16384]
PLAIN_MODS = [11, 31, 101, 307, 1009, 3001, 10007, 30011, 100003]
DBCS = [16, 32, 60]
RESIZE_W = RESIZE_H = 17


def run(cmd, log, env=None):
    with open(log, "a") as f:
        f.write("$ " + " ".join(cmd) + "\n")
        f.flush()
        r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT, env=env)
    return r.returncode


def call_pipeline(kind, image, n, pmod, dbc, logdir, workdir, platform):
    log = os.path.join(logdir, f"{kind}_{n}_{pmod}_{dbc}.txt")
    open(log, "w").close()
    keydir = os.path.join(workdir, "keys")
    c2s = os.path.join(workdir, "c2s.bin")
    s2c = os.path.join(workdir, "s2c.bin")
    out = os.path.join(workdir, f"out_{kind}.png" if kind != "jpg" else "out.jpg")
    common = ["--cmod", str(n), "--pmod", str(pmod), "--keydir", keydir]
    env = dict(os.environ)
    if platform:
        env["FHETPU_PLATFORM"] = platform
    py = [sys.executable, "-m"]
    if kind == "jpg":
        mods = ("fhetpu.cli.client_jpeg", "fhetpu.cli.server_jpeg", "fhetpu.cli.client_jpeg")
        extra = []
    else:
        mods = ("fhetpu.cli.client_resize", "fhetpu.cli.server_resize", "fhetpu.cli.client_resize")
        extra = ["--width", str(RESIZE_W), "--height", str(RESIZE_H),
                 "--dbc", str(dbc)] + (["--bicubic"] if kind == "bicubic" else [])
    rc = run(py + [mods[0], "--send", "-f", image, "-c", c2s] + common + extra, log, env)
    rc |= run(py + [mods[1], "-i", c2s, "-c", s2c] + common + extra, log, env)
    rc |= run(py + [mods[2], "--recieve", "-f", image, "-i", s2c, "-o", out] + common + extra, log, env)
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="/root/reference/image/boazbarak.jpg")
    ap.add_argument("--out", default="./benchlogs")
    ap.add_argument("--workdir", default="./benchwork")
    ap.add_argument("--quick", action="store_true",
                    help="single config per pipeline (smoke)")
    ap.add_argument("--pipelines", default="bilinear,bicubic,jpg")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    os.makedirs(args.workdir, exist_ok=True)
    grid = (
        [(4096, 1 << 14, 30)]
        if args.quick
        else list(itertools.product(POLY_N, PLAIN_MODS, DBCS))
    )
    for kind in args.pipelines.split(","):
        for n, pmod, dbc in grid:
            print(f"[{kind}] n={n} pmod={pmod} dbc={dbc}", flush=True)
            rc = call_pipeline(kind, args.image, n, pmod, dbc, args.out,
                               args.workdir, args.platform)
            if rc:
                print(f"  FAILED rc={rc}", flush=True)


if __name__ == "__main__":
    main()
