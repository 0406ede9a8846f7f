#!/usr/bin/env python
"""Host-side crypto benchmark at realistic batch sizes (VERDICT r4 item 3).

The reference's Encryption/Decryption columns (benchmark/results.txt:100,52
and :98,50) are per-ciphertext costs measured inside its sweeps, where e.g.
a 48x48 jpg config encrypts 6912 coefficient-ciphertexts back to back, so
fixed per-call overhead is fully amortized.  The round-4 grid's small-image
cells (192-coefficient spans) are NOT that regime: at n>=8192 their
per-coeff Encryption/Decryption rows are dominated by per-call setup and by
first-call native-lib/JIT warmup, which says nothing about streaming
throughput.  This script measures the amortized regime directly:
encrypt_batch / decrypt_batch over >=4096 single-coefficient plaintexts per
ring degree (the native multithreaded NTT path), best-of-R wall clock per
ciphertext, with a correctness check on every run (decrypted coefficients
must round-trip exactly).

Baselines: SEAL v2.3.0-4 single-core on the reference author's 2018 head
node (BASELINE.md Encryption/Decryption rows).

Writes bench_results/hostcrypto.json and a README-ready markdown table on
stdout.  CPU-only by design (client-side crypto never touches the TPU).
Run it SOLO -- host timings on the 2-vCPU driver skew under concurrent
grid clients.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from fhetpu.bfv.crypto import Decryptor, Encryptor, KeyGenerator
from fhetpu.bfv.params import BfvParams

# BASELINE.md client-side columns (ms per ciphertext, single core, 2018)
BASE_ENC = {2048: 1.81, 4096: 3.68, 8192: 8.32, 16384: 23.3}
BASE_DEC = {2048: 0.132, 4096: 0.429, 8192: 1.55, 16384: 6.59}


def bench_n(n: int, batch: int, reps: int, seed: int = 7) -> dict:
    par = BfvParams.create(n=n)
    kg = KeyGenerator(par, seed=seed)
    enc = Encryptor(par, kg.public_key(), seed=seed + 1)
    dec = Decryptor(par, kg.secret)
    rng = np.random.default_rng(seed + 2)
    msgs = rng.integers(0, par.t, size=batch, dtype=np.int64)
    coeffs = np.zeros((batch, n), dtype=np.int64)
    coeffs[:, 0] = msgs

    # warmup: loads the native lib, touches every code path once
    w = enc.encrypt_batch(coeffs[:32])
    dec.decrypt_batch(w)

    enc_times, dec_times = [], []
    cts = None
    for _ in range(reps):
        t0 = time.perf_counter()
        cts = enc.encrypt_batch(coeffs)
        enc_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = dec.decrypt_batch(cts)
        dec_times.append(time.perf_counter() - t0)
        assert (out[:, 0] == msgs).all() and (out[:, 1:] == 0).all(), (
            f"round-trip mismatch at n={n}"
        )
    enc_ms = min(enc_times) * 1e3 / batch
    dec_ms = min(dec_times) * 1e3 / batch
    return {
        "n": n, "L": par.L, "t": par.t, "batch": batch, "reps": reps,
        "encrypt_ms_per_ct": round(enc_ms, 4),
        "decrypt_ms_per_ct": round(dec_ms, 4),
        "baseline_encrypt_ms": BASE_ENC[n],
        "baseline_decrypt_ms": BASE_DEC[n],
        "encrypt_speedup": round(BASE_ENC[n] / enc_ms, 2),
        "decrypt_speedup": round(BASE_DEC[n] / dec_ms, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ns", default="2048,4096,8192,16384")
    ap.add_argument("--out", default=os.path.join(REPO, "bench_results",
                                                  "hostcrypto.json"))
    args = ap.parse_args()
    rows = []
    for n in [int(s) for s in args.ns.split(",")]:
        t0 = time.time()
        row = bench_n(n, args.batch, args.reps)
        row["seconds"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        json.dump({"batch": args.batch, "reps": args.reps, "rows": rows}, f,
                  indent=1)
    print("\n| n | Encryption ms/ct (SEAL 1-core) | speedup | "
          "Decryption ms/ct (SEAL 1-core) | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n']} | {r['encrypt_ms_per_ct']:.3f} "
              f"({r['baseline_encrypt_ms']}) | {r['encrypt_speedup']}x | "
              f"{r['decrypt_ms_per_ct']:.3f} ({r['baseline_decrypt_ms']}) | "
              f"{r['decrypt_speedup']}x |")


if __name__ == "__main__":
    main()
