"""Server driver for encrypted run-length decode (homo/server_decode.cpp).

Per channel: stream the encrypted (value, count) pairs, evaluate the
Fourier-series step per pair over all output positions, and accumulate runs
(server_decode.cpp:120-137).  The per-pair ``index += count`` dependency is
an encrypted prefix scan (pipelines.rle_decode.cumulative_counts).

Default mode is the trusted decrypt-evaluate-reencrypt overload the
reference actually calls (it loads the secret key 'FOR DEBUGGING ONLY',
server_jpeg.cpp:97-98; same trust model here, explicitly flagged).
--pure-fhe switches to the batched homomorphic path (offset-mutation bug
fixed; needs evaluation keys from client_decode --relin).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .common import (OpTimer, adopt_stream_params, base_parser, make_encoder,
                     make_params, setup_platform)
from .client_decode import add_decode_flags


def main(argv=None):
    p = add_decode_flags(base_parser("Server-side FHE RLE decode (fhetpu)"))
    p.add_argument("--pure-fhe", action="store_true",
                   help="pure homomorphic Fourier step (no secret key)")
    args = p.parse_args(argv)
    setup_platform(args)

    import jax.numpy as jnp

    from ..bfv.crypto import Decryptor, Encryptor, PublicKey, SecretKey
    from ..bfv.evaluator import Ct, DeviceRelinKeys, Evaluator
    from ..io import serial
    from ..pipelines import rle_decode as rd

    parts = serial.read_params_txt(os.path.join(args.keydir, "params.txt"))
    w, h = parts[0], parts[1]
    npairs = parts[2:5]
    reader = serial.CtReader(args.cinfile)
    adopt_stream_params(args, reader)  # decode params.txt carries no pmod
    par = make_params(args)
    encoder = make_encoder(args)
    ev = Evaluator(par, encoder)
    pk = PublicKey(
        data=serial.load_public_key(os.path.join(args.keydir, "pubkey.npz")),
        params=par,
    )
    enc = Encryptor(par, pk)
    positions = np.arange(w * h)

    relin = None
    decryptor = None
    if args.pure_fhe:
        path = os.path.join(args.keydir, "evalkeys.npz")
        if os.path.exists(path):
            loaded = np.load(path)

            class _RK:
                keys = {int(k[1:]): loaded[k] for k in loaded.files}

            relin = DeviceRelinKeys(_RK())
    else:
        sk = SecretKey(
            small=serial.load_secret_key(os.path.join(args.keydir, "seckey.npz")),
            params=par,
        )
        decryptor = Decryptor(par, sk)

    writer = serial.CtWriter(args.coutfile, 2, par.L, par.n,
                             meta={"w": w, "h": h, "layout": "raster-rgb-planar"})
    t = OpTimer("Step")
    channels = []
    for ch in range(3):
        k = npairs[ch]
        cts = reader.read(k * 2)  # (value, count) interleaved
        assert cts is not None and cts.shape[0] == 2 * k
        vals = [cts[2 * i] for i in range(k)]
        counts = [cts[2 * i + 1] for i in range(k)]
        acc = np.zeros(len(positions))
        if args.pure_fhe:
            count_cts = [Ct(jnp.asarray(c)) for c in counts]
            idxs = rd.cumulative_counts(ev, count_cts)
            chan = None
            for i in range(k):
                with t.span(len(positions)):
                    run = rd.approximated_step_fhe(
                        ev, Ct(jnp.asarray(vals[i])), idxs[i], count_cts[i],
                        args.order, args.degree, args.delta, positions, relin,
                    )
                chan = run if chan is None else ev.add(chan, run)
            writer.append(np.asarray(ev.transform_from_ntt(chan).data))
        else:
            index = 0.0
            chan_cts = None
            for i in range(k):
                idx_ct = enc.encrypt(encoder.encode(index))
                with t.span(len(positions)):
                    run = rd.approximated_step_trusted(
                        encoder, enc, decryptor, vals[i], idx_ct, counts[i],
                        args.order, args.degree, args.delta, positions,
                    )
                chan_cts = run if chan_cts is None else _add_host(chan_cts, run, par)
                index += encoder.decode(decryptor.decrypt(counts[i]))
            writer.append(chan_cts)
        if args.verbose:
            print(f"channel {ch}: {k} pairs", file=sys.stderr)
    reader.close()
    writer.close()
    t.emit()


def _add_host(a: np.ndarray, b: np.ndarray, par) -> np.ndarray:
    p = np.array([int(x) for x in par.q_primes], dtype=np.uint64).reshape(-1, 1)
    r = a.astype(np.uint64) + b.astype(np.uint64)
    return np.where(r >= p, r - p, r).astype(np.uint32)


if __name__ == "__main__":
    main()
