"""Client driver for encrypted run-length decode (homo/client_decode.cpp).

--send: plaintext RLE per channel over raster order, encrypting each
(value, count) pair (client_decode.cpp:127-150); per-channel pair counts go
into params.txt ('W H pairs_r pairs_g pairs_b', :95-98,149-151).
--recieve: decrypt W*H*3 values, clamp, save PNG (:202-215).

With --relin, evaluation keys are generated and saved for the server's
pure-FHE path (the reference never creates evaluation keys; SURVEY.md 2.4).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..bfv.crypto import Decryptor, Encryptor, KeyGenerator, SecretKey
from ..io import images, serial
from .common import (OpTimer, adopt_stream_params, base_parser, make_encoder,
                     make_params)


DEFAULT_DEGREE, DEFAULT_DELTA, DEFAULT_ORDER = 12, 0.5, 64  # server_decode.cpp:37-39


def apply_decode_defaults(args):
    if args.degree is None:
        args.degree = DEFAULT_DEGREE
    if args.delta is None:
        args.delta = DEFAULT_DELTA
    if args.order is None:
        args.order = DEFAULT_ORDER
    return args


def add_decode_flags(p):
    p.add_argument("--degree", type=int, default=None,
                   help=f"Fourier terms (default {DEFAULT_DEGREE}; a server "
                        "reading a harmonic stream adopts the wire's)")
    p.add_argument("--delta", type=float, default=None,
                   help=f"step widening (default {DEFAULT_DELTA})")
    p.add_argument("--order", type=int, default=None,
                   help=f"series period (default {DEFAULT_ORDER})")
    p.add_argument("--relin", action="store_true",
                   help="also save evaluation keys (for the pure-FHE server)")
    p.add_argument("--dbc", type=int, default=0,
                   help="relinearization digit decomposition bit count "
                        "(0 = one digit per RNS limb; the reference parses "
                        "--dbc but never uses it, fhe_image.h:28)")
    p.add_argument("--harmonics", action="store_true",
                   help="send aggregated encrypted Fourier harmonics instead "
                        "of raw RLE pairs: the practical pure-FHE protocol "
                        "(server needs no secret key, no approximation error "
                        "beyond the Fourier series itself)")
    return p


def rle_encode(values: np.ndarray):
    """[(value, count)] run-length pairs of a 1-D sequence."""
    pairs = []
    for v in values:
        if pairs and pairs[-1][0] == v:
            pairs[-1][1] += 1
        else:
            pairs.append([int(v), 1])
    return pairs


def run_send(args):
    apply_decode_defaults(args)
    if args.harmonics:
        from .common import auto_select_n

        auto_select_n(args, "decode-harmonics", degree=args.degree)
    par = make_params(args)
    encoder = make_encoder(args)
    img = images.load_rgb(args.file)
    h, w, _ = img.shape
    os.makedirs(args.keydir, exist_ok=True)
    kg = KeyGenerator(par)
    pk = kg.public_key()
    serial.save_secret_key(os.path.join(args.keydir, "seckey.npz"), kg.secret.small)
    serial.save_public_key(os.path.join(args.keydir, "pubkey.npz"), pk.data)
    if args.relin:
        rk = kg.relin_keys(max_power=2, digit_bits=args.dbc)
        np.savez_compressed(os.path.join(args.keydir, "evalkeys.npz"),
                            digit_bits=np.int64(rk.digit_bits),
                            **{f"k{k}": v for k, v in rk.keys.items()})
    enc = Encryptor(par, pk)
    channel_pairs = [rle_encode(img[..., c].reshape(-1)) for c in range(3)]
    t = OpTimer("Encryption")
    if args.harmonics:
        from ..pipelines.rle_decode import fourier_harmonics_host

        H = 2 * args.degree + 1
        with open(os.path.join(args.keydir, "params.txt"), "w") as f:
            f.write(f"{w} {h} " + " ".join([str(H)] * 3) + "\n")
        writer = serial.CtWriter(
            args.coutfile, 2, par.L, par.n,
            meta={"w": w, "h": h, "layout": "fourier-harmonics",
                  "degree": args.degree, "order": args.order,
                  "delta": args.delta},
        )
        for pairs in channel_pairs:
            harm = fourier_harmonics_host(pairs, args.order, args.degree,
                                          args.delta)
            with t.span(len(harm)):
                writer.append(enc.encrypt_batch(encoder.encode_batch(harm)))
        writer.close()
        t.emit()
        if args.verbose:
            print(f"harmonics per channel: {H}", file=sys.stderr)
        return
    with open(os.path.join(args.keydir, "params.txt"), "w") as f:
        f.write(f"{w} {h} " + " ".join(str(len(p)) for p in channel_pairs) + "\n")
    writer = serial.CtWriter(args.coutfile, 2, par.L, par.n,
                             meta={"w": w, "h": h, "layout": "rle-pairs"})
    for pairs in channel_pairs:
        flat = np.array([x for p in pairs for x in p], dtype=np.float64)
        with t.span(len(flat)):
            cts = enc.encrypt_batch(encoder.encode_batch(flat))
        writer.append(cts)
    writer.close()
    t.emit()
    if args.verbose:
        print(f"RLE pairs per channel: {[len(p) for p in channel_pairs]}",
              file=sys.stderr)


def run_recieve(args):
    parts = serial.read_params_txt(os.path.join(args.keydir, "params.txt"))
    w, h = parts[0], parts[1]
    reader = serial.CtReader(args.cinfile)
    adopt_stream_params(args, reader)  # decode params.txt carries no pmod
    par = make_params(args)
    encoder = make_encoder(args)
    sk = SecretKey(small=serial.load_secret_key(os.path.join(args.keydir, "seckey.npz")),
                   params=par)
    dec = Decryptor(par, sk)
    total = w * h * 3
    out = np.zeros(total, dtype=np.float64)
    t = OpTimer("Decryption")
    done = 0
    while done < total:
        cts = reader.read(4096)
        if cts is None:
            break
        with t.span(cts.shape[0]):
            out[done : done + cts.shape[0]] = encoder.decode_batch(
                dec.decrypt_batch(cts)
            )
        done += cts.shape[0]
    reader.close()
    t.emit()
    # reference truncation (client_decode.cpp:204: int pixel = decode(p))
    vals = np.clip(np.trunc(out), 0, 255).astype(np.uint8)
    # our server streams channel-planar (one batched dispatch per channel);
    # the reference's is pixel-interleaved (server_decode.cpp:139-143) --
    # honor whichever the stream header declares
    if reader.meta.get("layout") == "raster-rgb-planar":
        pix = vals.reshape(3, h, w).transpose(1, 2, 0)
    else:
        pix = vals.reshape(h, w, 3)
    images.save_rgb(args.outfile, pix)
    orig = images.load_rgb(args.file)
    print(f"RMSError,{images.rms_error(pix, orig):.6g},")


def main(argv=None):
    p = add_decode_flags(base_parser("Client-side FHE RLE decode (fhetpu)"))
    args = p.parse_args(argv)
    if not args.send and not args.recieve:
        p.error("use --send or --recieve")
    if args.send:
        run_send(args)
    else:
        run_recieve(args)


if __name__ == "__main__":
    main()
