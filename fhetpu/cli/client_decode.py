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


def add_decode_flags(p):
    p.add_argument("--degree", type=int, default=12)
    p.add_argument("--delta", type=float, default=0.5)
    p.add_argument("--order", type=int, default=64)
    p.add_argument("--relin", action="store_true",
                   help="also save evaluation keys (for the pure-FHE server)")
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
        rk = kg.relin_keys(max_power=2)
        np.savez_compressed(os.path.join(args.keydir, "evalkeys.npz"),
                            **{f"k{k}": v for k, v in rk.keys.items()})
    enc = Encryptor(par, pk)
    channel_pairs = [rle_encode(img[..., c].reshape(-1)) for c in range(3)]
    with open(os.path.join(args.keydir, "params.txt"), "w") as f:
        f.write(f"{w} {h} " + " ".join(str(len(p)) for p in channel_pairs) + "\n")
    t = OpTimer("Encryption")
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
    vals = np.clip(np.rint(out), 0, 255).astype(np.uint8)
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
