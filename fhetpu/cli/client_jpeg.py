"""Client driver for the encrypted JPEG pipeline (trusted side).

TPU-native rebuild of homo/client_jpeg.cpp: --send loads the image, writes
params/keys, batch-encrypts every 8x8-block coefficient and streams them
(per block: 64 R, 64 G, 64 B -- client_jpeg.cpp:140-165); --recieve decrypts
the server's Y/Cb/Cr DCT stream, rounds, entropy-codes to a JFIF file, and
prints the RMS vs the jo_jpeg-equivalent plaintext baseline
(client_jpeg.cpp:266-295).  All crypto is host-side NumPy: the secret never
leaves the client.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..bfv.crypto import Decryptor, Encryptor, KeyGenerator, SecretKey, PublicKey
from ..codec import jpeg as jpeg_codec
from ..io import images, serial
from .common import (OpTimer, adopt_stream_params, auto_select_n, base_parser,
                     make_encoder, make_params)


def run_send(args):
    auto_select_n(args, "jpeg")
    par = make_params(args)
    encoder = make_encoder(args)
    img = images.load_rgb(args.file)
    h, w, _ = img.shape
    if h % 8 or w % 8:
        # the reference assumes 8-divisible dims and reads out of bounds
        # otherwise (fhe_image.h:108-124); we crop instead
        h, w = h - h % 8, w - w % 8
        img = img[:h, :w]
        print(f"cropped input to {w}x{h} (multiple of 8)", file=sys.stderr)
    os.makedirs(args.keydir, exist_ok=True)
    serial.write_params_txt(
        os.path.join(args.keydir, "params.txt"), w, h, 3, args.pmod
    )
    kg = KeyGenerator(par)
    pk = kg.public_key()
    serial.save_secret_key(os.path.join(args.keydir, "seckey.npz"), kg.secret.small)
    serial.save_public_key(os.path.join(args.keydir, "pubkey.npz"), pk.data)
    enc = Encryptor(par, pk)

    # [nb, 3, 64] pixel values in the reference's stream order
    blocks = np.stack(
        [images.split_blocks(img[..., c].astype(np.float64)) for c in range(3)],
        axis=1,
    )
    nb = blocks.shape[0]
    writer = serial.CtWriter(
        args.coutfile, 2, par.L, par.n,
        meta={"w": w, "h": h, "layout": "rgb-blocks",
              "ntt": bool(getattr(args, "ntt_form", False))},
    )
    t = OpTimer("Encryption")
    chunk = max(args.chunk_blocks, 1)
    for lo in range(0, nb, chunk):
        hi = min(lo + chunk, nb)
        coeffs = encoder.encode_batch(blocks[lo:hi].reshape(-1))
        with t.span((hi - lo) * 192):
            cts = enc.encrypt_batch(coeffs)
            if getattr(args, "ntt_form", False):
                from ..core import ntt as nttmod

                cts = nttmod.np_ntt(cts, par.tables_q)
        writer.append(cts)
    writer.close()
    t.emit()
    if args.verbose:
        print(f"encrypted {nb} blocks ({nb*192} ciphertexts) -> {args.coutfile}",
              file=sys.stderr)


def run_recieve(args):
    w, h, _c, pmod = serial.read_params_txt(os.path.join(args.keydir, "params.txt"))
    reader = serial.CtReader(args.cinfile)
    adopt_stream_params(args, reader, pmod)
    par = make_params(args)
    encoder = make_encoder(args)
    sk = SecretKey(
        small=serial.load_secret_key(os.path.join(args.keydir, "seckey.npz")),
        params=par,
    )
    dec = Decryptor(par, sk)
    in_ntt = bool(reader.meta.get("ntt", False))
    nb = (w // 8) * (h // 8)
    t = OpTimer("Decryption")
    out_blocks = np.zeros((nb, 3, 64), dtype=np.int64)
    chunk = max(args.chunk_blocks, 1) * 192
    done = 0
    while True:
        cts = reader.read(chunk)
        if cts is None:
            break
        with t.span(cts.shape[0]):
            coeffs = dec.decrypt_batch(cts, ntt_form=in_ntt)
        vals = encoder.decode_batch(coeffs)
        k = vals.shape[0]
        # reference rounding: v<0 ? ceil(v-.5) : floor(v+.5) (client_jpeg.cpp:278)
        rounded = np.where(
            vals < 0, np.ceil(vals - 0.5), np.floor(vals + 0.5)
        ).astype(np.int64)
        out_blocks.reshape(-1)[done : done + k] = rounded
        done += k
    reader.close()
    t.emit()
    with open(args.outfile, "wb") as f:
        jpeg_codec.encode_coeff_blocks(f, out_blocks, w, h, quality=0)
    # RMS vs the jo_jpeg plaintext ground truth (fhe_image.h:508-521)
    orig = images.load_rgb(args.file)[:h, :w]  # crop like --send did
    jo_bytes = jpeg_codec.jo_jpeg_encode(orig, quality=0)
    jo_path = os.path.join(os.path.dirname(args.outfile) or ".", "jo_image.jpg")
    with open(jo_path, "wb") as f:
        f.write(jo_bytes)
    ours = images.load_rgb(args.outfile)
    jo = images.decode_jpeg_bytes(jo_bytes)
    print(f"RMSError,{images.rms_error(ours, jo):.6g},")


def main(argv=None):
    p = base_parser("Client-side FHE JPEG (fhetpu)")
    p.add_argument("--ntt-form", action="store_true",
                   help="stream ciphertexts in the NTT evaluation domain "
                        "(TPU-native protocol: the server op becomes NTT-free)")
    args = p.parse_args(argv)
    if not args.send and not args.recieve:
        p.error("use --send or --recieve")
    if args.send:
        run_send(args)
    else:
        run_recieve(args)


if __name__ == "__main__":
    main()
