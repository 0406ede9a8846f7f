"""Client driver for encrypted resize (homo/client_resize.cpp rebuild).

--send: batch-encrypt every pixel-channel in raster RGB-interleaved order
(client_resize.cpp:147-154).  --recieve: decrypt W'*H'*3 values, clamp to
[0,255] (client_resize.cpp:201-210), report RMS vs the OpenCV-equivalent
ground truth (compare_resize_opencv) and save a PNG.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..bfv.crypto import Decryptor, Encryptor, KeyGenerator, SecretKey
from ..io import images, serial
from .common import (OpTimer, adopt_stream_params, auto_select_n, base_parser,
                     make_encoder, make_params)


def add_resize_flags(p):
    p.add_argument("-b", "--bicubic", action="store_true",
                   help="bicubic instead of bilinear")
    p.add_argument("--width", type=int, default=17)
    p.add_argument("--height", type=int, default=17)
    p.add_argument("--dbc", type=int, default=30,
                   help="relinearization decomposition bit count")
    p.add_argument("--relin", action="store_true",
                   help="relinearize after ct*ct multiplies (the reference "
                        "never does; sizes then grow to 4/8)")
    p.add_argument("--plain-fracts", action="store_true",
                   help="fast path: fractional offsets as plaintext operands "
                        "(bit-identical output, far cheaper)")
    return p


def run_send(args):
    auto_select_n(args, "resize", bicubic=args.bicubic,
                  plain_fracts=args.plain_fracts,
                  relin_dbc=(args.dbc if args.relin else None))
    par = make_params(args)
    encoder = make_encoder(args)
    img = images.load_rgb(args.file)
    h, w, _ = img.shape
    os.makedirs(args.keydir, exist_ok=True)
    serial.write_params_txt(os.path.join(args.keydir, "params.txt"), w, h, 3, args.pmod)
    kg = KeyGenerator(par)
    pk = kg.public_key()
    serial.save_secret_key(os.path.join(args.keydir, "seckey.npz"), kg.secret.small)
    serial.save_public_key(os.path.join(args.keydir, "pubkey.npz"), pk.data)
    if args.relin:
        # with relin-after-every-multiply the largest ciphertext the server
        # ever keyswitches is size 3 -> keys for s^2 suffice
        rk = kg.relin_keys(max_power=2, digit_bits=args.dbc)
        np.savez_compressed(os.path.join(args.keydir, "evalkeys.npz"),
                            digit_bits=np.int64(rk.digit_bits),
                            **{f"k{k}": v for k, v in rk.keys.items()})
    enc = Encryptor(par, pk)
    vals = img.astype(np.float64).reshape(-1)  # raster RGBRGB...
    writer = serial.CtWriter(args.coutfile, 2, par.L, par.n,
                             meta={"w": w, "h": h, "layout": "raster-rgb"})
    t = OpTimer("Encryption")
    chunk = 4096
    for lo in range(0, len(vals), chunk):
        hi = min(lo + chunk, len(vals))
        coeffs = encoder.encode_batch(vals[lo:hi])
        with t.span(hi - lo):
            cts = enc.encrypt_batch(coeffs)
        writer.append(cts)
    writer.close()
    t.emit()
    if args.verbose:
        print(f"encrypted {len(vals)} pixel-channels -> {args.coutfile}",
              file=sys.stderr)


def run_recieve(args):
    w, h, _c, pmod = serial.read_params_txt(os.path.join(args.keydir, "params.txt"))
    reader = serial.CtReader(args.cinfile)
    adopt_stream_params(args, reader, pmod)
    par = make_params(args)
    encoder = make_encoder(args)
    sk = SecretKey(small=serial.load_secret_key(os.path.join(args.keydir, "seckey.npz")),
                   params=par)
    dec = Decryptor(par, sk)
    w2, h2 = args.width, args.height
    total = w2 * h2 * 3
    out = np.zeros(total, dtype=np.float64)
    t = OpTimer("Decryption")
    done = 0
    while done < total:
        cts = reader.read(4096)
        if cts is None:
            break
        with t.span(cts.shape[0]):
            coeffs = dec.decrypt_batch(cts)
        out[done : done + cts.shape[0]] = encoder.decode_batch(coeffs)
        done += cts.shape[0]
    reader.close()
    t.emit()
    # reference decode: `int pixel = encoder.decode(p); CLAMP(pixel,0,255)`
    # (client_resize.cpp:203-209) -- C truncation toward zero, NOT rounding;
    # all decrypted values are exact dyadic rationals so this is
    # deterministic and required for RMS parity with results.txt
    pix = np.clip(np.trunc(out), 0, 255).astype(np.uint8).reshape(h2, w2, 3)
    # RMS vs the OpenCV ground truth (fhe_resize.h:35-68): real cv2 when
    # present, else the bit-exact fixed-point uint8 model
    from ..pipelines.cv_resize import cv_ground_truth

    orig = images.load_rgb(args.file)
    gt = cv_ground_truth(orig, w2, h2, args.bicubic)
    print(f"RMSError,{images.rms_error(pix, gt):.6g},")
    images.save_rgb(args.outfile, pix)


def main(argv=None):
    p = add_resize_flags(base_parser("Client-side FHE resize (fhetpu)"))
    args = p.parse_args(argv)
    if not args.send and not args.recieve:
        p.error("use --send or --recieve")
    if args.send:
        run_send(args)
    else:
        run_recieve(args)


if __name__ == "__main__":
    main()
