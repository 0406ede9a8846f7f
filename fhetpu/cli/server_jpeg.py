"""Server driver for the encrypted JPEG pipeline (untrusted compute side).

TPU-native rebuild of homo/server_jpeg.cpp: streams ciphertext blocks from
the client file, runs the batched homomorphic RGB->YCC + 8x8 DCT on the
accelerator (one jitted dispatch per chunk of blocks instead of the
reference's per-pixel SEAL loop, server_jpeg.cpp:109-136), and streams
Y/Cb/Cr DCT coefficients back (per block: 64 Y, 64 Cb, 64 Cr).

Unlike the reference -- which loads the SECRET key on the server "FOR
DEBUGGING ONLY" (server_jpeg.cpp:97-98) -- only the public parameters are
ever read here.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .common import (OpTimer, adopt_stream_params, base_parser, make_encoder,
                     make_params, maybe_profile, runtime_noise_check,
                     setup_platform)


def main(argv=None):
    p = base_parser("Server-side FHE JPEG (fhetpu)")
    p.add_argument("--quantize", action="store_true",
                   help="apply homomorphic quantization (the reference defines "
                        "but never calls it; default off for parity)")
    p.add_argument("--sharded", action="store_true",
                   help="data-parallel: shard the 8x8-block batch axis over "
                        "all available devices (every op is elementwise over "
                        "blocks, so XLA partitions with zero collectives)")
    args = p.parse_args(argv)
    setup_platform(args)

    import jax.numpy as jnp

    from ..bfv.evaluator import Evaluator
    from ..codec.jpeg import ZIGZAG, build_quant_tables
    from ..io import serial
    from ..pipelines.jpeg_encode import make_server

    w, h, _c, pmod = serial.read_params_txt(os.path.join(args.keydir, "params.txt"))
    reader = serial.CtReader(args.cinfile)
    adopt_stream_params(args, reader, pmod)
    par = make_params(args)
    encoder = make_encoder(args)
    ev = Evaluator(par, encoder)
    from ..bfv import noise
    runtime_noise_check(
        args, noise.estimate_jpeg_pipeline(par, encoder, mean=True),
        "YCC+DCT server op",
    )
    quant = None
    if args.quantize:
        ytab, _ = build_quant_tables(0)
        quant = ytab[ZIGZAG].astype(np.float64)  # natural-order per-slot table
    in_ntt = bool(reader.meta.get("ntt", False))
    from ..pipelines.jpeg_encode import server_compute_fn
    import jax

    fn = server_compute_fn(
        ev, apply_quantize=args.quantize, quant=quant,
        input_ntt=in_ntt, output_ntt=in_ntt,
    )
    sharding = None
    if args.sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh

        ndev = len(jax.devices())
        sharding = NamedSharding(make_mesh({"dp": ndev}), P("dp"))
        # donate like the unsharded path: without it each dispatch holds
        # input+output batches in HBM simultaneously, raising the peak by
        # a full chunk (sharded arrays are donatable)
        server = jax.jit(fn, in_shardings=sharding, out_shardings=sharding,
                         donate_argnums=(0,))
        if args.verbose:
            print(f"dp-sharded over {ndev} devices", file=sys.stderr)
    else:
        server = jax.jit(fn, donate_argnums=(0,))
    writer = serial.CtWriter(args.coutfile, 2, par.L, par.n,
                             meta={"w": w, "h": h, "layout": "ycc-blocks",
                                   "ntt": in_ntt})
    nb_total = (w // 8) * (h // 8)
    t = OpTimer("DCT")
    chunk = max(args.chunk_blocks, 1)
    done = 0
    with maybe_profile(args):
        while done < nb_total:
            k = min(chunk, nb_total - done)
            cts = reader.read(k * 192)
            assert cts is not None, "ciphertext stream truncated"
            batch = cts.reshape(k, 3, 64, 2, par.L, par.n)
            kp = k
            if sharding is not None:
                # pad the block axis to a multiple of the mesh (padded
                # blocks recompute the last block; sliced off below)
                ndev = sharding.mesh.shape["dp"]
                kp = -(-k // ndev) * ndev
                if kp > k:
                    batch = np.concatenate(
                        [batch, np.repeat(batch[-1:], kp - k, axis=0)])
                batch = jax.device_put(jnp.asarray(batch), sharding)
            else:
                batch = jnp.asarray(batch)
            with t.span(k * 3):
                out = server(batch)
                out.block_until_ready()
            writer.append(np.asarray(out)[:k].reshape(-1, 2, par.L, par.n))
            done += k
            if args.verbose:
                print(f"processed {done}/{nb_total} blocks", file=sys.stderr)
    reader.close()
    writer.close()
    t.emit()


if __name__ == "__main__":
    main()
