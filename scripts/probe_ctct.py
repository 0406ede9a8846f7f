#!/usr/bin/env python
"""Minimal repro probe for the faithful (unrelinearized) ct*ct bicubic tile
dispatch at n=8192 on real TPU (VERDICT r3 missing item 2 / weak item 1).

Builds one resize tile exactly like cli/server_resize.py does for the
bicubic_boaz_17x17_ctct config (--tile-rows 1 --tile-cols 4) but with random
well-formed RNS ciphertext data, so the crash (if any) reproduces without
streaming ~GBs through the tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("PROBE_N", 8192))
    rows = int(os.environ.get("PROBE_ROWS", 1))
    cols = int(os.environ.get("PROBE_COLS", 4))
    cache = os.environ.get("FHETPU_COMPILE_CACHE",
                           os.path.join(os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from fhetpu.bfv.crypto import KeyGenerator, Encryptor
    from fhetpu.bfv.encoder import FractionalEncoder
    from fhetpu.bfv.evaluator import Evaluator
    from fhetpu.bfv.params import BfvParams
    from fhetpu.pipelines import resize as rz

    par = BfvParams.create(n=n, t=1 << 14)
    encoder = FractionalEncoder(par.t, par.n)
    ev = Evaluator(par, encoder)
    print(f"backend={jax.default_backend()} n={n} L={par.L} K={len(par.bsk_primes)}",
          flush=True)

    t0 = time.time()
    kg = KeyGenerator(par)
    encryptor = Encryptor(par, kg.public_key())
    print(f"keygen {time.time()-t0:.1f}s", flush=True)

    H, W, H2, W2 = 48, 48, 17, 17
    row_plan = rz.axis_plan(H, H2, rz.BICUBIC)
    col_plan = rz.axis_plan(W, W2, rz.BICUBIC)

    # first tile: rows 0..rows, cols 0..cols
    rp_idx = row_plan.idx[0:rows]
    lo, hi = int(rp_idx.min()), int(rp_idx.max()) + 1
    rp = rz.AxisPlan(idx=rp_idx - lo, fract=row_plan.fract[0:rows])
    cp = rz.AxisPlan(idx=col_plan.idx[0:cols], fract=col_plan.fract[0:cols])

    rng = np.random.default_rng(0)
    win_shape = (hi - lo, W, 3, 2, par.L, par.n)
    limbs = [rng.integers(0, int(p), size=win_shape[:-2] + (par.n,), dtype=np.uint64)
             for p in par.q_primes]
    win = jnp.asarray(np.stack(limbs, axis=-2).astype(np.uint32))
    print(f"window {win_shape} = {win.nbytes/1e6:.0f} MB", flush=True)

    t0 = time.time()
    yops, xops = rz.make_fract_bundles(ev, rp, cp, rz.BICUBIC,
                                       encryptor=encryptor, relin=None)
    jax.block_until_ready((yops.t2.data, yops.t3.data))
    print(f"fract power chain done {time.time()-t0:.1f}s", flush=True)

    tile_fn = rz.make_tile_fn(ev, rz.BICUBIC, plain=False, relin=None)
    t0 = time.time()
    out = tile_fn(win, rp.idx, cp.idx, yops, xops)
    out.block_until_ready()
    print(f"tile dispatch done {time.time()-t0:.1f}s shape={out.shape}", flush=True)
    host = np.asarray(out)
    print("fetched ok", host.shape, host.dtype, flush=True)


if __name__ == "__main__":
    main()
