"""Break down the JPEG server op's device time: YCC vs DCT (pallas/xla).

Usage: python scripts/profile_server_op.py [n] [nb] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fhetpu.bfv.encoder import FractionalEncoder
from fhetpu.bfv.evaluator import Ct, Evaluator
from fhetpu.bfv.params import BfvParams
from fhetpu.pipelines import jpeg_encode as je

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
nb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

par = BfvParams.create(n=n, t=1 << 14)
ev = Evaluator(par, FractionalEncoder(par.t, par.n))

rng = np.random.default_rng(0)
shape = (nb, 3, 64, 2, par.L, par.n)
limbs = [rng.integers(0, int(p), size=shape[:-2] + (par.n,), dtype=np.uint64)
         for p in par.q_primes]
cts = jnp.asarray(np.stack(limbs, axis=-2).astype(np.uint32))


def ycc_only(d):
    r, g, b = Ct(d[:, 0], True), Ct(d[:, 1], True), Ct(d[:, 2], True)
    y, cb, cr = je.rgb_to_ycc(ev, r, g, b)
    return jnp.stack([y.data, cb.data, cr.data], axis=1)


def dct_pallas(d):
    from fhetpu.core.pallas_dct import dct8x8_pallas
    return dct8x8_pallas(ev, d)


def dct_xla(d):
    out_ch = []
    for c in range(3):
        slots = [Ct(d[:, c, k], True) for k in range(64)]
        slots = je.dct8x8(ev, slots)
        out_ch.append(jnp.stack([s.data for s in slots], axis=1))
    return jnp.stack(out_ch, axis=1)


def bench(name, fn):
    def loop(x, k):
        return lax.fori_loop(0, k, lambda i, v: fn(v), x, unroll=1)
    j = jax.jit(loop)
    j(cts, 1).block_until_ready()
    t0 = time.perf_counter(); j(cts, 1).block_until_ready()
    ta = time.perf_counter() - t0
    t0 = time.perf_counter(); j(cts, 1 + iters).block_until_ready()
    tb = time.perf_counter() - t0
    dt = max(tb - ta, 1e-9) / iters
    print(f"{name:12s} {dt*1e3:9.2f} ms/iter   {nb/dt:9.1f} blocks/s "
          f"{3*nb/dt:9.1f} chan-blocks/s", flush=True)
    return dt


full_pallas = je.server_compute_fn(ev, use_pallas=True, input_ntt=True, output_ntt=True)
full_xla = je.server_compute_fn(ev, use_pallas=False, use_fast=False,
                                input_ntt=True, output_ntt=True)
full_fast = je.server_compute_fn(ev, use_fast=True, input_ntt=True, output_ntt=True)

bench("ycc", ycc_only)
bench("dct_pallas", dct_pallas)
bench("full_pallas", full_pallas)
bench("dct_xla", dct_xla)
bench("full_xla", full_xla)
bench("full_fast", full_fast)
