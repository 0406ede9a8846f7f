#!/usr/bin/env python
"""VPU op-cost probe: measure per-element throughput of the modular-arithmetic
building blocks behind the fused server kernel (core/pallas_server.py).

The fused YCC+DCT kernel measures 8.5 ms at n=4096/nb=16 (bench_details.json)
against a ~1 ms HBM floor, i.e. it is compute-bound.  Whether further fusion
work can pay requires knowing what each primitive actually costs on the VPU:
a Shoup modmul is ~20 int32 ops as written (15 of them inside the 16-bit-limb
mulhi32), a modadd is 3.  This probe times data-dependent chains of each
primitive as single fused XLA loops over a VMEM-sized array, giving
ns/element-op figures that bound any rewrite's payoff.

Writes probe_vpu.json next to bench_core.json.  Run on the real TPU.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from fhetpu.bench.timing import measure
    from fhetpu.bfv.params import BfvParams
    from fhetpu.core import modops

    par = BfvParams.create(n=4096, t=1 << 14)
    L, n = par.L, par.n
    B = 256  # [B, L, n] uint32 ~ 16.8 MB: big enough to amortize dispatch
    rng = np.random.default_rng(0)
    p_np = par.consts.qp.reshape(L, 1)
    x0 = np.stack(
        [rng.integers(0, int(p), size=(B, n), dtype=np.uint64) for p in par.q_primes],
        axis=1,
    ).astype(np.uint32)
    p = jnp.asarray(p_np.astype(np.uint32))
    w_np = (p_np.astype(np.uint64) // 3 + 1).astype(np.uint32)
    w = jnp.asarray(w_np)
    wsh = jnp.asarray(modops.shoup(w_np, p_np.astype(np.uint64)).astype(np.uint32))

    elems = x0.size

    def chain(body):
        def loop(x, k):
            return lax.fori_loop(0, k, lambda i, v: body(v), x, unroll=1)

        return jax.jit(loop)

    # each body consumes and produces the whole array (data-dependent chain,
    # can't be CSE'd away); all stay in [0, p) so the chain is stable
    variants = {
        # 3 int ops
        "addmod": chain(lambda v: modops.addmod(v, w, p)),
        # ~20 int ops (15 in mulhi32)
        "shoup_mulmod": chain(lambda v: modops.mulmod_shoup(v, w, wsh, p)),
        # ~27 int ops (Barrett, two reductions)
        "barrett_mulmod": chain(
            lambda v, _mu=jnp.asarray(par.consts.qmu.astype(np.uint32)),
            _sh=jnp.asarray(par.consts.qshift.astype(np.uint32)): modops.mulmod(
                v, w, p, _mu, _sh
            )
        ),
        # raw int32 mul + add (wrap-around; masked back under p to stay stable)
        "raw_i32_muladd": chain(lambda v: (v * w + v) & (p - 1) | jnp.uint32(1)),
        # mulhi alone + cheap masked fold (the 15-op core of Shoup)
        "mulhi32": chain(lambda v: (modops.mulhi32(v, wsh) & (p - 1)) | jnp.uint32(1)),
        # float32 fma chain for comparison (VPU native rate)
        "f32_fma": None,  # built below on a float array
    }

    details = {"B": B, "L": L, "n": n, "elems": elems,
               "backend": jax.default_backend(), "ops": {}}
    x = jnp.asarray(x0)
    for name, jloop in variants.items():
        if name == "f32_fma":
            xf = jnp.asarray((x0 % 1000).astype(np.float32))
            cf = jnp.float32(1.0000001)

            def fbody(v):
                return v * cf + jnp.float32(1e-7)

            jloop = chain(fbody)
            sec, k, dt = measure(jloop, xf, name)
        else:
            sec, k, dt = measure(jloop, x, name)
        ns_per_elem = sec / elems * 1e9
        details["ops"][name] = {
            "us_per_chain_step": round(sec * 1e6, 2),
            "ns_per_element_op": round(ns_per_elem, 4),
            "giga_elem_ops_per_s": round(1.0 / ns_per_elem, 2),
            "k": k,
            "dt_s": round(dt, 3),
        }
        print(name, details["ops"][name], flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "probe_vpu.json")
    with open(out, "w") as f:
        json.dump(details, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
