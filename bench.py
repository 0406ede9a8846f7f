#!/usr/bin/env python
"""Headline benchmark: encrypted 8x8 blocks/s/chip for the homomorphic
RGB->YCC + DCT JPEG-encode pipeline (the reference's hot loop,
server_jpeg.cpp:127-135).

Baseline (BASELINE.md): single-core SEAL 2.3 DCT at n=4096 ~= 5.0
encrypted block-channels/s => ~1.667 full RGB blocks/s including YCC.
We report full-pipeline (YCC + 3xDCT) blocks/s on one chip and compare
against the DCT-only single-channel baseline the driver tracks
(blocks/s/chip vs 5.0), i.e. vs_baseline = channel-blocks-per-sec / 5.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    platform = os.environ.get("FHETPU_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from fhetpu.bfv.encoder import FractionalEncoder
    from fhetpu.bfv.evaluator import Evaluator
    from fhetpu.bfv.params import BfvParams
    from fhetpu.pipelines.jpeg_encode import make_server

    n = int(os.environ.get("FHETPU_BENCH_N", 4096))
    nb = int(os.environ.get("FHETPU_BENCH_BLOCKS", 16))
    iters = int(os.environ.get("FHETPU_BENCH_ITERS", 10))

    par = BfvParams.create(n=n, t=1 << 14)
    encoder = FractionalEncoder(par.t, par.n)
    ev = Evaluator(par, encoder)
    server = make_server(ev)

    rng = np.random.default_rng(0)
    shape = (nb, 3, 64, 2, par.L, par.n)
    # random well-formed RNS data (values < p_i per limb): timing-equivalent
    # to real ciphertexts for the modular-arithmetic pipeline
    limbs = []
    for p in par.q_primes:
        limbs.append(rng.integers(0, int(p), size=shape[:-2] + (par.n,), dtype=np.uint64))
    cts = np.stack(limbs, axis=-2).astype(np.uint32)

    from jax import lax

    from fhetpu.pipelines.jpeg_encode import server_compute_fn

    # XLA elementwise graph is the measured winner on real TPU (18.2 ms vs
    # pallas 28.4 ms at n=4096/nb=16); FHETPU_BENCH_PALLAS=1 opts back in
    use_pallas = os.environ.get("FHETPU_BENCH_PALLAS", "0") == "1"
    # fused single-kernel YCC+DCT (core/pallas_server.py): one HBM read +
    # one write per op, the bandwidth floor
    use_fused = os.environ.get("FHETPU_BENCH_FUSED", "1") == "1"
    # the production protocol streams ciphertexts in the NTT evaluation
    # domain (client transforms with the native host NTT), so the steady-
    # state server op is NTT-free; FHETPU_BENCH_NTT=1 measures the
    # coefficient-domain variant including per-chunk transforms
    with_ntt = os.environ.get("FHETPU_BENCH_NTT", "0") == "1"
    body = server_compute_fn(
        ev, use_pallas=use_pallas, input_ntt=not with_ntt,
        output_ntt=not with_ntt, use_fused=use_fused and not use_pallas,
    )

    def loop(x, k):
        # dynamic trip count: ONE compiled executable serves every k
        return lax.fori_loop(0, k, lambda i, v: body(v), x, unroll=1)

    jloop = jax.jit(loop)

    # single-dispatch in-graph iteration: the remote dispatch path has
    # multi-second per-call latency, so all timing runs inside one call;
    # differencing two iteration counts cancels the fixed dispatch overhead
    k1, k2 = 1, 1 + iters
    x = jnp.asarray(cts)
    jloop(x, 1).block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    jloop(x, k1).block_until_ready()
    t_a = time.perf_counter() - t0
    t0 = time.perf_counter()
    jloop(x, k2).block_until_ready()
    t_b = time.perf_counter() - t0
    dt = max(t_b - t_a, 1e-9)

    blocks_per_s = nb * (k2 - k1) / dt
    channel_blocks_per_s = blocks_per_s * 3  # baseline unit: per channel-block
    vs = channel_blocks_per_s / 5.0
    print(
        json.dumps(
            {
                "metric": "encrypted 8x8 channel-blocks/s/chip (FHE YCC+DCT, n=%d)" % n,
                "value": round(channel_blocks_per_s, 2),
                "unit": "channel-blocks/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
