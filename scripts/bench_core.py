#!/usr/bin/env python
"""Core-primitive roofline bench: device NTT and BEHZ ct x ct multiply.

BASELINE.json's north star demands "the NTT + ciphertext-multiply loop at
speed-of-light per chip" (VERDICT.md round-1 item 4).  This measures:

* forward NTT throughput over batched [B, L, n] uint32 (the staged-jnp XLA
  graph and, on TPU, the Pallas VMEM-resident kernel), reported both as
  NTTs/s and as achieved HBM GB/s against the 2 x 4 x B x L x n byte
  read+write floor of a perfectly fused single-pass implementation;
* BEHZ ciphertext multiply (size 2 x 2 -> 3) throughput in ct-mults/s;
* relinearize (3 -> 2, batched digit decomposition) throughput.

Usage: python scripts/bench_core.py [--n 4096] [--batch 64]
Writes bench_core.json next to the repo-root bench_details.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default=os.environ.get("FHETPU_BENCH_PLATFORM", ""))
    ap.add_argument("--only", default="",
                    help="comma-separated op-label substrings: run only "
                         "matching sections and MERGE into the existing "
                         "bench_core.json (rerun failed entries without "
                         "repaying the whole suite)")
    args = ap.parse_args()

    def wanted(label: str) -> bool:
        if not args.only:
            return True
        return any(s and s in label for s in args.only.split(","))

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax import lax

    from fhetpu.bench.timing import measure
    from fhetpu.bfv.encoder import FractionalEncoder
    from fhetpu.bfv.evaluator import Ct, DeviceRelinKeys, Evaluator
    from fhetpu.bfv.params import BfvParams
    from fhetpu.core import ntt as ntt_mod

    n, B = args.n, args.batch
    par = BfvParams.create(n=n, t=1 << 14)
    encoder = FractionalEncoder(par.t, par.n)
    ev = Evaluator(par, encoder)
    L = par.L
    backend = jax.default_backend()

    rng = np.random.default_rng(0)

    def rand_rns(shape):
        limbs = [
            rng.integers(0, int(p), size=shape + (n,), dtype=np.uint64)
            for p in par.q_primes
        ]
        return np.stack(limbs, axis=-2).astype(np.uint32)

    results = {"n": n, "L": L, "batch": B, "backend": backend, "ops": {},
               "ntt_sweep": {}}

    # ---- forward NTT: batch sweep over implementation variants ----------
    # (VERDICT.md round-2 item 6: commit the batch sweep the crossover
    # claims rest on, plus the four-step MXU attempt, plus a roofline
    # statement.)  Variants:
    #   xla       -- staged-jnp butterfly graph (core/ntt.py)
    #   pallas    -- single-pass VMEM-resident butterfly kernel, R sweep
    #   fourstep  -- n = AxB decomposition as int8 digit-plane matmuls on
    #                the MXU with VPU 96-bit recombination (core/ntt4step.py)
    tables = par.tables_q
    from fhetpu.core import ntt4step

    def sweep_entry(fn, xb, label, Bsz):
        def loop(v, k):
            return lax.fori_loop(0, k, lambda i, a: fn(a), v, unroll=1)

        jloop = jax.jit(loop)
        sec, k, dt = measure(jloop, xb, label)
        bytes_io = 2 * 4 * Bsz * L * n
        return {
            "us_per_call": round(sec * 1e6, 2),
            "ntts_per_s": round(Bsz * L / sec, 1),
            "achieved_gb_per_s": round(bytes_io / sec / 1e9, 2),
            "k": k,
            "dt_s": round(dt, 3),
        }

    # force-route around the production dispatcher so each variant is
    # measured as itself (ntt_mod.ntt would pick pallas at small batches)
    from fhetpu.core.ntt import _ntt_impl

    for Bsz in (16, 64, 256, 1024):
        if not wanted("ntt_sweep"):
            break
        x_s = jnp.asarray(rand_rns((Bsz,)))
        entry = {}
        entry["xla"] = sweep_entry(
            lambda a: _ntt_impl(jnp, a, tables), x_s, f"ntt_xla_B{Bsz}", Bsz)
        try:
            got = np.asarray(jax.jit(
                lambda a: ntt4step.ntt4(a, tables, True))(x_s[:2]))
            ref = np.asarray(jax.jit(
                lambda a: _ntt_impl(jnp, a, tables))(x_s[:2]))
            assert np.array_equal(got, ref), "fourstep NTT mismatch"
            entry["fourstep_mxu"] = sweep_entry(
                lambda a: ntt4step.ntt4(a, tables, True), x_s,
                f"ntt_fourstep_B{Bsz}", Bsz)
        except Exception as e:
            entry["fourstep_mxu"] = f"{type(e).__name__}: {e}"[:200]
        if backend == "tpu":
            try:
                from fhetpu.core import pallas_ntt

                best = None
                for R in (4, 8, 16, 32):
                    if R > Bsz:
                        continue
                    fwd = pallas_ntt.make_ntt(par, forward=True,
                                              rows_per_block=R)
                    got = np.asarray(jax.jit(fwd)(x_s[:R]))
                    ref = np.asarray(jax.jit(
                        lambda a: _ntt_impl(jnp, a, tables))(x_s[:R]))
                    assert np.array_equal(ref, got), "pallas NTT mismatch"
                    e = sweep_entry(fwd, x_s, f"ntt_pallas_B{Bsz}_R{R}", Bsz)
                    e["R"] = R
                    if best is None or e["us_per_call"] < best["us_per_call"]:
                        best = e
                entry["pallas"] = best
            except Exception as e:
                entry["pallas"] = f"{type(e).__name__}: {e}"[:200]
        results["ntt_sweep"][str(Bsz)] = entry

    # ---- production-dispatch NTT numbers at the headline batch ----------
    x = jnp.asarray(rand_rns((B,)))

    def ntt_loop(fn, label):
        if not wanted(label):
            return
        results["ops"][label] = sweep_entry(fn, x, label, B)

    # explicit staged-XLA graphs (the production dispatcher ntt_mod.ntt
    # routes batch<=128 TPU transforms to Pallas -- measured separately)
    from fhetpu.core.ntt import _intt_impl

    ntt_loop(lambda a: _ntt_impl(jnp, a, tables), "ntt_fwd_xla")
    ntt_loop(lambda a: _intt_impl(jnp, a, tables), "ntt_inv_xla")
    ntt_loop(lambda a: ntt_mod.ntt(a, tables), "ntt_fwd_dispatch")
    ntt_loop(lambda a: ntt_mod.intt(a, tables), "ntt_inv_dispatch")
    if backend == "tpu":
        try:
            from fhetpu.core import pallas_ntt

            fwd = pallas_ntt.make_ntt(par, forward=True)
            inv = pallas_ntt.make_ntt(par, forward=False)
            ref = np.asarray(jax.jit(lambda a: _ntt_impl(jnp, a, tables))(x))
            got = np.asarray(jax.jit(fwd)(x))
            assert np.array_equal(ref, got), "pallas NTT mismatch vs XLA"
            ntt_loop(fwd, "ntt_fwd_pallas")
            ntt_loop(inv, "ntt_inv_pallas")
        except Exception as e:  # VMEM limits at large L*n; record and move on
            results["ops"]["ntt_pallas_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---- BEHZ ct x ct multiply (2 x 2 -> 3) ------------------------------
    a = Ct(jnp.asarray(rand_rns((B, 2))), False)
    b = Ct(jnp.asarray(rand_rns((B, 2))), False)

    def mul_loop(v, k):
        def body(i, acc):
            out = ev.multiply(Ct(acc, False), b)
            # feed back first two components to keep shapes static
            return out.data[..., :2, :, :]

        return lax.fori_loop(0, k, body, v, unroll=1)

    jmul = jax.jit(mul_loop)
    if wanted("behz_multiply"):
        sec, k, dt = measure(jmul, a.data, "behz_multiply")
        results["ops"]["behz_multiply"] = {
            "ms_per_batch": round(sec * 1e3, 3),
            "ct_mults_per_s": round(B / sec, 1),
            "k": k,
            "dt_s": round(dt, 3),
        }

    # ---- relinearize (3 -> 2), batched digit decomposition --------------
    from fhetpu.bfv.crypto import KeyGenerator

    kg = KeyGenerator(par, seed=7)
    rk = DeviceRelinKeys(kg.relin_keys(max_power=2))
    c3 = jnp.asarray(rand_rns((B, 3)))

    def relin_loop(v, k):
        def body(i, acc):
            out = ev.relinearize(Ct(acc, False), rk)
            return jnp.concatenate([out.data, acc[..., 2:, :, :]], axis=-3)

        return lax.fori_loop(0, k, body, v, unroll=1)

    jrelin = jax.jit(relin_loop)
    if wanted("relinearize"):
        sec, k, dt = measure(jrelin, c3, "relinearize")
        results["ops"]["relinearize"] = {
            "ms_per_batch": round(sec * 1e3, 3),
            "relins_per_s": round(B / sec, 1),
            "k": k,
            "dt_s": round(dt, 3),
        }

    # ---- resize interpolation throughput (VERDICT r3 item 5) -------------
    # In-graph interps/s for the reference's Linear/Cubic ms-per-interp
    # columns (results.txt:5,21,24,168; 3 Linear or 20 Cubic interps per
    # output pixel, fhe_resize.h:245-250, 296-303).  The tile recomputes in
    # a fori_loop; a modular add of an output slice back into the window
    # defeats DCE without changing op count (values stay well-formed mod p).
    from fhetpu.bfv.crypto import Encryptor
    from fhetpu.core import modops
    from fhetpu.pipelines import resize as rz

    enc = Encryptor(par, kg.public_key(), seed=8)
    rk16 = DeviceRelinKeys(kg.relin_keys(max_power=2, digit_bits=16))

    def resize_entry(label, mode, plain, relin, H2, W2, Hs=12, Ws=12):
        rp = rz.axis_plan(Hs, H2, mode)
        cp = rz.axis_plan(Ws, W2, mode)
        yops, xops = rz.make_fract_bundles(
            ev, rp, cp, mode, encryptor=None if plain else enc, relin=relin)
        win = jnp.asarray(rand_rns((Hs, Ws, 3, 2)))
        rp_i, cp_i = jnp.asarray(rp.idx), jnp.asarray(cp.idx)
        interps = H2 * W2 * (20 if mode == rz.BICUBIC else 3)

        def loop(w, k):
            def body(i, w):
                out = rz.resize_tile(
                    ev, w, rz.AxisPlan(rp_i, None), rz.AxisPlan(cp_i, None),
                    yops, xops, mode, plain, relin)
                fold = out[0, 0, :, :2][None, None]  # [1,1,3,2,L,n]
                return modops.addmod(w, fold, jnp.asarray(par.consts.qp))

            return lax.fori_loop(0, k, body, w, unroll=1)

        timing = "in-graph fori"
        try:
            sec, k_, dt = measure(jax.jit(loop), win, label)
        except Exception as e:
            # the deep ct*ct tile wrapped in fori_loop can exceed the
            # remote compiler's limits; fall back to direct repeated
            # dispatches (valid when per-call compute >> the ~50 ms
            # dispatch floor, which holds for the ct*ct tiles)
            import time as _time

            print(f"[bench] {label}: fori variant failed ({e}); "
                  "direct-dispatch fallback", file=sys.stderr)
            try:
                f = jax.jit(lambda w: rz.resize_tile(
                    ev, w, rz.AxisPlan(rp_i, None), rz.AxisPlan(cp_i, None),
                    yops, xops, mode, plain, relin))
                np.asarray(f(win))  # warm (forces the remote compile)
                samples = []
                for _ in range(3):
                    t0 = _time.perf_counter()
                    f(win).block_until_ready()
                    samples.append(_time.perf_counter() - t0)
                sec, k_, dt = min(samples), 1, sum(samples)
                timing = "direct-dispatch (incl. ~50ms floor)"
            except Exception as e2:
                results["ops"][label] = f"{type(e2).__name__}: {e2}"[:200]
                return
        results["ops"][label] = {
            "ms_per_tile": round(sec * 1e3, 3),
            "out_px": H2 * W2,
            "interps_per_s": round(interps / sec, 1),
            "ms_per_interp": round(sec * 1e3 / interps, 4),
            "k": k_,
            "dt_s": round(dt, 3),
            "timing": timing,
        }

    if wanted("linear_plainfract"):
        resize_entry("linear_plainfract", rz.BILINEAR, True, None, 17, 17)
    if wanted("cubic_plainfract"):
        resize_entry("cubic_plainfract", rz.BICUBIC, True, None, 17, 17)
    # ct*ct tiles sized down (4x4 relin / 2x2 faithful): the 17x17 relin
    # and 4x4 faithful graphs crashed the remote compile service
    # (tpu_compile_helper exit 1) -- per-interp throughput is tile-size
    # independent once the dispatch floor is amortized
    if wanted("cubic_ctct_relin16"):
        resize_entry("cubic_ctct_relin16", rz.BICUBIC, False, rk16, 4, 4,
                     Hs=8, Ws=8)
    if wanted("cubic_ctct_faithful"):
        resize_entry("cubic_ctct_faithful", rz.BICUBIC, False, None, 2, 2,
                     Hs=8, Ws=8)

    # ---- harmonic decode expansion throughput (VERDICT r3 item 5) --------
    # Depth-0 positions/s: out_i = h0 + sum_j cos(a_j i) hc_j + sin(a_j i)
    # hs_j -- multiply_plain + add only (rle_decode.py:294-308).  The CLI
    # Step rows are compile+transfer dominated (the order-16 "slower than
    # order-64" oddity was the first-call compile amortized over 4x fewer
    # positions); this is the steady-state on-chip number.
    from fhetpu.pipelines import rle_decode as rd

    for order, degree in ((16, 48), (64, 192)):
        if not wanted(f"harmonics_order{order}"):
            continue
        positions = np.arange(order, dtype=np.float64)
        Hh = 2 * degree + 1
        harm = Ct(jnp.asarray(rand_rns((Hh, 2))), False)
        tabs = rd.harmonic_weight_tables(ev, positions, order, degree)
        hn = ev.transform_to_ntt(harm).data
        p, mu, sh = ev.p, ev.mu, ev.shift

        # the weight table rides as a TRACED argument, not a closure
        # constant: closed-over it is inlined into the HLO, and at order
        # 64 that [385,64,L,n] literal made the remote_compile payload
        # ~1.6 GB -- the round-4 broken-pipe failure.  As an operand it
        # stays device-resident (zero per-call upload) and the program
        # text stays small.
        def loop(state, k):
            hn_, tabs_ = state

            def body(i, h):
                def inner(kk, acc):
                    term = modops.mulmod(tabs_[kk][:, None], h[kk][None],
                                         p, mu, sh)
                    return modops.addmod(acc, term, p)

                acc0 = jnp.zeros((tabs_.shape[1],) + tuple(h.shape[1:]),
                                 jnp.uint32)
                out = lax.fori_loop(0, tabs_.shape[0], inner, acc0)
                fold = out[0][None]  # [1, size, L, n]
                return modops.addmod(h, fold, jnp.asarray(par.consts.qp))

            return lax.fori_loop(0, k, body, hn_, unroll=1)

        label = f"harmonics_order{order}"
        try:
            sec, k_, dt = measure(jax.jit(loop), (hn, tabs), label)
        except Exception as e:
            results["ops"][label] = f"{type(e).__name__}: {e}"[:200]
            continue
        results["ops"][label] = {
            "degree": degree,
            "positions": order,
            "ms_per_channel_expand": round(sec * 1e3, 3),
            "positions_per_s": round(order / sec, 1),
            "k": k_,
            "dt_s": round(dt, 3),
        }

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_core.json"
    )
    if args.only and os.path.exists(out_path):
        # merge mode: refresh only the sections that ran
        with open(out_path) as f:
            prior = json.load(f)
        prior["ops"].update(results["ops"])
        if results["ntt_sweep"]:
            prior["ntt_sweep"] = results["ntt_sweep"]
        results = prior
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["ops"], indent=1))


if __name__ == "__main__":
    main()
