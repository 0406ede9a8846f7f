"""Single-pass Pallas NTT: all log2(n) butterfly stages in VMEM.

The staged-jnp device NTT (core/ntt.py) materializes the array between
stages, so XLA reads+writes HBM ~log2(n) times per transform.  This kernel
loads a tile of polynomials into VMEM once, runs every butterfly stage
on-chip, and writes the result once -- the 2x4xBxLxn-byte HBM floor
(VERDICT.md round-1 item 4: "the NTT + ciphertext-multiply loop at
speed-of-light per chip"; reference backend role: SEAL 2.3's NTT,
SURVEY.md C1).

Layout trick: a length-n polynomial viewed as [rows = n/128, 128 lanes].
A Cooley-Tukey/Gentleman-Sande butterfly at distance t is a roll:

* the partner of position i is i +- t, and (i & t) == 0 tells u from v;
* t >= 128 -> roll along the sublane (row) axis by t/128;
* t  < 128 -> roll along the lane axis by t;
* wrapped/cross-group values land only at positions the (i & t) mask
  discards, so plain circular rolls are exact.

Twiddles are prebuilt per stage as full-length vectors w_full[s][i] =
psi_br[m + (i >> (log2(t)+1))] (with Shoup companions), so every stage is
one mulmod_shoup + two rolls + one select -- all VPU elementwise ops on
VMEM-resident data.  Bit-reversed ordering is identical to core/ntt.py, so
the kernel is a drop-in replacement validated elementwise against it
(tests/test_ntt.py, interpret mode; scripts/bench_core.py on hardware).

MEASURED OUTCOME (v5e, n=4096, L=4; bench_core.json ntt_sweep, analysis
in docs/ntt_roofline.md): this kernel is bit-exact and batch-flat at
~2.7-2.8M limb-NTTs/s (24/91/363/1528 us at B=16/64/256/1024, ~92 GB/s
effective single-pass bandwidth) -- it BEATS the staged-XLA graph at
every batch size except XLA's B~256 fusion sweet spot (283 vs 363 us),
so the production dispatcher (core/ntt.py:_use_pallas) routes every
eligible transform here outside that measured window.  At 91 us for
8.4 MB of HBM traffic the kernel is ~9x above the HBM floor: the NTT at
30-bit primes is VPU-COMPUTE-bound (~120 synthesized int32 ops/element
across the 12 stages, ~1.4e12 ops/s achieved), not HBM-bound.  The
four-step MXU formulation (core/ntt4step.py) was built and measured as
the only remaining lever and LOSES 6.3x at B=64 -- its digit-domain
recombination costs ~2x the butterfly VPU work the MXU absorbs (see the
roofline doc).  At n=8192/L=8 the resident stage tables (6.9 MB) push
the working set past what the Mosaic compiler accepts, so those stay on
the staged graph.

Blocks keep the limb axis whole -- Mosaic requires the last two block dims
divisible by (8, 128) or equal to the array's, so the block is
[R, L, n] over data [B, L, n] with per-limb twiddle planes broadcast
inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import modops
from .ntt import NttTables


def _stage_tables(tables: NttTables, forward: bool):
    """Full-length per-stage twiddle vectors [S, L, n] (w and shoup)."""
    n, logn = tables.n, tables.logn
    L = len(tables.primes)
    w = np.zeros((logn, L, n), dtype=np.uint32)
    ws = np.zeros((logn, L, n), dtype=np.uint32)
    idx = np.arange(n)
    if forward:
        src, src_s = tables.psi_br, tables.psi_br_shoup
        m, t = 1, n
        for s in range(logn):
            t //= 2
            g = idx >> (t.bit_length())  # i >> (log2(t)+1)
            w[s] = src[:, m + g]
            ws[s] = src_s[:, m + g]
            m *= 2
    else:
        src, src_s = tables.ipsi_br, tables.ipsi_br_shoup
        t, m = 1, n
        for s in range(logn):
            h = m // 2
            g = idx >> (t.bit_length())
            w[s] = src[:, h + g]
            ws[s] = src_s[:, h + g]
            t *= 2
            m = h
    return w, ws


def _stage_ts(n: int, forward: bool):
    logn = n.bit_length() - 1
    if forward:
        return [n >> (s + 1) for s in range(logn)]
    return [1 << s for s in range(logn)]


def _kernel(x_ref, w_ref, ws_ref, p_ref, o_ref, *, n, L, forward, lanes=128):
    from jax.experimental.pallas import tpu as pltpu

    rows = n // lanes
    R = x_ref.shape[0]
    a = x_ref[:].reshape(R, L, rows, lanes)
    p = p_ref[:].reshape(1, L, 1, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows, lanes), 2)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows, lanes), 3)

    def roll(v, shift, t):
        # pltpu.roll requires non-negative shift; -s == size - s circularly
        if t >= lanes:
            return pltpu.roll(v, (shift * (t // lanes)) % rows, axis=2)
        return pltpu.roll(v, (shift * t) % lanes, axis=3)

    def is_u(t):
        ids = row_ids * lanes + lane_ids if t >= lanes else lane_ids
        return (ids & t) == 0

    ts = _stage_ts(n, forward)
    for s, t in enumerate(ts):
        w = w_ref[s].reshape(1, L, rows, lanes)
        ws = ws_ref[s].reshape(1, L, rows, lanes)
        mask = is_u(t)
        if forward:
            # CT: u' = u + w*v ; v' = u - w*v
            wv = modops.mulmod_shoup(a, w, ws, p)
            a = jnp.where(
                mask,
                modops.addmod(a, roll(wv, -1, t), p),
                modops.submod(roll(a, 1, t), wv, p),
            )
        else:
            # GS: u' = u + v ; v' = (u - v) * w
            a = jnp.where(
                mask,
                modops.addmod(a, roll(a, -1, t), p),
                modops.mulmod_shoup(
                    modops.submod(roll(a, 1, t), a, p), w, ws, p
                ),
            )
    if not forward:
        # final n^-1 scaling; the caller appends the expanded n_inv plane
        # as stage row logn of the twiddle inputs
        w = w_ref[len(ts)].reshape(1, L, rows, lanes)
        ws = ws_ref[len(ts)].reshape(1, L, rows, lanes)
        a = modops.mulmod_shoup(a, w, ws, p)
    o_ref[:] = a.reshape(R, L, n)


def _build(tables: NttTables, forward: bool, R: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = tables.n
    L = len(tables.primes)
    w, ws = _stage_tables(tables, forward)
    if not forward:
        ninv = np.broadcast_to(tables.n_inv, (L, n))[None]
        ninv_s = np.broadcast_to(tables.n_inv_shoup, (L, n))[None]
        w = np.concatenate([w, ninv.astype(np.uint32)], axis=0)
        ws = np.concatenate([ws, ninv_s.astype(np.uint32)], axis=0)
    # NB: tables stay NUMPY.  _cached is an lru_cache; if the first build
    # happens inside a jit trace (the production dispatcher routes small
    # batches here from arbitrary call sites), jnp constants created there
    # would be trace-local tracers cached across traces -> the round-3
    # UnexpectedTracerError in bench_core's relinearize loop.  numpy
    # operands are converted per call site instead.
    w = np.ascontiguousarray(w)    # [S, L, n]
    ws = np.ascontiguousarray(ws)
    S = w.shape[0]
    p_arr = np.broadcast_to(tables.p.reshape(L, 1), (L, 1)).astype(np.uint32)

    kern = functools.partial(_kernel, n=n, L=L, forward=forward)

    def call(x):
        # x: [B, L, n] with B % R == 0
        B = x.shape[0]
        grid = (B // R,)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((R, L, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, L, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, L, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, L, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            interpret=interpret,
        )(x, w, ws, p_arr)

    def apply(x):
        """x: [..., L, n] -> same shape; batches flattened and padded to R."""
        shape = x.shape
        flat = x.reshape(-1, L, n)
        B = flat.shape[0]
        pad = (-B) % R
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, L, n), jnp.uint32)], axis=0
            )
        out = call(flat)
        if pad:
            out = out[:B]
        return out.reshape(shape)

    return apply


@functools.lru_cache(maxsize=None)
def _cached(primes: tuple, n: int, forward: bool, R: int, interpret: bool):
    return _build(NttTables(primes, n), forward, R, interpret)


def default_rows_per_block(L: int, n: int, logn: int) -> int:
    """Largest power-of-two R whose working set fits VMEM: the twiddle
    tables are resident (2 * S * L * n * 4 bytes) and each butterfly stage
    keeps ~6 live [R, L, n] uint32 temporaries.

    The limb axis is the sublane dimension of the (8, 128) vreg tiling, so
    L in 5..7 physically pads to 8 -- ignoring that made the BEHZ Bsk base
    (K=6 at n=4096) pick R=8 and blow the 16M scoped-VMEM limit by 3.7%
    (round-4 grid: bilinear_boaz16_4096 compile failures; same signature in
    the fori-wrapped ct*ct bench entries).  L=4 packs two limb planes per
    vreg row and is measured good at R=16 on hardware.  Rounding is general
    (any L rounds up to the next sublane multiple of 8, L<=4 divides a vreg
    row evenly) so e.g. the K=10 BEHZ Bsk base at n=8192 (L in 9..15 pads
    to 16) is budgeted at its physical footprint too."""
    Lp = L if L <= 4 else -(-L // 8) * 8
    tables_bytes = 2 * (logn + 1) * Lp * n * 4
    budget = 13 * 1024 * 1024 - tables_bytes
    R = 1
    while 2 * R * 6 * Lp * n * 4 <= budget and R < 32:
        R *= 2
    return R  # measured best: R=16 at n=4096/L=4 (see module docstring)


def make_ntt(params_or_tables, forward: bool = True,
             rows_per_block: int | None = None, interpret: bool = False):
    """Build a jit-compatible single-pass NTT over [..., L, n] uint32.

    params_or_tables: BfvParams (uses .tables_q) or NttTables.
    interpret=True runs the Pallas interpreter (CPU testing only).
    """
    tables = getattr(params_or_tables, "tables_q", params_or_tables)
    if rows_per_block is None:
        rows_per_block = default_rows_per_block(
            len(tables.primes), tables.n, tables.logn
        )
    return _cached(tuple(tables.primes), tables.n, forward,
                   rows_per_block, interpret)
