"""Fused Pallas TPU kernel: the ENTIRE JPEG server op (RGB->YCC + 2-D AAN
DCT, server_jpeg.cpp:127-135) in one pass over the native stream layout.

Why this beats both the XLA elementwise graph and the earlier per-stage
Pallas DCT (core/pallas_dct.py):

* The XLA graph runs ~40 fusion clusters over the [nb, 3, 64, 2, L, n]
  working set -- every cluster is an HBM read + write of the full batch, so
  the op is fusion-granularity bandwidth-bound (measured 16.6 ms vs 8.5 ms
  for this kernel at n=4096/nb=16 on TPU v5e -- bench_details.json).
* pallas_dct keeps the DCT VMEM-resident but pays two full HBM transposes
  into its [nb, ch, L, 8, 8, 2n] layout and leaves YCC to XLA outside.
* This kernel reads each ciphertext block ONCE in the layout the stream
  protocol already uses ([nb, 3, 64, 2, L, n], NTT evaluation domain),
  computes YCC + both AAN passes on VMEM-resident tiles, and writes the
  result ONCE.  HBM traffic: 1 read + 1 write, the speed-of-light floor.

Bit-exactness: modular add/sub/mul residues are associativity-independent,
and every multiply uses the same FractionalEncoder-encoded constant as the
reference network (fhe_image.h:206-284, :307-325), so decrypted output is
bit-identical to the unfused path (asserted by tests/test_jpeg_pipeline.py).

Layout: the (L, n) axes are flattened into ONE lane axis of length L*n (a
free, contiguous reshape), so the per-limb modulus p and all NTT'd plaintext
constants become per-lane vectors and every modular op is purely elementwise.
A kernel block is [3, 64, 2, chunk] (channel, coeff slot, ct component, lane
chunk).  YCC is slot-independent -> computed on [128, chunk] channel tiles
(full 8-sublane utilization).  The row pass vectorizes the 8-point network
across the 8 slot groups as ops on [16, chunk] tiles; the column pass
re-slices the other way.  The -128 sub_plain constant applies to ciphertext
component 0 only ([2, chunk] with a zero row).

Grid: (nb, L*n/chunk) -- one program per block x lane chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_dct import CONST_ORDER, _aan_pass, _addmod, _submod, _shoup

# YCC multiply constants in evaluator.rgb_to_ycc order (jpeg_encode.py:46-64)
YCC_MULS = (0.299, 0.587, 0.114, -0.168736, 0.331264, 0.5, 0.418688, 0.081312)
N_DCT = len(CONST_ORDER)  # 13
N_YCC = len(YCC_MULS)  # 8
_ROWS = 24  # 13 DCT + 8 YCC muls + 1 sub_plain(128) + 1 p row, padded to 24
_P_ROW = N_DCT + N_YCC + 1  # 22


def pack_server_constants(ev):
    """[24, L*n] lane-flattened mul-NTT table + Shoup companions (numpy).

    Rows 0..12: DCT constants (CONST_ORDER); rows 13..20: YCC multiply
    constants; row 21: NTT(Delta*128) for the sub_plain (Shoup row zero);
    row 22: the per-lane modulus p; row 23: zero padding."""
    muls, shs = [], []
    for c in CONST_ORDER + YCC_MULS:
        op = ev.encode(float(c))
        muls.append(op.mul_ntt.reshape(-1))  # [L*n]
        shs.append(op.mul_ntt_shoup.reshape(-1))
    sub_op = ev.encode(128.0)
    muls.append(sub_op.add_ntt.reshape(-1))  # delta-scaled, for sub_plain on c0
    shs.append(np.zeros_like(muls[-1]))
    L = ev.params.L
    n = ev.params.n
    p_lane = np.broadcast_to(
        ev.params.consts.qp.reshape(L, 1), (L, n)
    ).reshape(-1).astype(np.uint32)
    muls.append(p_lane)
    shs.append(np.zeros_like(p_lane))
    mul = np.stack(muls, axis=0)  # [23, L*n]
    sh = np.stack(shs, axis=0)
    pad = ((0, _ROWS - mul.shape[0]), (0, 0))
    return np.pad(mul, pad), np.pad(sh, pad)


def _ycc(r, g, b, C, Csh, p):
    """Channel tiles [S, chunk] -> (y, cb, cr); same multiplies/op graph as
    pipelines.jpeg_encode.rgb_to_ycc (minus the c0-only -128, applied by the
    caller)."""

    def mul(x, i):
        return _shoup(x, C[N_DCT + i], Csh[N_DCT + i], p)

    y = _addmod(_addmod(mul(r, 0), mul(g, 1), p), mul(b, 2), p)
    cb = _addmod(_submod(mul(r, 3), mul(g, 4), p), mul(b, 5), p)
    cr = _submod(_submod(mul(r, 5), mul(g, 6), p), mul(b, 7), p)
    return y, cb, cr


# ---------------------------------------------------------------------------
# Lazy-reduction variant (Harvey-style): intermediates ride in [0, k*p) with
# raw u32 adds, reductions deferred to pass boundaries.  Correct because
# every op only ever adds multiples of p (congruence mod p preserved) and
# the Shoup product r = x*w - mulhi(x, w')*p lies in [0, 2p) for ANY
# x < 2^32 (q = floor(x*w'/2^32) >= x*w/p - x/2^32 - 1), so multiplies
# accept lazy inputs directly.  Headroom: max intermediate is
# 8*m*p (m = row-pass input bound multiple), so m=2 needs 16p <= 2^32
# (primes < 2^28: n <= 4096) and m=1 needs 8p <= 2^32 (n = 8192).
# n=16384's 30-bit primes leave only 4p -- the strict kernel serves there.
# The Shoup companions are also pre-split into 16-bit halves host-side,
# saving the two in-kernel split ops per multiply.
# ---------------------------------------------------------------------------

_M16 = 0xFFFF


def _lmul(x, w, wl, wh, p):
    """x*w - mulhi(x, wsh)*p in [0, 2p); x may be lazy (< 2^32)."""
    a0 = x & _M16
    a1 = x >> 16
    m1 = a1 * wl
    m2 = a0 * wh
    mid = ((a0 * wl) >> 16) + (m1 & _M16) + (m2 & _M16)
    q = a1 * wh + (m1 >> 16) + (m2 >> 16) + (mid >> 16)
    return x * w - q * p


def _red_to(x, p, from_m: int, to_m: int):
    """Reduce x < from_m*p to [0, to_m*p) by conditional subtractions of
    power-of-two multiples of p."""
    t = 1
    while t * 2 < from_m:
        t *= 2
    while t >= to_m:
        tp = p << _log2(t) if t > 1 else p
        x = jnp.where(x >= tp, x - tp, x)
        t //= 2
    return x


def _log2(t: int) -> int:
    return t.bit_length() - 1


def _aan_pass_lazy(slots, C, Cl, Ch, p, m: int, scale_eighth: bool):
    """8-point AAN pass over lazy inputs < m*p; outputs < max(8m, 8)*p
    (< 2p after the scale_eighth multiplies)."""
    mp = p if m == 1 else (p << _log2(m))
    mp2 = p << _log2(2 * m)
    mp4 = p << _log2(4 * m)

    def mul(x, ci):
        return _lmul(x, C[ci], Cl[ci], Ch[ci], p)

    a = slots
    tmp0 = a[0] + a[7]
    tmp7 = a[0] + mp - a[7]
    tmp1 = a[1] + a[6]
    tmp6 = a[1] + mp - a[6]
    tmp2 = a[2] + a[5]
    tmp5 = a[2] + mp - a[5]
    tmp3 = a[3] + a[4]
    tmp4 = a[3] + mp - a[4]
    tmp10 = tmp0 + tmp3  # < 4m*p
    tmp13 = tmp0 + mp2 - tmp3
    tmp11 = tmp1 + tmp2
    tmp12 = tmp1 + mp2 - tmp2
    out0 = tmp10 + tmp11  # < 8m*p
    out4 = tmp10 + mp4 - tmp11
    z1 = mul(tmp12 + tmp13, 0)  # mul input < 8m*p <= headroom
    out2 = z1 + mul(tmp13, 1)  # < 4p
    out6 = z1 + mul(tmp12, 2)
    z1 = tmp4 + tmp7  # < 4m*p
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = mul(z3 + z4, 3)
    tmp4 = mul(tmp4, 4)
    tmp5 = mul(tmp5, 5)
    tmp6 = mul(tmp6, 6)
    tmp7 = mul(tmp7, 7)
    z1 = mul(z1, 8)
    z2 = mul(z2, 9)
    z3 = mul(z3, 10)
    z4 = mul(z4, 11)
    z3 = z3 + z5  # < 4p
    z4 = z4 + z5
    out7 = tmp4 + z1 + z3  # < 8p
    out5 = tmp5 + z2 + z4
    out3 = tmp6 + z2 + z3
    out1 = tmp7 + z1 + z4
    outs = [out0, out1, out2, out3, out4, out5, out6, out7]
    if scale_eighth:
        outs = [mul(o, 12) for o in outs]  # inputs < max(8m,8)p; outs < 2p
    return outs


def _make_lazy_kernel(m: int):
    def kern(x_ref, c_ref, cl_ref, ch_ref, o_ref):
        C = [c_ref[i : i + 1, :] for i in range(N_DCT + N_YCC + 1)]
        Cl = [cl_ref[i : i + 1, :] for i in range(N_DCT + N_YCC + 1)]
        Ch = [ch_ref[i : i + 1, :] for i in range(N_DCT + N_YCC + 1)]
        p = c_ref[_P_ROW : _P_ROW + 1, :]
        x = x_ref[0]  # [3, 64, 2, chunk]
        chunk = x.shape[-1]
        rt = x[0].reshape(128, chunk)
        gt = x[1].reshape(128, chunk)
        bt = x[2].reshape(128, chunk)

        def mul(xx, i):
            return _lmul(xx, C[N_DCT + i], Cl[N_DCT + i], Ch[N_DCT + i], p)

        y = mul(rt, 0) + mul(gt, 1) + mul(bt, 2)  # < 6p
        cb = mul(rt, 3) + (p << 1) - mul(gt, 4) + mul(bt, 5)  # < 6p
        cr = mul(rt, 5) + (p << 2) - mul(gt, 6) - mul(bt, 7)  # < 6p
        # sub_plain(128) on component 0 of y only (constant < p) -> y < 7p
        sub_c0 = jnp.concatenate([C[N_DCT + N_YCC], jnp.zeros_like(C[0])],
                                 axis=0)
        y = (y.reshape(64, 2, chunk) + p[None] - sub_c0[None]).reshape(
            128, chunk)
        y = _red_to(y, p, 8, m)
        cb = _red_to(cb, p, 8, m)
        cr = _red_to(cr, p, 8, m)
        outs = []
        row_bound = 8 * m
        for ch in (y, cb, cr):
            v = ch.reshape(8, 8, 2, chunk)
            tiles = [v[:, s].reshape(16, chunk) for s in range(8)]
            rows = _aan_pass_lazy(tiles, C, Cl, Ch, p, m, scale_eighth=False)
            rows = [_red_to(r, p, row_bound, m) for r in rows]
            w = jnp.stack([r.reshape(8, 2, chunk) for r in rows], axis=1)
            tiles = [w[g].reshape(16, chunk) for g in range(8)]
            cols = _aan_pass_lazy(tiles, C, Cl, Ch, p, m, scale_eighth=True)
            cols = [_red_to(c, p, 2, 1) for c in cols]  # canonical [0, p)
            outs.append(
                jnp.stack([c.reshape(8, 2, chunk) for c in cols], axis=0)
                .reshape(64, 2, chunk)
            )
        o_ref[0] = jnp.stack(outs, axis=0)

    return kern


def _server_kernel(x_ref, c_ref, csh_ref, o_ref):
    C = [c_ref[i : i + 1, :] for i in range(N_DCT + N_YCC + 1)]
    Csh = [csh_ref[i : i + 1, :] for i in range(N_DCT + N_YCC + 1)]
    p = c_ref[_P_ROW : _P_ROW + 1, :]  # [1, chunk] per-lane modulus
    x = x_ref[0]  # [3, 64, 2, chunk]
    chunk = x.shape[-1]
    rt = x[0].reshape(128, chunk)
    gt = x[1].reshape(128, chunk)
    bt = x[2].reshape(128, chunk)
    y, cb, cr = _ycc(rt, gt, bt, C, Csh, p)
    # sub_plain(128) on component 0 of y only: component rows alternate c0,c1
    sub_c0 = jnp.concatenate([C[N_DCT + N_YCC], jnp.zeros_like(C[0])], axis=0)
    y = _submod(y.reshape(64, 2, chunk), sub_c0[None], p[None]).reshape(128, chunk)
    outs = []
    for ch in (y, cb, cr):
        v = ch.reshape(8, 8, 2, chunk)
        # row pass: slot s across all 8 groups -> [16, chunk] tiles
        tiles = [v[:, s].reshape(16, chunk) for s in range(8)]
        rows = _aan_pass(tiles, C, Csh, p, scale_eighth=False)
        # rows[s] is [8(g), 2, chunk] flattened; restore before regrouping
        w = jnp.stack([r.reshape(8, 2, chunk) for r in rows], axis=1)  # w[g, s]
        # column pass: group g across all 8 slots
        tiles = [w[g].reshape(16, chunk) for g in range(8)]
        cols = _aan_pass(tiles, C, Csh, p, scale_eighth=True)
        outs.append(
            jnp.stack([c.reshape(8, 2, chunk) for c in cols], axis=0).reshape(
                64, 2, chunk
            )
        )
    o_ref[0] = jnp.stack(outs, axis=0)


def lazy_bound_multiple(ev) -> int:
    """Row-pass input bound multiple m for the lazy kernel, or 0 when the
    primes leave under 8p of u32 headroom (use the strict kernel then)."""
    max_p = max(int(p) for p in ev.params.q_primes)
    hr = (1 << 32) // max_p
    if hr >= 16:
        return 2
    if hr >= 8:
        return 1
    return 0


def server_ycc_dct_fused(ev, x, interpret: bool = False,
                         chunk: int | None = None, lazy: bool = False):
    """x: [nb, 3, 64, 2, L, n] NTT-domain ciphertexts -> same shape/layout.

    One fused kernel invocation; the only reshapes are free contiguous
    views.  lazy=True selects the deferred-reduction kernel (bit-identical
    output; see the lazy section above for the headroom argument)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, ch, ns, comps, L, n = x.shape
    assert (ch, ns, comps) == (3, 64, 2), x.shape
    lanes = L * n
    if chunk is None:
        chunk = min(lanes, 1024)
    assert lanes % chunk == 0
    nk = lanes // chunk
    cmul, csh = pack_server_constants(ev)
    xf = x.reshape(nb, 3, 64, 2, lanes)

    if lazy:
        m = lazy_bound_multiple(ev)
        if not m:
            raise ValueError(
                "lazy kernel needs >= 8p of u32 headroom (primes < 2^29); "
                "use the strict kernel at this ring degree")
        kernel = _make_lazy_kernel(m)
        tab2, tab3 = csh & np.uint32(0xFFFF), csh >> np.uint32(16)
    else:
        kernel = _server_kernel
        tab2, tab3 = csh, None

    in_specs = [
        pl.BlockSpec((1, 3, 64, 2, chunk), lambda b, k: (b, 0, 0, 0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_ROWS, chunk), lambda b, k: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_ROWS, chunk), lambda b, k: (0, k),
                     memory_space=pltpu.VMEM),
    ]
    args = [xf, jnp.asarray(cmul), jnp.asarray(tab2)]
    if tab3 is not None:
        in_specs.append(pl.BlockSpec((_ROWS, chunk), lambda b, k: (0, k),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.asarray(tab3))

    call = pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 3, 64, 2, chunk), lambda b, k: (b, 0, 0, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, jnp.uint32),
        interpret=interpret,
    )
    out = call(*args)
    return out.reshape(x.shape)
