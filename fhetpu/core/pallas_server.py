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


def server_ycc_dct_fused(ev, x, interpret: bool = False, chunk: int | None = None):
    """x: [nb, 3, 64, 2, L, n] NTT-domain ciphertexts -> same shape/layout.

    One fused kernel invocation; the only reshapes are free contiguous views."""
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

    call = pl.pallas_call(
        _server_kernel,
        grid=(nb, nk),
        in_specs=[
            pl.BlockSpec((1, 3, 64, 2, chunk), lambda b, k: (b, 0, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, chunk), lambda b, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, chunk), lambda b, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, 64, 2, chunk), lambda b, k: (b, 0, 0, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xf.shape, jnp.uint32),
        interpret=interpret,
    )
    out = call(xf, jnp.asarray(cmul), jnp.asarray(csh))
    return out.reshape(x.shape)
