"""Pallas TPU kernel: fused homomorphic 8x8 DCT over a whole ciphertext
block batch.

The jnp evaluator path leaves ~670 elementwise modular ops per block to
XLA's fuser, which materializes dozens of HBM-sized intermediates; this
kernel keeps all 64 coefficient-slot ciphertexts of a block resident in
VMEM and runs the entire two-pass AAN network (fhe_image.h:206-284) per
grid step, so HBM traffic drops to one read + one write of the block.

Layout: the caller reshapes ciphertext data to ``[nb, ch, L, 8, 8, 2n]``
(slot (g, s) = coefficient 8g+s; the two ciphertext polynomials are fused
into the last axis).  The row pass is vectorized across the 8 slot groups
as ops on [8, 2n] tiles (full sublane utilization); the column pass is the
same with the group axis flipped.  Constants arrive NTT'd per limb with
Shoup companions, already poly-duplicated to 2n.

Grid: (nb, ch, L) -- one program per block x channel x RNS limb.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import modops

# constant order in the packed table (matches _dct_pass usage)
CONST_ORDER = (
    0.541196100, 0.765366865, -1.847759065, 1.175875602, 0.298631336,
    2.053119869, 3.072711026, 1.501321110, -0.899976223, -2.562915447,
    -1.961570560, -0.390180644, 0.125,
)


def pack_dct_constants(ev):
    """[L, 16, 2n] NTT'd centered constants + Shoup companions (numpy);
    13 real constants padded to 16 rows for TPU (8,128) block tiling."""
    muls, shs = [], []
    for c in CONST_ORDER:
        op = ev.encode(c)
        muls.append(np.concatenate([op.mul_ntt, op.mul_ntt], axis=-1))  # [L, 2n]
        shs.append(np.concatenate([op.mul_ntt_shoup, op.mul_ntt_shoup], axis=-1))
    mul = np.stack(muls, axis=1)  # [L, 13, 2n]
    sh = np.stack(shs, axis=1)
    pad = ((0, 0), (0, 16 - len(CONST_ORDER)), (0, 0))
    return np.pad(mul, pad), np.pad(sh, pad)


def _addmod(a, b, p):
    # compare+select, NOT min(r, r-p): Mosaic cannot legalize vector
    # arith.minui (see modops.reduce_once)
    r = a + b
    return jnp.where(r >= p, r - p, r)


def _submod(a, b, p):
    r = a + p - b
    return jnp.where(r >= p, r - p, r)


def _shoup(x, w, ws, p):
    # mulhi via 16-bit split (no 64-bit ints on TPU)
    q = modops.mulhi32(x, ws)
    r = x * w - q * p
    return jnp.where(r >= p, r - p, r)


def _aan_pass(slots, C, Csh, p, scale_eighth: bool):
    """One 8-point AAN pass over a list of 8 [8, 2n] tiles; returns 8."""

    def mul(x, ci):
        return _shoup(x, C[ci], Csh[ci], p)

    a = slots
    tmp0 = _addmod(a[0], a[7], p)
    tmp7 = _submod(a[0], a[7], p)
    tmp1 = _addmod(a[1], a[6], p)
    tmp6 = _submod(a[1], a[6], p)
    tmp2 = _addmod(a[2], a[5], p)
    tmp5 = _submod(a[2], a[5], p)
    tmp3 = _addmod(a[3], a[4], p)
    tmp4 = _submod(a[3], a[4], p)
    tmp10 = _addmod(tmp0, tmp3, p)
    tmp13 = _submod(tmp0, tmp3, p)
    tmp11 = _addmod(tmp1, tmp2, p)
    tmp12 = _submod(tmp1, tmp2, p)
    out0 = _addmod(tmp10, tmp11, p)
    out4 = _submod(tmp10, tmp11, p)
    z1 = mul(_addmod(tmp12, tmp13, p), 0)
    out2 = _addmod(z1, mul(tmp13, 1), p)
    out6 = _addmod(z1, mul(tmp12, 2), p)
    z1 = _addmod(tmp4, tmp7, p)
    z2 = _addmod(tmp5, tmp6, p)
    z3 = _addmod(tmp4, tmp6, p)
    z4 = _addmod(tmp5, tmp7, p)
    z5 = mul(_addmod(z3, z4, p), 3)
    tmp4 = mul(tmp4, 4)
    tmp5 = mul(tmp5, 5)
    tmp6 = mul(tmp6, 6)
    tmp7 = mul(tmp7, 7)
    z1 = mul(z1, 8)
    z2 = mul(z2, 9)
    z3 = mul(z3, 10)
    z4 = mul(z4, 11)
    z3 = _addmod(z3, z5, p)
    z4 = _addmod(z4, z5, p)
    out7 = _addmod(_addmod(tmp4, z1, p), z3, p)
    out5 = _addmod(_addmod(tmp5, z2, p), z4, p)
    out3 = _addmod(_addmod(tmp6, z2, p), z3, p)
    out1 = _addmod(_addmod(tmp7, z1, p), z4, p)
    outs = [out0, out1, out2, out3, out4, out5, out6, out7]
    if scale_eighth:
        outs = [_shoup(o, C[12], Csh[12], p) for o in outs]
    return outs


def dct8x8_pallas(ev, x, interpret: bool = False):
    """x: [nb, ch, 64, 2, L, n] NTT-domain ciphertext slots -> same shape.

    Reshapes into the kernel layout, runs the fused kernel, restores."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, ch, _, _, L, n = x.shape
    two_n = 2 * n
    # chunk the pointwise 2n axis so the unrolled network's VMEM-resident
    # temporaries (~60 live [8, chunk] tiles) stay well under the 16MB limit
    chunk = min(two_n, 2048)
    nk = two_n // chunk
    # [nb, ch, 64, 2, L, n] -> [nb, ch, L, 8, 8, 2n]
    xk = x.transpose(0, 1, 4, 2, 3, 5).reshape(nb, ch, L, 8, 8, two_n)
    cmul, csh = pack_dct_constants(ev)
    kernel_p = jnp.asarray(np.ascontiguousarray(ev.params.consts.qp.reshape(-1)))

    call = pl.pallas_call(
        _dct_kernel_limb,
        grid=(nb, ch, L, nk),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 8, 8, chunk),
                         lambda b, c, l, k: (b, c, l, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, chunk), lambda b, c, l, k: (l, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, chunk), lambda b, c, l, k: (l, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [L] scalars
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 8, 8, chunk),
                               lambda b, c, l, k: (b, c, l, 0, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xk.shape, jnp.uint32),
        interpret=interpret,
    )
    out = call(xk, jnp.asarray(cmul), jnp.asarray(csh), kernel_p)
    return out.reshape(nb, ch, L, 64, 2, n).transpose(0, 1, 3, 4, 2, 5)


def _dct_kernel_limb(x_ref, c_ref, csh_ref, p_ref, o_ref):
    from jax.experimental import pallas as pl

    p = p_ref[pl.program_id(2)]
    C = [c_ref[0, i : i + 1, :] for i in range(13)]  # [1, 2n], broadcasts
    Csh = [csh_ref[0, i : i + 1, :] for i in range(13)]
    x = x_ref[0, 0, 0]  # [8, 8, 2n]
    cols_in = [x[:, j, :] for j in range(8)]
    rows_out = _aan_pass(cols_in, C, Csh, p, scale_eighth=False)
    y = jnp.stack(rows_out, axis=1)  # [8(g), 8(s), 2n]
    rows_in = [y[k, :, :] for k in range(8)]
    cols_out = _aan_pass(rows_in, C, Csh, p, scale_eighth=True)
    o_ref[0, 0, 0] = jnp.stack(cols_out, axis=0)
