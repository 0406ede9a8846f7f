"""Homomorphic JPEG encode pipeline (TPU-native rebuild of SURVEY.md C3/C5/
C4 + the C14/C15 drivers' compute).

The reference processes one 8x8 block at a time with one SEAL ciphertext per
coefficient (server_jpeg.cpp:109-136).  Here a whole batch of blocks is a
single ciphertext array [nblocks, 2, L, n] per coefficient slot, every op is
batched elementwise modular arithmetic, and the entire linear pipeline stays
in the NTT (evaluation) domain -- zero NTTs in the hot loop.

Faithful op-for-op ports (same constants, same op order, so the decrypted
output is bit-identical to the reference's SEAL computation at identical
parameters):
 * rgb_to_ycc:   fhe_image.h:307-325
 * dct8x8:       fhe_image.h:192-288 (AAN network, row pass then col pass,
                 /8 scaling via multiply_plain(0.125))
 * quantize:     fhe_image.h:290-305 (defined-but-never-called in the
                 reference; we expose it behind a flag, default off to match)
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..bfv.evaluator import Ct, Evaluator

# AAN rotation constants, exactly as multiplied in the reference network
_C0541 = 0.541196100
_C0765 = 0.765366865
_CN1847 = -1.847759065
_C1175 = 1.175875602
_C0298 = 0.298631336
_C2053 = 2.053119869
_C3072 = 3.072711026
_C1501 = 1.501321110
_CN0899 = -0.899976223
_CN2562 = -2.562915447
_CN1961 = -1.961570560
_CN0390 = -0.390180644


def rgb_to_ycc(ev: Evaluator, r: Ct, g: Ct, b: Ct):
    """In-place color transform on batched pixel ciphertexts (NTT form).

    y  =  .299 r + .587 g + .114 b - 128
    cb = -.168736 r - .331264 g + .5 b
    cr =  .5 r - .418688 g - .081312 b
    """
    y = ev.lincomb([(r, ev.encode(0.299)), (g, ev.encode(0.587)), (b, ev.encode(0.114))])
    y = ev.sub_plain(y, ev.encode(128.0))
    cb = ev.sub(
        ev.multiply_plain(r, ev.encode(-0.168736)),
        ev.multiply_plain(g, ev.encode(0.331264)),
    )
    cb = ev.add(cb, ev.multiply_plain(b, ev.encode(0.5)))
    cr = ev.sub(
        ev.multiply_plain(r, ev.encode(0.5)), ev.multiply_plain(g, ev.encode(0.418688))
    )
    cr = ev.sub(cr, ev.multiply_plain(b, ev.encode(0.081312)))
    return y, cb, cr


def _dct_pass(ev: Evaluator, s: List[Ct], idx: Sequence[int], scale_eighth: bool):
    """One 8-point AAN pass over slots s[idx[0..7]], in place."""
    e = ev.encode
    a = [s[i] for i in idx]
    tmp0 = ev.add(a[0], a[7])
    tmp7 = ev.sub(a[0], a[7])
    tmp1 = ev.add(a[1], a[6])
    tmp6 = ev.sub(a[1], a[6])
    tmp2 = ev.add(a[2], a[5])
    tmp5 = ev.sub(a[2], a[5])
    tmp3 = ev.add(a[3], a[4])
    tmp4 = ev.sub(a[3], a[4])
    tmp10 = ev.add(tmp0, tmp3)
    tmp13 = ev.sub(tmp0, tmp3)
    tmp11 = ev.add(tmp1, tmp2)
    tmp12 = ev.sub(tmp1, tmp2)
    out0 = ev.add(tmp10, tmp11)
    out4 = ev.sub(tmp10, tmp11)
    z1 = ev.multiply_plain(ev.add(tmp12, tmp13), e(_C0541))
    out2 = ev.add(z1, ev.multiply_plain(tmp13, e(_C0765)))
    out6 = ev.add(z1, ev.multiply_plain(tmp12, e(_CN1847)))
    z1 = ev.add(tmp4, tmp7)
    z2 = ev.add(tmp5, tmp6)
    z3 = ev.add(tmp4, tmp6)
    z4 = ev.add(tmp5, tmp7)
    z5 = ev.multiply_plain(ev.add(z3, z4), e(_C1175))
    tmp4 = ev.multiply_plain(tmp4, e(_C0298))
    tmp5 = ev.multiply_plain(tmp5, e(_C2053))
    tmp6 = ev.multiply_plain(tmp6, e(_C3072))
    tmp7 = ev.multiply_plain(tmp7, e(_C1501))
    z1 = ev.multiply_plain(z1, e(_CN0899))
    z2 = ev.multiply_plain(z2, e(_CN2562))
    z3 = ev.multiply_plain(z3, e(_CN1961))
    z4 = ev.multiply_plain(z4, e(_CN0390))
    z3 = ev.add(z3, z5)
    z4 = ev.add(z4, z5)
    out7 = ev.add(ev.add(tmp4, z1), z3)
    out5 = ev.add(ev.add(tmp5, z2), z4)
    out3 = ev.add(ev.add(tmp6, z2), z3)
    out1 = ev.add(ev.add(tmp7, z1), z4)
    outs = [out0, out1, out2, out3, out4, out5, out6, out7]
    if scale_eighth:
        eighth = e(0.125)
        outs = [ev.multiply_plain(o, eighth) for o in outs]
    for i, o in zip(idx, outs):
        s[i] = o


def dct8x8(ev: Evaluator, slots: List[Ct]) -> List[Ct]:
    """Forward 2-D DCT over 64 coefficient-slot ciphertext batches.

    Row pass (no scaling) then column pass (x 0.125), exactly the reference
    network fhe_image.h:206-284.  Each slot is a Ct batched over blocks.
    """
    s = list(slots)
    for c in range(8):
        _dct_pass(ev, s, range(8 * c, 8 * c + 8), scale_eighth=False)
    for c in range(8):
        _dct_pass(ev, s, range(c, 64, 8), scale_eighth=True)
    return s


def quantize(ev: Evaluator, slots: List[Ct], quant: np.ndarray) -> List[Ct]:
    """multiply_plain(1/quant[i]) per slot (fhe_image.h:290-305)."""
    return [
        ev.multiply_plain(ct, ev.encode(1.0 / float(quant[i])))
        for i, ct in enumerate(slots)
    ]


def server_compute_fn(
    ev: Evaluator,
    apply_quantize: bool = False,
    quant: Optional[np.ndarray] = None,
    input_ntt: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    output_ntt: bool = False,
    use_fast: Optional[bool] = None,
    use_fused: bool = False,
    fused_chunk: Optional[int] = None,
    fused_lazy: bool = False,
):
    """Build the jittable server op: [nb, 3, 64, 2, L, n] -> same shape.

    Input: RGB coefficient-slot ciphertexts in coefficient domain (as
    deserialized from the client stream).  Output: Y/Cb/Cr DCT coefficients
    back in coefficient domain, ready for serialization to the client.

    input_ntt/output_ntt: the TPU-native protocol keeps ciphertext streams
    in the NTT evaluation domain end-to-end (the client transforms with the
    fast native host NTT; SEAL 2.3's transform_to_ntt semantics), removing
    the per-chunk NTT passes -- the whole server op is then elementwise.

    use_pallas: run the DCT as the fused VMEM-resident TPU kernel
    (core.pallas_dct) instead of the XLA elementwise graph -- bit-identical
    output, one HBM read+write per block instead of dozens.

    use_fast: lazy-reduction + folded-constant fused network
    (pipelines.jpeg_fast) -- also bit-identical, but measured SLOWER than
    the XLA graph on real TPU (32.4 vs 18.2 ms at n=4096/nb=16: the lazy
    bound-tracking emits mid-network conditional subtracts once bounds hit
    the 2^(32-28) headroom and defeats XLA's elementwise fusion), so it is
    OFF by default; kept as an option for parameter sets with more headroom.

    use_fused: the single-Pallas-kernel YCC+DCT (core/pallas_server.py) is
    the measured winner on real TPU v5e: 8.5 ms vs 16.6 ms for the XLA
    elementwise graph at n=4096/nb=16 (committed artifact:
    bench_details.json, round 2).  It requires compiled Pallas, i.e. a real
    TPU; off-TPU callers use the XLA graph.
    """
    if use_fast is None:
        use_fast = False

    def fn(cts: jnp.ndarray) -> jnp.ndarray:
        nb = cts.shape[0]
        x = Ct(cts, input_ntt)
        x = ev.transform_to_ntt(x)
        d = x.data  # [nb, 3, 64, 2, L, n]
        if use_fused and not apply_quantize:
            from ..core.pallas_server import server_ycc_dct_fused

            out = server_ycc_dct_fused(ev, d, interpret=pallas_interpret,
                                       chunk=fused_chunk, lazy=fused_lazy)
            if output_ntt:
                return out
            return ev.transform_from_ntt(Ct(out, True)).data
        if use_fast and not use_pallas:
            from .jpeg_fast import server_ycc_dct_fast

            out = server_ycc_dct_fast(ev, d, apply_quantize, quant)
            if output_ntt:
                return out
            return ev.transform_from_ntt(Ct(out, True)).data
        # --- per-pixel color transform, batched over nb*64 ---
        r = Ct(d[:, 0], True)
        g = Ct(d[:, 1], True)
        b = Ct(d[:, 2], True)
        y, cb, cr = rgb_to_ycc(ev, r, g, b)
        ycc = jnp.stack([y.data, cb.data, cr.data], axis=1)
        # --- per-channel DCT over the 64 slots ---
        if use_pallas:
            from ..core.pallas_dct import dct8x8_pallas

            out = dct8x8_pallas(ev, ycc, interpret=pallas_interpret)
            if apply_quantize:
                out_slots = [
                    ev.multiply_plain(Ct(out[:, :, k], True),
                                      ev.encode(1.0 / float(quant[k])))
                    for k in range(64)
                ]
                out = jnp.stack([s.data for s in out_slots], axis=2)
        else:
            out_ch = []
            for c in range(3):
                slots = [Ct(ycc[:, c, k], True) for k in range(64)]
                slots = dct8x8(ev, slots)
                if apply_quantize:
                    slots = quantize(ev, slots, quant)
                out_ch.append(jnp.stack([s.data for s in slots], axis=1))
            out = jnp.stack(out_ch, axis=1)  # [nb, 3, 64, 2, L, n]
        if output_ntt:
            return out
        return ev.transform_from_ntt(Ct(out, True)).data

    return fn


def make_server(ev: Evaluator, apply_quantize: bool = False, quant=None,
                use_pallas: Optional[bool] = None,
                use_fused: Optional[bool] = None):
    """jitted end-to-end server compute (donates its input buffer).

    Default kernel selection (measured on real TPU v5e, bench_details.json):
    the fused single-Pallas-kernel YCC+DCT wins (8.5 ms vs 16.6 ms for the
    XLA elementwise graph at n=4096/nb=16), so it is the default on TPU.
    Off-TPU (CPU tests, virtual meshes) Pallas compiled mode is unavailable
    and the XLA graph is used.  Quantize-enabled runs also use the XLA
    graph (the fused kernel covers the reference default, quantize off)."""
    if use_fused is None:
        use_fused = (jax.default_backend() == "tpu") and not apply_quantize
    if use_pallas is None:
        use_pallas = False
    fn = server_compute_fn(ev, apply_quantize, quant, use_pallas=use_pallas,
                           use_fused=use_fused)
    return jax.jit(fn, donate_argnums=(0,))
