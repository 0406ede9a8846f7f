"""Encrypted run-length decode: Taylor sin/cos + Fourier-series step
(SURVEY.md C11/C12, reference fhe_decode.h).

Three levels of fidelity:

* ``homomorphic_sin`` / ``homomorphic_cos``: faithful ports of the
  reference's degree-10 Taylor chains centered at 3*pi/2
  (fhe_decode.h:48-200), including their exact power-building op order
  (square/multiply chains, unrelinearized by default, optional relin).
* ``approximated_step_trusted``: the decrypt-evaluate-reencrypt overload the
  reference server actually calls (fhe_decode.h:244-282) -- requires the
  secret key, provided for behavioral parity and flagged as such.
* ``approximated_step_fhe``: the pure-FHE Fourier path with the reference's
  offset-mutation bug FIXED (fhe_decode.h:229 adds encode(i) to ``offset``
  in-place instead of to the per-position cosine argument) and batched over
  all output positions at once.  It inherits the reference's Taylor-range
  accuracy limits (documented); a Chebyshev range-reduced variant is the
  planned upgrade.

The per-pair sequential dependency index += count (server_decode.cpp:135)
is an associative prefix sum: pairs' encrypted counts are cumulatively
summed with a scan before the (independent, parallel) per-pair step
evaluations -- the TPU-native replacement for the only serial chain in the
reference.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..bfv.evaluator import Ct, Evaluator

M_PI = math.pi


def _power_chain(ev, shifted, squarings: int, extra_mults: int, relin=None):
    """(x)^(2^squarings) * x^extra_mults via the reference's op order."""
    p = shifted
    for _ in range(squarings):
        p = ev.square(p)
        if relin is not None:
            p = ev.relinearize(p, relin)
    for _ in range(extra_mults):
        p = ev.multiply(p, shifted)
        if relin is not None:
            p = ev.relinearize(p, relin)
    return p


def _taylor_3pi2(ev, x: Ct, signs, zero_order: float, relin=None) -> Ct:
    """Shared structure of homomorphic_sin/cos: shift by -3pi/2, build powers
    2,4,6,8,10 (square/multiply chains fhe_decode.h:59-110), scale by
    1/k! with the given signs, sum with the zero-order term."""
    shifted = ev.add_plain(x, ev.encode(-3 * M_PI / 2.0))
    p2 = _power_chain(ev, shifted, 1, 0, relin)
    p4 = _power_chain(ev, shifted, 2, 0, relin)
    p6 = _power_chain(ev, shifted, 2, 2, relin)
    p8 = _power_chain(ev, shifted, 3, 0, relin)
    p10 = _power_chain(ev, shifted, 3, 2, relin)
    terms = [
        ev.multiply_plain(p2, ev.encode(signs[0] * 0.5)),
        ev.multiply_plain(p4, ev.encode(signs[1] / 24.0)),
        ev.multiply_plain(p6, ev.encode(signs[2] / 720.0)),
        ev.multiply_plain(p8, ev.encode(signs[3] / 40320.0)),
        ev.multiply_plain(p10, ev.encode(signs[4] / 3628800.0)),
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = ev.add(acc, t)
    return ev.add_plain(acc, ev.encode(zero_order))


def homomorphic_sin(ev: Evaluator, x: Ct, relin=None) -> Ct:
    """sin(x) for x near 3pi/2: Taylor about 3pi/2 (fhe_decode.h:48-120):
    -1 + z^2/2 - z^4/24 + z^6/720 - z^8/40320 + z^10/3628800, z = x-3pi/2."""
    return _taylor_3pi2(ev, x, (+1, -1, +1, -1, +1), -1.0, relin)


def homomorphic_cos(ev: Evaluator, x: Ct, relin=None) -> Ct:
    """The reference's 'cos' (fhe_decode.h:123-200): despite its comment it
    ALSO shifts by -3pi/2 and applies the cos(z) series, i.e. it computes
    cos(x - 3pi/2) == -sin(x).  Ported faithfully (the pure-FHE Fourier path
    that would consume it was never reached in the reference)."""
    return _taylor_3pi2(ev, x, (-1, +1, -1, +1, -1), 1.0, relin)


def cumulative_counts(ev: Evaluator, counts: List[Ct]) -> List[Ct]:
    """Encrypted prefix sums: index_p = sum_{k<p} count_k (exclusive scan).
    Replaces the reference's serial index += count (server_decode.cpp:135)."""
    out = []
    acc = None
    for c in counts:
        out.append(acc)
        acc = c if acc is None else ev.add(acc, c)
    return out  # out[0] is None (index 0)


def approximated_step_fhe(
    ev: Evaluator,
    amplitude: Ct,
    index: Optional[Ct],
    count: Ct,
    order: int,
    degree: int,
    delta: float,
    positions: np.ndarray,
    relin=None,
) -> Ct:
    """Pure-FHE Fourier step, batched over output positions.

    run[i] = amp * [ b/order + sum_{j=1..degree} (2/(j pi)) *
                     sin(j pi b / order) * cos(j pi (i + offset) / order) ]
    with b = count/2 + delta - 0.5 and offset = -(index + count/2 - 0.5)
    (fhe_decode.h:214-241; the reference's in-place corruption of offset at
    :229 is fixed -- each position uses offset + i).

    positions: int array [P]; the result Ct is batched [P, ...] by
    broadcasting the encrypted pair scalars against per-position plaintext
    shifts.  sin/cos are the reference's Taylor approximations, so accuracy
    degrades for arguments far from 3pi/2 exactly as the reference's would.
    """
    import jax.numpy as jnp

    b = ev.multiply_plain(count, ev.encode(0.5))
    offset = b if index is None else ev.add(index, b)
    offset = ev.add_plain(offset, ev.encode(-0.5))
    offset = ev.negate(offset)
    b = ev.add_plain(b, ev.encode(delta - 0.5))

    # broadcast offset across positions: data [1, ...] -> [P, ...] via the
    # per-position plaintext adds below
    P = len(positions)

    def bcast(ct: Ct) -> Ct:
        d = jnp.broadcast_to(ct.data[None], (P,) + tuple(ct.data.shape))
        return Ct(d, ct.ntt_form)

    acc = ev.multiply_plain(bcast(b), ev.encode(1.0 / float(order)))
    for j in range(1, degree + 1):
        arg_factor = float(np.float32(j)) * M_PI / float(order)
        sin_arg = ev.multiply_plain(b, ev.encode(arg_factor))
        # per-position plaintext shift: cos_arg_i = offset + i (then scaled)
        cos_arg = _add_plain_stacked(ev, bcast(offset), positions)
        cos_arg = ev.multiply_plain(cos_arg, ev.encode(arg_factor))
        sin_f = homomorphic_sin(ev, sin_arg, relin)
        cos_f = homomorphic_cos(ev, cos_arg, relin)
        term = ev.multiply(sin_f, cos_f)
        if relin is not None:
            term = ev.relinearize(term, relin)
        term = ev.multiply_plain(term, ev.encode(2.0 / (M_PI * float(np.float32(j)))))
        acc = ev.add(acc, term)
    out = ev.multiply(acc, bcast(amplitude))
    if relin is not None:
        out = ev.relinearize(out, relin)
    return out


def _add_plain_stacked(ev: Evaluator, ct: Ct, positions) -> Ct:
    """ct (batched [P, ...]) + encode(positions[p]) per row."""
    import jax.numpy as jnp

    from ..bfv.evaluator import PlainOperand
    from ..core import modops

    ops = [PlainOperand(ev.params, ev.encoder.encode(float(i)).coeffs) for i in positions]
    if ct.ntt_form:
        tab = np.stack([o.add_ntt for o in ops])
    else:
        tab = np.stack([o.add_coeff for o in ops])
    # [P, L, n] -> [P, 1(size broadcast over comp0 only), L, n]
    c0 = modops.addmod(ct.data[..., 0, :, :], jnp.asarray(tab).reshape(
        (len(ops),) + (1,) * (ct.data.ndim - 4) + tab.shape[1:]
    ), ev.p)
    return Ct(ct.data.at[..., 0, :, :].set(c0), ct.ntt_form)


def approximated_step_trusted(
    encoder, encryptor, decryptor, amplitude, index, count,
    order: int, degree: int, delta: float, positions: np.ndarray
) -> np.ndarray:
    """The reference's decrypt-evaluate-reencrypt overload
    (fhe_decode.h:244-282): decrypt amp/index/count, evaluate the Fourier
    series in doubles, re-encrypt per position.  Requires the secret key --
    kept for behavioral parity with the reference server (which loads the
    secret key, server_jpeg.cpp:97-98), clearly labeled 'trusted'."""
    amp = encoder.decode(decryptor.decrypt(amplitude))
    ind = 0.0 if index is None else encoder.decode(decryptor.decrypt(index))
    cnt = encoder.decode(decryptor.decrypt(count))
    b = cnt / 2.0
    offset = -(ind + b - 0.5)
    b += delta - 0.5
    vals = np.zeros(len(positions))
    for pi, i in enumerate(positions):
        res = b / float(order)
        for j in range(1, degree + 1):
            arg_factor = float(np.float32(j)) * M_PI / float(order)
            res += (
                2.0 / (M_PI * float(np.float32(j)))
                * math.cos(arg_factor * (i + offset))
                * math.sin(arg_factor * b)
            )
        vals[pi] = res * amp
    return encryptor.encrypt_batch(encoder.encode_batch(vals))
