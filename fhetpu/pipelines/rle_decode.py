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
from ..core import modops

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


def _relin(ev, ct, relin):
    return ev.relinearize(ct, relin) if relin is not None and ct.size > 2 else ct


# Taylor series about the ORIGIN (used by the reworked pure-FHE step: after
# the plaintext/encrypted angle split the encrypted residual argument is
# centered near 0, not 3pi/2).
_SIN0 = {1: 1.0, 3: -1.0 / 6, 5: 1.0 / 120, 7: -1.0 / 5040, 9: 1.0 / 362880}
_COS0 = {2: -0.5, 4: 1.0 / 24, 6: -1.0 / 720, 8: 1.0 / 40320, 10: -1.0 / 3628800}


def _origin_powers(ev, x: Ct, ks, relin):
    """Minimal-depth power chains for the required exponents (relinearized
    after every ct x ct when keys are given, VERDICT.md item 5)."""
    pows = {1: x}

    def get(k):
        if k not in pows:
            if k % 2 == 0:
                pows[k] = _relin(ev, ev.square(get(k // 2)), relin)
            else:
                pows[k] = _relin(ev, ev.multiply(get(k - 1), x), relin)
        return pows[k]

    for k in ks:
        get(k)
    return pows


def taylor_sin_origin(ev: Evaluator, x: Ct, relin=None, max_power: int = 9) -> Ct:
    """sin(y) ~= y - y^3/6 + y^5/120 - y^7/5040 + y^9/362880, |y| <~ pi.

    max_power truncates the chain: error <= |y|^(max_power+2)/(max_power+2)!,
    so max_power=5 already gives <2e-5 for |y| <= 0.7 at a THIRD of the
    multiplicative depth -- essential without relinearization, where size
    (and noise) grows with every retained power."""
    ks = [k for k in sorted(_SIN0) if k <= max_power]
    pows = _origin_powers(ev, x, ks, relin)
    acc = None
    for k in ks:
        c = _SIN0[k]
        term = pows[k] if c == 1.0 else ev.multiply_plain(pows[k], ev.encode(c))
        term = ev.transform_from_ntt(term)
        acc = term if acc is None else ev.add(acc, term)
    return acc


def taylor_cos_origin(ev: Evaluator, x: Ct, relin=None, max_power: int = 10) -> Ct:
    """cos(y) ~= 1 - y^2/2 + y^4/24 - ... + y^10/3628800, |y| <~ pi."""
    ks = [k for k in sorted(_COS0) if k <= max_power]
    pows = _origin_powers(ev, x, ks, relin)
    acc = None
    for k in ks:
        term = ev.transform_from_ntt(ev.multiply_plain(pows[k], ev.encode(_COS0[k])))
        acc = term if acc is None else ev.add(acc, term)
    return ev.add_plain(acc, ev.encode(1.0))


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
    taylor_max_power: Optional[int] = None,
) -> Ct:
    """Pure-FHE Fourier step, batched over output positions.

    run[i] = amp * [ b/order + sum_{j=1..degree} (2/(j pi)) *
                     sin(j pi b / order) * cos(j pi (i + offset) / order) ]
    with b = count/2 + delta - 0.5 and offset = -(index + count/2 - 0.5)
    (fhe_decode.h:214-241; the reference's in-place corruption of offset at
    :229 is fixed).

    Round-2 rework (VERDICT.md item 5): the cosine argument splits into its
    PLAINTEXT part A = a_j*i (positions are public) and its encrypted
    residual B = a_j*offset via cos(A+B) = cos(A)cos(B) - sin(A)sin(B).
    cos(A)/sin(A) are exact doubles -- this is the exact range reduction of
    the reducible (plaintext) component -- so the homomorphic Taylor
    evaluations drop from O(P * degree) per pair to O(degree) per pair and
    no longer lose accuracy with the output position i.  The residual
    arguments a_j*offset and a_j*b are evaluated by origin-centered Taylor
    chains (relinearized when keys are given); accuracy holds while
    |a_j*offset|, |a_j*b| <~ pi, i.e. while j*(run position)/order and
    j*count/2/order stay <~ 1 -- beyond that the series diverges exactly
    like the reference's would (homomorphic range reduction of an encrypted
    argument is not possible at depth <= 3).  For unrestricted sizes use the
    client-side-trig harmonic protocol (fourier_harmonics_host /
    expand_harmonics_server below).

    taylor_max_power bounds the residual Taylor chains (default 3).  The
    binding constraint is NOT noise but PLAINTEXT DIGIT GROWTH: the
    fractional encoder has no carry propagation, so every ct x ct convolves
    digit polynomials and multiplies their magnitudes.  Measured with an
    exact encoder-domain simulation (negacyclic int convolution of the
    encoded digits, no crypto):

    * chain-product sin(x_b)*cos(y) at max_power 9, 24 frac digits:
      max |digit| ~ 1.2e16 -- overflows every expressible t < 2^30;
    * max_power 5: ~3.5e9; max_power 3 with 16 frac digits: ~4.7e9;
    * max_power 3, TEN frac digits, degree <= 2, amplitude <= ~50:
      ~4.7e6 -- fits t >= 2^24 (decode error ~0.03 from the short
      fractional encoding).

    So the Taylor pure-FHE step is only correct inside that shallow
    envelope -- for the reference's defaults (degree 12, order 64,
    amplitudes up to 255) the decrypted digits PROVABLY overflow t
    regardless of ring size, noise budget, or relinearization.  This is an
    inherent property of SEAL 2.3's carry-free FractionalEncoder, i.e. the
    reference's own (unreachable) pure-FHE overload could never have
    produced correct output.  The harmonic protocol below has no such
    limit (depth 0: one multiply_plain per term).
    """
    import jax.numpy as jnp

    mp = 3 if taylor_max_power is None else taylor_max_power

    b = ev.multiply_plain(count, ev.encode(0.5))
    offset = b if index is None else ev.add(index, b)
    offset = ev.add_plain(offset, ev.encode(-0.5))
    offset = ev.negate(offset)
    b = ev.add_plain(b, ev.encode(delta - 0.5))

    P = len(positions)

    def bcast(ct: Ct) -> Ct:
        d = jnp.broadcast_to(ct.data[None], (P,) + tuple(ct.data.shape))
        return Ct(d, ct.ntt_form)

    pos = np.asarray(positions, dtype=np.float64)
    acc = ev.transform_to_ntt(
        ev.multiply_plain(bcast(b), ev.encode(1.0 / float(order)))
    )
    for j in range(1, degree + 1):
        a_j = float(np.float32(j)) * M_PI / float(order)
        w_j = 2.0 / (M_PI * float(np.float32(j)))
        sin_b = taylor_sin_origin(
            ev, ev.multiply_plain(b, ev.encode(a_j)), relin, max_power=mp
        )
        y = ev.multiply_plain(offset, ev.encode(a_j))
        cos_o = taylor_cos_origin(ev, y, relin, max_power=mp + 1)
        sin_o = taylor_sin_origin(ev, y, relin, max_power=mp)
        pj = _relin(ev, ev.multiply(sin_b, cos_o), relin)
        qj = _relin(ev, ev.multiply(sin_b, sin_o), relin)
        # term_i = w_j * sin_b * (cos(a_j i) cos_o - sin(a_j i) sin_o)
        term = mul_plain_stacked(ev, bcast(pj), w_j * np.cos(a_j * pos))
        term = ev.add(term, mul_plain_stacked(ev, bcast(qj), -w_j * np.sin(a_j * pos)))
        acc = ev.add(acc, term)
    out = ev.multiply(acc, bcast(amplitude))
    return _relin(ev, out, relin)


def mul_plain_stacked(ev: Evaluator, ct: Ct, values: np.ndarray) -> Ct:
    """Row-wise multiply_plain: batched ct [P, ...] times encode(values[p]).
    Returns NTT form."""
    tab = _stacked_mul_table(ev, values)
    ctn = ev.transform_to_ntt(ct)
    out = modops.mulmod(ctn.data, tab[:, None], ev.p, ev.mu, ev.shift)
    return Ct(out, True)


def _stacked_mul_table(ev: Evaluator, values: np.ndarray):
    """NTT(centered_lift(encode(v))) for each v: device [P, L, n].

    The O(P*L*n*log n) forward transforms run ON DEVICE (ntt.ntt), not on
    the host -- round 2 rebuilt these tables with np_ntt inside the
    per-harmonic loop, an uncached host NTT that made the harmonic server
    host-bound (VERDICT.md round-2 weak item 5).  Tables are cached on the
    evaluator keyed by the value array so the 3 image channels (and
    repeated CLI batches) reuse them."""
    import jax.numpy as jnp

    from ..bfv.crypto import centered_lift_plain

    values = np.asarray(values, dtype=np.float64)
    cache = getattr(ev, "_stacked_tab_cache", None)
    if cache is None:
        cache = ev._stacked_tab_cache = {}
    key = (values.shape, hash(values.tobytes()))
    if key not in cache:
        from ..core import ntt as _ntt

        coeffs = ev.encoder.encode_batch(values)
        lifted = centered_lift_plain(coeffs, ev.params)
        cache[key] = _ntt.ntt(jnp.asarray(lifted), ev.params.tables_q)
    return cache[key]


# --------------------------------------------------------------------------
# Client-side-trig harmonic protocol: the PRACTICAL pure-FHE decode.
#
# The Fourier step is linear in the per-pair quantities amp*sin(a_j b)*
# cos(a_j offset) etc., and the client knows its own plaintext pairs, so it
# can evaluate the trig in exact doubles (no Taylor at all), aggregate the
# per-pair contributions into 2*degree+1 channel harmonics, and ship those
# encrypted.  The server -- with no secret key and no approximation -- just
# expands the encrypted Fourier series at every output position with
# plaintext weights: out_i = h0 + sum_j cos(a_j i) hc_j + sin(a_j i) hs_j.
# Depth 0 (multiply_plain + add only), accurate at ANY order/image size,
# and the server-side cost is O(degree * positions) independent of the pair
# count.  Semantics identical to the trusted overload (fhe_decode.h:244-282)
# regrouped by linearity, incl. its float32(j) quirk.
# --------------------------------------------------------------------------


def fourier_harmonics_host(
    pairs, order: int, degree: int, delta: float
) -> np.ndarray:
    """Aggregate per-pair Fourier contributions into channel harmonics.

    pairs: [(value, count)] plaintext RLE pairs (client side).
    Returns doubles [2*degree+1]: [h0, hc_1..hc_degree, hs_1..hs_degree].
    """
    h = np.zeros(2 * degree + 1)
    index = 0.0
    for val, cnt in pairs:
        amp = float(val)
        b = cnt / 2.0
        offset = -(index + b - 0.5)
        b += delta - 0.5
        h[0] += amp * b / float(order)
        for j in range(1, degree + 1):
            jf = float(np.float32(j))
            a_j = jf * M_PI / float(order)
            w = 2.0 / (M_PI * jf) * math.sin(a_j * b) * amp
            h[j] += w * math.cos(a_j * offset)
            h[degree + j] += -w * math.sin(a_j * offset)
        index += cnt
    return h


def _ev_cache(ev):
    cache = getattr(ev, "_stacked_tab_cache", None)
    if cache is None:
        cache = ev._stacked_tab_cache = {}
    return cache


def harmonic_weight_tables(ev: Evaluator, positions: np.ndarray, order: int,
                           degree: int):
    """Device [H, P, L, n] NTT tables of the expansion weight encodings,
    rows [1, cos(a_1 i).., cos(a_d i), sin(a_1 i).., sin(a_d i)].

    Weights are uploaded as COMPACT mod-t coefficients (uint16 when t fits)
    and centered-lifted + forward-transformed ON DEVICE -- at order-64
    reference scale the host-lifted tables would be L x 4 bytes per
    coefficient through the remote-TPU tunnel; this path ships 2.  Cached
    per (order, degree, positions) on the evaluator, shared by channels."""
    import jax.numpy as jnp

    from ..core import ntt as _ntt

    pos = np.asarray(positions, dtype=np.float64)
    key = ("harmW", order, degree, len(pos), hash(pos.tobytes()))
    cache = _ev_cache(ev)
    if key in cache:
        return cache[key]
    H = 2 * degree + 1
    W = np.ones((H, len(pos)))
    for j in range(1, degree + 1):
        a_j = float(np.float32(j)) * M_PI / float(order)
        W[j] = np.cos(a_j * pos)
        W[degree + j] = np.sin(a_j * pos)
    coeffs = ev.encoder.encode_batch(W.reshape(-1))  # [H*P, n] in [0, t)
    par = ev.params
    dt = np.uint16 if par.t <= (1 << 16) else np.uint32
    c_dev = jnp.asarray(coeffs.astype(dt)).astype(jnp.uint32)[..., None, :]
    # centered lift per limb: m >= ceil((t+1)/2) -> m - t + p_l
    thr = jnp.uint32(par.plain_upper_half_threshold)
    p_col = jnp.asarray(par.consts.qp).reshape(par.L, 1)  # [L,1]
    t_u = jnp.uint32(par.t)
    lifted = jnp.where(c_dev >= thr, c_dev - t_u + p_col, c_dev)
    tab = _ntt.ntt(lifted, par.tables_q)  # [H*P, L, n]
    tab = tab.reshape(H, len(pos), par.L, par.n)
    cache[key] = tab
    return tab


def expand_harmonics_batched(
    ev: Evaluator, harm: Ct, positions: np.ndarray, order: int, degree: int
) -> Ct:
    """One-dispatch harmonic expansion: jitted fori over the H harmonics,
    tables and harmonics as traced arguments.  Bit-identical to
    expand_harmonics_server (asserted in tests/test_decode.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    tabs = harmonic_weight_tables(ev, positions, order, degree)
    hn = ev.transform_to_ntt(harm).data  # [H, size, L, n]
    key = ("harm_fn", tabs.shape, hn.shape)
    cache = _ev_cache(ev)
    if key not in cache:
        p, mu, sh = ev.p, ev.mu, ev.shift

        def fn(tabs_, hn_):
            def body(k, acc):
                term = modops.mulmod(tabs_[k][:, None], hn_[k][None],
                                     p, mu, sh)
                return modops.addmod(acc, term, p)

            acc0 = jnp.zeros((tabs_.shape[1],) + hn_.shape[1:], jnp.uint32)
            return lax.fori_loop(0, tabs_.shape[0], body, acc0)

        cache[key] = jax.jit(fn)
    return Ct(cache[key](tabs, hn), True)


def expand_harmonics_server(
    ev: Evaluator, harm: Ct, positions: np.ndarray, order: int, degree: int
) -> Ct:
    """Expand encrypted harmonics [H=2*degree+1, size, L, n] at the given
    positions: out_i = h0 + sum_j cos(a_j i) hc_j + sin(a_j i) hs_j.
    multiply_plain + add only; returns Ct [P, size, L, n] (NTT form)."""
    import jax.numpy as jnp

    pos = np.asarray(positions, dtype=np.float64)
    P = len(pos)
    hn = ev.transform_to_ntt(harm)

    def row(k) -> Ct:
        d = jnp.broadcast_to(
            hn.data[..., k, :, :, :], (P,) + tuple(hn.data.shape[-3:])
        )
        return Ct(d, True)

    acc = row(0)
    for j in range(1, degree + 1):
        a_j = float(np.float32(j)) * M_PI / float(order)
        acc = ev.add(acc, mul_plain_stacked(ev, row(j), np.cos(a_j * pos)))
        acc = ev.add(
            acc, mul_plain_stacked(ev, row(degree + j), np.sin(a_j * pos))
        )
    return acc


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


def fourier_channel_trusted(
    amps: np.ndarray, counts: np.ndarray,
    order: int, degree: int, delta: float, positions: np.ndarray,
    pair_chunk: int = 256,
) -> np.ndarray:
    """Whole-channel trusted evaluation, vectorized over pairs x positions.

    Value-identical to summing approximated_step_trusted over all pairs
    (decode is linear, so one re-encryption of the channel sum decrypts to
    the same values as the reference's per-pair re-encrypt + ciphertext
    adds, server_decode.cpp:131-134) -- but with ONE host pass instead of a
    per-pair Python loop of decrypt/re-encrypt round trips (VERDICT.md
    round-2 weak item 5).  Chunked over pairs to bound the [k, P, degree]
    intermediate."""
    amps = np.asarray(amps, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.float64)
    pos = np.asarray(positions, dtype=np.float64)
    k = len(amps)
    index = np.concatenate([[0.0], np.cumsum(counts)[:-1]])
    b = counts / 2.0
    offset = -(index + b - 0.5)
    b = b + delta - 0.5
    jf = np.float32(np.arange(1, degree + 1)).astype(np.float64)
    af = jf * M_PI / float(order)  # [degree]
    out = np.zeros(len(pos))
    for lo in range(0, k, pair_chunk):
        hi = min(lo + pair_chunk, k)
        # cos(af_j * (i + offset_k)) : [chunk, P, degree]
        arg = af[None, None, :] * (pos[None, :, None] + offset[lo:hi, None, None])
        series = np.sin(af[None, :] * b[lo:hi, None])  # [chunk, degree]
        w = (2.0 / (M_PI * jf))[None, :] * series  # [chunk, degree]
        res = b[lo:hi, None] / float(order) + np.einsum(
            "kpj,kj->kp", np.cos(arg), w
        )
        out += amps[lo:hi] @ res
    return out


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
