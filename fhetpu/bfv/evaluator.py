"""Device-side BFV evaluator: jitted functional ops over ciphertext arrays.

TPU-native analog of SEAL 2.3's Evaluator (SURVEY.md C1): every op is a pure
function over batched RNS ciphertext arrays ``uint32[..., size, L, n]``,
trace-compatible with jax.jit/shard_map.  The linear image pipelines (YCC,
DCT, quantize -- reference fhe_image.h:192-325) run entirely in the NTT
(evaluation) domain, so their hot loop is pure elementwise modular
arithmetic with **no NTT at all**: add/sub are lazy-free modular adds, and
multiply_plain is a Shoup pointwise multiply by the cached NTT of the
encoded constant.

Ciphertext-by-ciphertext multiplication (needed by the resize/decode
pipelines, fhe_resize.h:174-183, fhe_decode.h:59-110) lives in rns.py
(BEHZ algorithm) and is re-exported here.

A ``Ct`` is a thin pytree: (data, ntt_form flag as python bool static).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import modops, ntt
from .encoder import FractionalEncoder, Plaintext
from .params import BfvParams
from .crypto import centered_lift_plain


@jax.tree_util.register_pytree_node_class
@dataclass
class Ct:
    """Batched ciphertext: data uint32[..., size, L, n]; ntt_form static."""

    data: jnp.ndarray
    ntt_form: bool = False

    @property
    def size(self) -> int:
        return self.data.shape[-3]

    def tree_flatten(self):
        return (self.data,), (self.ntt_form,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


class PlainOperand:
    """A plaintext constant prepared for device ops against NTT-form cts.

    mul_*: NTT(centered_lift(m)) with Shoup companions -- for multiply_plain.
    add_*: NTT(Delta * centered_lift(m)) -- for add_plain/sub_plain.
    """

    def __init__(self, params: BfvParams, coeffs_mod_t: np.ndarray):
        t = params.tables_q
        consts = params.consts
        p64 = t.p.astype(np.uint64)
        lifted = centered_lift_plain(coeffs_mod_t, params)  # [L, n]
        m_ntt = ntt.np_ntt(lifted, t)
        # NB: tables stay numpy -- jnp constants created inside a jit trace
        # become trace-local tracers, and operands are cached across traces
        self.mul_ntt = m_ntt
        self.mul_ntt_shoup = modops.shoup(m_ntt, p64)
        dm = (
            lifted.astype(np.uint64) * consts.delta_mod_q.astype(np.uint64) % p64
        ).astype(np.uint32)
        self.add_ntt = ntt.np_ntt(dm, t)
        self.add_coeff = dm


class DeviceRelinKeys:
    """Host RelinKeys prepared for device use (keys already in NTT domain).

    ``stacked(size)`` concatenates keys[2..size-1] along the digit axis in
    component order, matching the evaluator's flattened (component, limb,
    sub-digit) digit layout -- one contraction instead of nested loops.

    Keys and the stacked cache stay NUMPY: relinearize is routinely traced
    under jax.jit, and caching a jnp array first built inside a trace would
    cache a trace-local tracer (the bench_core round-3 failure mode);
    numpy constants embed safely into any trace.
    """

    def __init__(self, host_rk):
        self.keys = {k: np.ascontiguousarray(v)
                     for k, v in host_rk.keys.items()}
        self.digit_bits = int(getattr(host_rk, "digit_bits", 0) or 0)
        # digits per limb, derived from the key shape (keys[k]: [L*D, 2, L, n])
        any_key = next(iter(self.keys.values()))
        self.n_subdigits = any_key.shape[0] // any_key.shape[2]
        self._stacked_cache: dict = {}

    def stacked(self, size: int) -> np.ndarray:
        if size not in self._stacked_cache:
            self._stacked_cache[size] = np.concatenate(
                [self.keys[k] for k in range(2, size)], axis=0
            )
        return self._stacked_cache[size]


class Evaluator:
    """Holds per-params device constants; all methods are pure & jittable."""

    def __init__(self, params: BfvParams, encoder: Optional[FractionalEncoder] = None):
        self.params = params
        self.encoder = encoder or FractionalEncoder(params.t, params.n)
        c = params.consts
        self.p = jnp.asarray(c.qp)  # [L,1]
        self.mu = jnp.asarray(c.qmu)
        self.shift = jnp.asarray(c.qshift)
        self.tables_q = params.tables_q
        self._plain_cache: dict = {}

    # ----- plaintext operand preparation (host, cached) ------------------

    def encode(self, value: float) -> PlainOperand:
        key = float(value)
        if key not in self._plain_cache:
            self._plain_cache[key] = PlainOperand(
                self.params, self.encoder.encode(value).coeffs
            )
        return self._plain_cache[key]

    def operand(self, plain: Plaintext) -> PlainOperand:
        return PlainOperand(self.params, plain.coeffs)

    # ----- domain transforms ---------------------------------------------

    def transform_to_ntt(self, ct: Ct) -> Ct:
        if ct.ntt_form:
            return ct
        return Ct(ntt.ntt(ct.data, self.tables_q), True)

    def transform_from_ntt(self, ct: Ct) -> Ct:
        if not ct.ntt_form:
            return ct
        return Ct(ntt.intt(ct.data, self.tables_q), False)

    # ----- linear ops (domain-agnostic elementwise) ----------------------

    def _align(self, a: Ct, b: Ct):
        assert a.ntt_form == b.ntt_form, "mixed-domain ct/ct op"
        sa, sb = a.size, b.size
        if sa == sb:
            return a.data, b.data
        size = max(sa, sb)
        pad = lambda d, s: jnp.concatenate(
            [d, jnp.zeros(d.shape[:-3] + (size - s,) + d.shape[-2:], d.dtype)],
            axis=-3,
        ) if s < size else d
        return pad(a.data, sa), pad(b.data, sb)

    def add(self, a: Ct, b: Ct) -> Ct:
        da, db = self._align(a, b)
        return Ct(modops.addmod(da, db, self.p), a.ntt_form)

    def sub(self, a: Ct, b: Ct) -> Ct:
        da, db = self._align(a, b)
        return Ct(modops.submod(da, db, self.p), a.ntt_form)

    def negate(self, a: Ct) -> Ct:
        return Ct(modops.negmod(a.data, self.p), a.ntt_form)

    def add_plain(self, a: Ct, op: PlainOperand) -> Ct:
        dm = op.add_ntt if a.ntt_form else op.add_coeff
        c0 = modops.addmod(a.data[..., 0, :, :], dm, self.p)
        return Ct(a.data.at[..., 0, :, :].set(c0), a.ntt_form)

    def sub_plain(self, a: Ct, op: PlainOperand) -> Ct:
        dm = op.add_ntt if a.ntt_form else op.add_coeff
        c0 = modops.submod(a.data[..., 0, :, :], dm, self.p)
        return Ct(a.data.at[..., 0, :, :].set(c0), a.ntt_form)

    def multiply_plain(self, a: Ct, op: PlainOperand) -> Ct:
        """Pointwise product with the cached NTT of the constant.  NTT-form
        cts multiply directly; coefficient-form cts bounce through the NTT
        (SEAL's Evaluator::multiply_plain does the same internally)."""
        if a.ntt_form:
            return Ct(
                modops.mulmod_shoup(a.data, op.mul_ntt, op.mul_ntt_shoup, self.p),
                True,
            )
        d = ntt.ntt(a.data, self.tables_q)
        d = modops.mulmod_shoup(d, op.mul_ntt, op.mul_ntt_shoup, self.p)
        return Ct(ntt.intt(d, self.tables_q), False)

    # ----- ciphertext-by-ciphertext multiplication (BEHZ) -----------------

    @property
    def _rns_tool(self):
        from . import rns

        if not hasattr(self, "_rns_tool_inst"):
            self._rns_tool_inst = rns.RnsTool(self.params)
        return self._rns_tool_inst

    def multiply(self, a: Ct, b: Ct) -> Ct:
        """FV multiply; sizes compose (k1, k2) -> k1+k2-1; coeff-form result.

        Matches SEAL 2.3 Evaluator::multiply semantics incl. unrelinearized
        size growth (the reference's Cubic builds size-5 cts, SURVEY.md C9).
        """
        from . import rns

        da = self.transform_from_ntt(a).data
        db = self.transform_from_ntt(b).data
        return Ct(rns.multiply(da, db, self.params, self._rns_tool), False)

    def square(self, a: Ct) -> Ct:
        return self.multiply(a, a)

    def relinearize(self, a: Ct, rk) -> Ct:
        """Key-switch every component of degree >= 2 down to (c0, c1).

        rk: DeviceRelinKeys.  Digit decomposition is fully batched: every
        (component k, limb i, sub-digit d) digit polynomial is built at
        once, pushed through ONE batched NTT, contracted against the
        stacked key tensor, and inverse-transformed once -- replacing the
        round-1 L x (size-2) sequential small-NTT loop (VERDICT.md weak 8).

        With digit_bits (dbc) set on the keys, each limb splits into D =
        ceil(bits(p)/dbc) sub-digits of 2^dbc, trading D x more key
        material and NTTs for ~bits(p)-dbc fewer bits of key-switch noise.
        """
        size = a.size
        if size <= 2:
            return a
        da = self.transform_from_ntt(a).data
        L, n = self.params.L, self.params.n
        K2 = size - 2
        dbc, D = rk.digit_bits, rk.n_subdigits
        comps = da[..., 2:, :, :]  # [..., K2, L, n]
        if dbc:
            mask = jnp.uint32((1 << dbc) - 1)
            digs = jnp.stack(
                [(comps >> jnp.uint32(d * dbc)) & mask for d in range(D)],
                axis=-2,
            )  # [..., K2, L, D, n]
        else:
            digs = comps[..., None, :]  # [..., K2, L, 1, n]
        G = K2 * L * D
        flat = digs.reshape(da.shape[:-3] + (G, 1, n))
        # reduce each digit value (< p_i or < 2^dbc) into every limb
        d_all = modops.mulmod(flat, jnp.uint32(1), self.p, self.mu, self.shift)
        d_ntt = ntt.ntt(d_all, self.tables_q)  # [..., G, L, n]
        key = rk.stacked(size)  # [G, 2, L, n] NTT domain
        t01 = modops.mulmod(
            d_ntt[..., :, None, :, :], key, self.p, self.mu, self.shift
        )  # [..., G, 2, L, n]
        acc = t01[..., 0, :, :, :]
        for g in range(1, G):
            acc = modops.addmod(acc, t01[..., g, :, :, :], self.p)
        acc = ntt.intt(acc, self.tables_q)  # [..., 2, L, n]
        c01 = modops.addmod(da[..., :2, :, :], acc, self.p)
        return Ct(c01, False)

    def add_many(self, cts) -> Ct:
        """Sum of a list of ciphertexts (SEAL Evaluator::add_many)."""
        cts = list(cts)
        acc = cts[0]
        for c in cts[1:]:
            acc = self.add(acc, c)
        return acc

    def multiply_many(self, cts, rk=None) -> Ct:
        """Product of a list of ciphertexts (SEAL Evaluator::multiply_many).

        SEAL relinearizes between multiplies (it requires evaluation keys);
        we do the same when rk is given, otherwise sizes compose
        unrelinearized like the reference's Cubic chains (fhe_resize.h:174-183).
        """
        cts = list(cts)
        acc = cts[0]
        for c in cts[1:]:
            acc = self.multiply(acc, c)
            if rk is not None:
                acc = self.relinearize(acc, rk)
        return acc

    def exponentiate(self, a: Ct, exponent: int, rk=None) -> Ct:
        """a^exponent via square-and-multiply (SEAL Evaluator::exponentiate,
        listed in SURVEY.md C1; the reference never calls it).  exponent >= 1.
        Relinearizes after each multiply when rk is given."""
        if exponent < 1:
            raise ValueError("exponentiate requires exponent >= 1 (SEAL semantics)")
        result = None
        base = a
        e = exponent
        while True:
            if e & 1:
                result = base if result is None else self.multiply(result, base)
                if rk is not None and result.size > 2:
                    result = self.relinearize(result, rk)
            e >>= 1
            if e == 0:
                break
            base = self.square(base)
            if rk is not None and base.size > 2:
                base = self.relinearize(base, rk)
        return result

    # linear-combination fusion helper for pipeline graphs
    def lincomb(self, terms) -> Ct:
        """sum_i ct_i * const_i (consts pre-encoded PlainOperands or None
        for unit coefficient); all cts NTT-form, same size."""
        acc = None
        for ct, op in terms:
            term = ct.data if op is None else modops.mulmod_shoup(
                ct.data, op.mul_ntt, op.mul_ntt_shoup, self.p
            )
            acc = term if acc is None else modops.addmod(acc, term, self.p)
        return Ct(acc, True)
