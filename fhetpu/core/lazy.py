"""Lazy-reduction modular arithmetic for deep elementwise networks.

The canonical ops in ``modops`` reduce to [0, p) after every step (3 vector
ops per add/sub, +1 conditional subtract per Shoup multiply).  For a fixed
linear network like the homomorphic DCT we can do much better: RNS primes
are < 2^30 (27-28 bits for n<=8192), so a uint32 lane has headroom for
values up to M*p where M = 2^(32 - bitlen(p)).  We track the static bound
multiple ``m`` (value < m*p) through the network at trace time and only
emit conditional subtracts when a bound would overflow -- a Harvey-style
lazy NTT discipline applied to the whole DCT dataflow.

Key facts used (p < 2^30, beta = 2^32):

* add: a < m1*p, b < m2*p  ->  a+b < (m1+m2)*p; exact while (m1+m2)*p < beta.
* sub: a - b  ==  a + (m2*p - b), bound (m1+m2)*p.
* Shoup multiply by constant w < p with companion w' = floor(w*beta/p):
  for ANY x < m*p with m*p <= beta, r = x*w - hi(x*w')*p satisfies
  0 <= r < p*(1 + x*p/beta) <= 2p.  So lazy inputs need no pre-reduction
  and the product is bound-2 without a final correction.
* reduction: one conditional subtract of k*p halves the bound (3 vector
  ops); full canonicalization from m needs ceil(log2(m)) subtracts.

All ops are elementwise over ``[..., L, n]`` against ``p`` shaped [L, 1];
bounds are *static* Python ints (trace-time), so jit sees pure array code.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from . import modops


@dataclass
class Lazy:
    """A lazily-reduced residue array: ``v < m * p`` elementwise."""

    v: jnp.ndarray
    m: int  # static bound multiple


class LazyOps:
    """Bound-tracked ops for a fixed prime set.

    ``p``: [L, 1] uint32 (broadcast against [..., L, n] data).
    ``max_mult``: largest safe multiple M = 2^(32 - max bitlen(p)).
    """

    def __init__(self, p, max_prime_bits: int):
        self.p = p
        assert max_prime_bits <= 30
        self.M = 1 << (32 - max_prime_bits)

    # -- bound management ---------------------------------------------------

    def _csub(self, v, k: int):
        kp = self.p * jnp.uint32(k)
        return jnp.where(v >= kp, v - kp, v)

    def reduce_to(self, x: Lazy, target: int) -> Lazy:
        """Emit conditional subtracts until x.m <= target (power-of-2 steps)."""
        v, m = x.v, x.m
        while m > target:
            # subtracting ceil(m/2)*p maps [0, m*p) -> [0, ceil(m/2)*p)
            half = (m + 1) // 2
            v = self._csub(v, half)
            m = half
        return Lazy(v, m)

    def canon(self, x: Lazy) -> jnp.ndarray:
        return self.reduce_to(x, 1).v

    def _fit(self, a: Lazy, b: Lazy) -> tuple:
        """Pre-reduce operands so a.m + b.m <= M (cheapest-first)."""
        M = self.M
        while a.m + b.m > M:
            if a.m >= b.m:
                a = self.reduce_to(a, max(1, a.m // 2))
            else:
                b = self.reduce_to(b, max(1, b.m // 2))
        return a, b

    # -- arithmetic ----------------------------------------------------------

    def add(self, a: Lazy, b: Lazy) -> Lazy:
        a, b = self._fit(a, b)
        return Lazy(a.v + b.v, a.m + b.m)

    def sub(self, a: Lazy, b: Lazy) -> Lazy:
        """a - b mod p as a + (b.m*p - b.v)."""
        a, b = self._fit(a, b)
        comp = self.p * jnp.uint32(b.m) - b.v
        return Lazy(a.v + comp, a.m + b.m)

    def mul_shoup(self, x: Lazy, w, w_shoup) -> Lazy:
        """x * w mod p, w a prepared constant < p; lazy in, bound-2 out."""
        if x.m > self.M:  # cannot happen via add/sub, but be safe
            x = self.reduce_to(x, self.M)
        q = modops.mulhi32(x.v, w_shoup)
        return Lazy(x.v * w - q * self.p, 2)
