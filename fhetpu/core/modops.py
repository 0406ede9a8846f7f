"""32-bit-limb modular arithmetic for TPU (JAX/XLA) and host (NumPy).

The TPU has no 64-bit integer multiply, so all mod-p arithmetic (p < 2^30)
is built from 32-bit ops with 16-bit limb decomposition:

* ``mul32`` -- full 32x32 -> 64 product as (hi, lo) uint32 pair (5 multiplies).
* ``mulmod`` -- Barrett reduction with per-prime precomputed (mu, shift):
  shift s = bitlen(p)-1, mu = floor(2^(32+s)/p) < 2^32.  For x = a*b < p^2,
  q_hat = mulhi(x >> s, mu) satisfies Q-3 <= q_hat <= Q, so the remainder
  r = x - q_hat*p < 4p < 2^32 needs two conditional subtractions.
* ``mulmod_shoup`` -- Shoup multiplication by a *precomputed* constant w with
  companion w_shoup = floor(w*2^32/p): one mulhi + two low multiplies, r < 2p.

These are the speed-of-light primitives behind every evaluator op and the
NTT butterflies (role of SEAL's ``small_modulus`` arithmetic in the
reference's backend, see SURVEY.md C1).

Conventions: values are canonical in [0, p).  Prime parameter arrays are
shaped to broadcast against data laid out as ``[..., L, n]`` (limb axis
second-to-last): pass ``p`` etc. with shape ``[L, 1]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MASK16 = 0xFFFF
U32 = jnp.uint32


def barrett_params(primes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-prime (p, mu, shift) arrays, shaped [L, 1] for broadcasting."""
    ps = np.asarray(primes, dtype=np.uint64)
    # NB: compute in Python ints -- NEP-50 numpy scalars would wrap the shift
    shifts_i = [int(p).bit_length() - 1 for p in primes]
    shifts = np.array(shifts_i, dtype=np.uint32)
    mus = np.array(
        [(1 << (32 + s)) // int(p) for p, s in zip(primes, shifts_i)], dtype=np.uint32
    )
    if any(int(p) >= (1 << 30) for p in primes):
        raise ValueError("primes must be < 2^30 for 32-bit Barrett reduction")
    return (
        ps.astype(np.uint32).reshape(-1, 1),
        mus.reshape(-1, 1),
        shifts.reshape(-1, 1),
    )


def shoup(w, p):
    """Shoup companion floor(w * 2^32 / p) for constant-operand multiplication."""
    w = np.asarray(w, dtype=np.uint64)
    p = np.asarray(p, dtype=np.uint64)
    return ((w << np.uint64(32)) // p).astype(np.uint32)


def mul32(a, b):
    """Full 32x32->64 unsigned product as (hi, lo) uint32 arrays."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    lo_lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    mid = (lo_lo >> 16) + (m1 & _MASK16) + (m2 & _MASK16)
    hi = a1 * b1 + (m1 >> 16) + (m2 >> 16) + (mid >> 16)
    lo = a * b  # native wrapping multiply gives the low 32 bits
    return hi, lo


def mulhi32(a, b):
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    mid = ((a0 * b0) >> 16) + ((a1 * b0) & _MASK16) + ((a0 * b1) & _MASK16)
    return a1 * b1 + ((a1 * b0) >> 16) + ((a0 * b1) >> 16) + (mid >> 16)


def reduce_once(r, p):
    """Conditional subtract for uint32 r in [0, 2p): canonical
    compare+select.  NOTE an unsigned-min formulation ``min(r, r - p)``
    (one VPU op fewer; the wrapped r - p loses exactly when r < p) is
    bit-identical and works under XLA, but these helpers are traced
    inside Pallas kernels too and Mosaic cannot legalize vector
    ``arith.minui`` (measured: TPU kernel compile failure), so the
    where-form stays."""
    return jnp.where(r >= p, r - p, r)


def mulmod(a, b, p, mu, shift):
    """a*b mod p via Barrett; a, b canonical in [0, p); p < 2^30."""
    hi, lo = mul32(a, b)
    xs = (hi << (32 - shift)) | (lo >> shift)
    q = mulhi32(xs, mu)
    r = lo - q * p
    r = reduce_once(r, p << 1)
    return reduce_once(r, p)


def mulmod_shoup(x, w, w_shoup, p):
    """x*w mod p with precomputed w_shoup = floor(w*2^32/p); x in [0, p)."""
    q = mulhi32(x, w_shoup)
    r = x * w - q * p
    return reduce_once(r, p)


def addmod(a, b, p):
    return reduce_once(a + b, p)


def submod(a, b, p):
    r = a + p - b
    return jnp.where(r >= p, r - p, r)


def negmod(a, p):
    return jnp.where(a == 0, a, p - a)


# ---------------------------------------------------------------------------
# Host (NumPy) equivalents: uint64 products fit since p < 2^30.
# ---------------------------------------------------------------------------


def np_barrett_u64(primes):
    """Per-prime (p, mu, shift) as uint64 arrays shaped [L, 1] for
    broadcasting against host [..., L, n] data."""
    p, mu, sh = barrett_params(primes)
    return (p.astype(np.uint64), mu.astype(np.uint64), sh.astype(np.uint64))


def np_mulmod_b(a, b, p64, mu64, sh64):
    """Vectorized host a*b mod p via Barrett -- avoids numpy's scalar u64
    division.  a, b uint64 (or uint32) arrays with values < p < 2^30."""
    x = a.astype(np.uint64) * b.astype(np.uint64)
    q = ((x >> sh64) * mu64) >> np.uint64(32)
    r = x - q * p64
    two_p = p64 << np.uint64(1)
    r = np.where(r >= two_p, r - two_p, r)
    return np.where(r >= p64, r - p64, r)


def np_addmod_b(a, b, p64):
    r = a.astype(np.uint64) + b.astype(np.uint64)
    return np.where(r >= p64, r - p64, r)


def np_mulmod(a, b, p):
    return (a.astype(np.uint64) * b.astype(np.uint64) % np.uint64(p)).astype(np.uint32)


def np_addmod(a, b, p):
    r = a.astype(np.uint64) + b.astype(np.uint64)
    return (r % np.uint64(p)).astype(np.uint32)


def np_submod(a, b, p):
    r = a.astype(np.uint64) + np.uint64(p) - b.astype(np.uint64)
    return (r % np.uint64(p)).astype(np.uint32)
