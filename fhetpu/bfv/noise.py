"""Analytic noise-budget tracking (SURVEY.md section 5: the reference's only
failure signal is post-hoc RMS blowup when the budget is exhausted; we make
invariant-noise tracking a first-class runtime check).

Tracks a conservative upper bound on the *invariant noise* ||v||, where
t/q * ct(s) = m + v + a*t and decryption is correct iff ||v|| < 1/2 --
SEAL's budget convention: budget = -log2(2*||v||).  Bounds follow the
standard BFV analysis (centered representatives):

  fresh:          v ~ t/q * (B_err*(2n+1) + ...)           [encrypt]
  add:            v1 + v2
  add_plain:      v + t/q * r_t(q) * ... (negligible)
  multiply_plain: ||m||_1 * v  (m the centered plaintext operand)
  multiply:       t*n*(k1+k2)*(v1 + v2) + small BEHZ alpha terms
  relinearize:    v + L * n * p_max * B_err * t / q

The tracker is pure host metadata -- it rides alongside device arrays and
never touches ciphertext data.  ``NoiseBudget.check()`` raises (or warns)
before a pipeline burns a chip-hour producing garbage, the runtime analog of
the reference discovering RMS=114 after the fact (benchmark/results.txt).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

from .params import BfvParams


@dataclass(frozen=True)
class NoiseBudget:
    """log2 of the invariant-noise bound (negative exponent; budget =
    -log2(2*noise) = -(log2_noise + 1))."""

    log2_noise: float
    params: BfvParams

    @property
    def budget_bits(self) -> float:
        return max(-(self.log2_noise + 1.0), 0.0)

    def exhausted(self) -> bool:
        return self.log2_noise >= -1.0

    def check(self, where: str = ""):
        if self.exhausted():
            raise NoiseExhausted(
                f"noise budget exhausted{' at ' + where if where else ''}: "
                f"log2(noise)={self.log2_noise:.1f} (decryption would be garbage; "
                f"increase n / reduce plain modulus t)"
            )
        return self


class NoiseExhausted(RuntimeError):
    pass


def fresh(params: BfvParams) -> NoiseBudget:
    """Public-key encryption noise: e*u + e0 + e1*s with ternary u,s."""
    n, t, q = params.n, params.t, params.q
    b_err = 6.0 * params.sigma
    bound = t / q * b_err * (2.0 * n + 1.0)
    return NoiseBudget(math.log2(bound), params)


def add(a: NoiseBudget, b: NoiseBudget) -> NoiseBudget:
    return NoiseBudget(_log2add(a.log2_noise, b.log2_noise), a.params)


def add_plain(a: NoiseBudget) -> NoiseBudget:
    # adds t/q * (q mod t) * ||m|| / ... -- dominated by existing noise
    return a


def multiply_plain(a: NoiseBudget, operand_l1_norm: float) -> NoiseBudget:
    return NoiseBudget(a.log2_noise + math.log2(max(operand_l1_norm, 1.0)), a.params)


def multiply(a: NoiseBudget, b: NoiseBudget, k1: int = 2, k2: int = 2) -> NoiseBudget:
    p = a.params
    growth = math.log2(p.t * p.n * (k1 + k2))
    base = _log2add(a.log2_noise, b.log2_noise) + growth
    # BEHZ fast-floor alpha error: <= L additive units of t/q scale
    alpha = math.log2(p.t * p.L) - p.q.bit_length()
    return NoiseBudget(_log2add(base, alpha), p)


def relinearize(a: NoiseBudget) -> NoiseBudget:
    p = a.params
    p_max = max(int(x) for x in p.q_primes)
    ks = math.log2(p.L * p.n * p_max * 6.0 * p.sigma * p.t) - p.q.bit_length()
    return NoiseBudget(_log2add(a.log2_noise, ks), p)


def encoded_scalar_l1(encoder, value: float) -> float:
    """l1 norm of the centered encoding of a scalar (for multiply_plain)."""
    coeffs = encoder.encode(value).balanced()
    return float(abs(coeffs).sum())


def _log2add(x: float, y: float) -> float:
    hi, lo = (x, y) if x >= y else (y, x)
    return hi + math.log1p(2.0 ** (lo - hi)) / math.log(2.0)


def estimate_jpeg_pipeline(params: BfvParams, encoder) -> NoiseBudget:
    """Static estimate for the YCC+DCT pipeline: the worst slot passes
    through ~2 multiply_plain per DCT pass (x2 passes) plus the YCC combo
    and the 0.125 scale."""
    nb = fresh(params)
    ycc = multiply_plain(nb, encoded_scalar_l1(encoder, 0.587))
    for _ in range(2):  # row + column pass, worst path ~2 chained const muls
        ycc = multiply_plain(ycc, encoded_scalar_l1(encoder, 1.175875602))
        ycc = multiply_plain(ycc, encoded_scalar_l1(encoder, -2.562915447))
    ycc = multiply_plain(ycc, encoded_scalar_l1(encoder, 0.125))
    # sums of 8 terms per pass
    return NoiseBudget(ycc.log2_noise + math.log2(64), params)
