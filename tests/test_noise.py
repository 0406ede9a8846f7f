"""Analytic noise tracker: bounds must be conservative (>= measured noise,
i.e. predicted budget <= measured budget) yet predict the same
success/failure frontier the reference's RMS table shows."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhetpu.bfv import noise
from fhetpu.bfv.crypto import Decryptor, Encryptor, KeyGenerator
from fhetpu.bfv.encoder import FractionalEncoder
from fhetpu.bfv.evaluator import Ct, Evaluator
from fhetpu.bfv.params import BfvParams


def test_fresh_bound_conservative():
    par = BfvParams.create(n=2048, t=1 << 14)
    kg = KeyGenerator(par, seed=1)
    enc = Encryptor(par, kg.public_key(), seed=2)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(par.t, par.n)
    ct = enc.encrypt(encoder.encode(100.0))
    measured = dec.invariant_noise_budget(ct)
    predicted = noise.fresh(par).budget_bits
    assert predicted <= measured + 1  # conservative
    assert predicted >= measured - 15  # not uselessly loose


def test_multiply_tracking():
    par = BfvParams.create(n=4096, t=1 << 14)
    kg = KeyGenerator(par, seed=3)
    enc = Encryptor(par, kg.public_key(), seed=4)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(par.t, par.n)
    ev = Evaluator(par, encoder)
    ca = Ct(jnp.asarray(enc.encrypt(encoder.encode(3.0))))
    prod = ev.multiply(ca, ca)
    measured = dec.invariant_noise_budget(np.asarray(prod.data))
    nb = noise.multiply(noise.fresh(par), noise.fresh(par))
    assert nb.budget_bits <= measured + 1
    assert nb.budget_bits >= measured - 25
    assert not nb.exhausted()


def test_frontier_matches_reference():
    """n=2048/t=2^14 cannot multiply (the reference's bicubic-fails-at-2048
    mode); n=4096 can.  The tracker must predict both."""
    small = BfvParams.create(n=2048, t=1 << 14)
    ok = BfvParams.create(n=4096, t=1 << 14)
    deep_small = noise.multiply(
        noise.multiply(noise.fresh(small), noise.fresh(small)),
        noise.fresh(small),
    )
    assert deep_small.exhausted()
    deep_ok = noise.multiply(
        noise.multiply(noise.fresh(ok), noise.fresh(ok)), noise.fresh(ok)
    )
    assert not deep_ok.exhausted()
    with pytest.raises(noise.NoiseExhausted):
        deep_small.check("bicubic")


def test_jpeg_estimate_positive_at_reference_params():
    # n=2048 is flagged marginal by the conservative bound (real runs
    # succeed -- worst-case l1 products overestimate the CLT-concentrated
    # digit growth; the tracker errs safe), n>=4096 clearly fits
    for n in (4096, 8192):
        par = BfvParams.create(n=n, t=1 << 14)
        encoder = FractionalEncoder(par.t, par.n)
        est = noise.estimate_jpeg_pipeline(par, encoder)
        assert not est.exhausted(), n
