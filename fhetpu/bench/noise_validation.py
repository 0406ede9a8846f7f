"""Measured-vs-analytic noise validation (VERDICT r3 item 6 / SURVEY.md
section 5 failure detection).

The analytic tracker (bfv/noise.py) gates every server run; this module
backs each gate decision with MEASUREMENT: run the real pipeline computation
on tiny inputs, decrypt with the secret key, and compute the exact
``invariant_noise_budget`` of every output ciphertext.  A model point is
*conservative* when its mean-case predicted budget <= the measured minimum
budget (the gate never promises more than the chip delivers), and a *gate
mismatch* is the dangerous direction: model says "run" (budget > 0) but the
measured budget is 0 (decryption garbage).

Note the scope: the budget models DECRYPTION soundness (noise < 1/2).  The
reference's small-pmod RMS failures (results.txt 72-114 bands) are the
OTHER failure mode -- plaintext polynomial wrap mod t -- which is
data-dependent and handled by the FractionalEncoder range analysis, not by
this tracker (tests/test_parity.py reproduces it).
"""

from __future__ import annotations

import math

import numpy as np

from ..bfv import noise
from ..bfv.crypto import Decryptor, Encryptor, KeyGenerator
from ..bfv.encoder import FractionalEncoder
from ..bfv.evaluator import DeviceRelinKeys, Evaluator
from ..bfv.params import BfvParams
from ..pipelines import resize as rz

RELIN_DBC = 16


def _ctx(n: int, t: int, seed: int = 11):
    par = BfvParams.create(n=n, t=t)
    kg = KeyGenerator(par, seed=seed)
    enc = Encryptor(par, kg.public_key(), seed=seed + 1)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(t, n)
    ev = Evaluator(par, encoder)
    return par, kg, enc, dec, encoder, ev


def measure_jpeg(n: int, t: int):
    """One 8x8 RGB block through the YCC+DCT server op."""
    import jax.numpy as jnp

    from ..io import images
    from ..pipelines import jpeg_encode as pipe

    par, kg, enc, dec, encoder, ev = _ctx(n, t)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    blocks = np.stack(
        [images.split_blocks(img[..., c].astype(np.float64)) for c in range(3)],
        axis=1,
    )  # [1, 3, 64]
    cts = enc.encrypt_batch(encoder.encode_batch(blocks).reshape(-1, n))
    cts = cts.reshape(1, 3, 64, 2, par.L, n)
    out = np.asarray(pipe.make_server(ev)(jnp.asarray(cts)))
    flat = out.reshape(-1, 2, par.L, n)
    measured = int(dec.invariant_noise_budget_batch(flat).min())
    est_mean = noise.estimate_jpeg_pipeline(par, encoder, mean=True)
    est_worst = noise.estimate_jpeg_pipeline(par, encoder, mean=False)
    return measured, est_mean, est_worst


def measure_resize(n: int, t: int, bicubic: bool, plain_fracts: bool,
                   relin_dbc=None):
    """6x6 -> 3x3 resize tile in the requested mode."""
    import jax.numpy as jnp

    par, kg, enc, dec, encoder, ev = _ctx(n, t)
    mode = rz.BICUBIC if bicubic else rz.BILINEAR
    relin = None
    if relin_dbc is not None:
        relin = DeviceRelinKeys(
            kg.relin_keys(max_power=2, digit_bits=relin_dbc))
    rng = np.random.default_rng(4)
    H = W = 6
    H2 = W2 = 3
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    cts = enc.encrypt_batch(
        encoder.encode_batch(img.astype(np.float64)).reshape(-1, n)
    ).reshape(H, W, 3, 2, par.L, n)
    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    yops, xops = rz.make_fract_bundles(
        ev, rp, cp, mode, encryptor=None if plain_fracts else enc,
        relin=relin)
    out = np.asarray(
        rz.resize_tile(ev, jnp.asarray(cts), rp, cp, yops, xops, mode,
                       plain=plain_fracts, relin=relin)
    )
    size = out.shape[3]
    flat = out.reshape(-1, size, par.L, n)
    measured = int(dec.invariant_noise_budget_batch(flat).min())
    est_mean = noise.estimate_resize_pipeline(
        par, encoder, bicubic, plain_fracts=plain_fracts, mean=True,
        relin_dbc=relin_dbc)
    est_worst = noise.estimate_resize_pipeline(
        par, encoder, bicubic, plain_fracts=plain_fracts, mean=False,
        relin_dbc=relin_dbc)
    return measured, est_mean, est_worst


def measure_harmonics(n: int, t: int, degree: int):
    """Harmonic-expansion decode server: multiply_plain by cos-weight
    encodings summed over 2*degree+1 terms (rle_decode depth-0 protocol)."""
    par, kg, enc, dec, encoder, ev = _ctx(n, t)
    rng = np.random.default_rng(5)
    amp = enc.encrypt(encoder.encode(137.0))
    from ..bfv.evaluator import Ct
    import jax.numpy as jnp

    ct = ev.transform_to_ntt(Ct(jnp.asarray(amp[None]), False))
    acc = None
    for j in range(2 * degree + 1):
        w = float(np.cos(0.37 * (j + 1)))
        term = ev.multiply_plain(ct, ev.encode(w))
        acc = term if acc is None else ev.add(acc, term)
    out = np.asarray(ev.transform_from_ntt(acc).data)
    measured = int(dec.invariant_noise_budget_batch(out).min())
    est_mean = noise.estimate_harmonics_decode(par, encoder, degree, mean=True)
    est_worst = noise.estimate_harmonics_decode(par, encoder, degree,
                                                mean=False)
    return measured, est_mean, est_worst


PIPELINES = {
    "jpeg": lambda n, t: measure_jpeg(n, t),
    "bilinear_plain": lambda n, t: measure_resize(n, t, False, True),
    "bilinear_ctct": lambda n, t: measure_resize(n, t, False, False),
    "bicubic_plain": lambda n, t: measure_resize(n, t, True, True),
    "bicubic_ctct": lambda n, t: measure_resize(n, t, True, False),
    "bicubic_ctct_relin": lambda n, t: measure_resize(
        n, t, True, False, relin_dbc=RELIN_DBC),
    "decode_harmonics48": lambda n, t: measure_harmonics(n, t, 48),
}


def run_point(pipeline: str, n: int, t: int) -> dict:
    measured, est_mean, est_worst = PIPELINES[pipeline](n, t)
    mean_bits = round(est_mean.budget_bits, 1)
    worst_bits = round(est_worst.budget_bits, 1)
    return {
        "pipeline": pipeline,
        "n": n,
        "t": t,
        "measured_budget": measured,
        "model_mean_budget": mean_bits,
        "model_worst_budget": worst_bits,
        "gate": "run" if not est_mean.exhausted() else "refuse",
        # conservative: the gate's promise never exceeds the measurement.
        # measured_budget is floor(log2(...)) -- an integer -- so the
        # like-for-like comparison floors the model too (model 22.4 vs
        # measured 22 means both land in the [22, 23) bit bucket).  Floor
        # the UNROUNDED value: round-to-1dp first would promote 22.96 to
        # the 23 bucket here while tests/test_noise.py floors to 22.
        "conservative": bool(math.floor(est_mean.budget_bits) <= measured),
        # dangerous direction: gate says run but decryption is garbage
        "gate_mismatch": bool(not est_mean.exhausted() and measured == 0),
    }
