"""Encrypted resize: bit-exact vs the plaintext mod-t golden network and
value-accurate vs the float sampler, for bilinear and bicubic, in both the
faithful (encrypted fracts, ct*ct) and fast (plain fracts) modes."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhetpu.bfv import golden
from fhetpu.bfv.crypto import Decryptor, Encryptor, KeyGenerator
from fhetpu.bfv.encoder import FractionalEncoder
from fhetpu.bfv.evaluator import Ct, Evaluator
from fhetpu.bfv.golden import GoldenEvaluator
from fhetpu.bfv.params import BfvParams
from fhetpu.pipelines import resize as rz

N, T = 4096, 1 << 14
H = W = 6
H2 = W2 = 3


@pytest.fixture(scope="module")
def ctx():
    par = BfvParams.create(n=N, t=T)
    kg = KeyGenerator(par, seed=77)
    enc = Encryptor(par, kg.public_key(), seed=88)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(T, N)
    ev = Evaluator(par, encoder)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    coeffs = encoder.encode_batch(img.astype(np.float64))  # [H, W, 3, n]
    cts = enc.encrypt_batch(coeffs.reshape(-1, N)).reshape(H, W, 3, 2, par.L, N)
    return par, enc, dec, encoder, ev, img, coeffs, cts


class GoldenFracts:
    """Scalar fract bundle for the golden network (one output pixel);
    1-t / t^2 / t^3 are polynomial compositions, like the pipeline's."""

    def __init__(self, gev, f, mode):
        enc = gev.encode
        self.t = enc(float(f))
        self.one_minus_t = golden.add(enc(1.0), golden.neg(self.t, gev.t), gev.t)
        if mode == rz.BICUBIC:
            self.t2 = golden.mult(self.t, self.t, gev.t)
            self.t3 = golden.mult(self.t2, self.t, gev.t)


def _golden_resize(encoder, coeffs, mode):
    """Per-pixel golden mod-t network (plain-fract semantics)."""
    gev = GoldenEvaluator(encoder)
    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    taps = 2 if mode == rz.BILINEAR else 4
    out = np.zeros((H2, W2, 3, N), dtype=np.int64)
    for y in range(H2):
        fy = GoldenFracts(gev, rp.fract[y], mode)
        for x in range(W2):
            fx = GoldenFracts(gev, cp.fract[x], mode)
            for ch in range(3):
                cols = []
                for r in range(taps):
                    px = [coeffs[rp.idx[y, r], cp.idx[x, k], ch] for k in range(taps)]
                    if mode == rz.BILINEAR:
                        cols.append(rz.linear_interp(gev, px[0], px[1], fx, True))
                    else:
                        cols.append(rz.cubic_interp(gev, *px, fx, True))
                if mode == rz.BILINEAR:
                    out[y, x, ch] = rz.linear_interp(gev, cols[0], cols[1], fy, True)
                else:
                    out[y, x, ch] = rz.cubic_interp(gev, *cols, fy, True)
    return out


@pytest.mark.parametrize("mode", [rz.BILINEAR, rz.BICUBIC])
def test_fast_path_bit_exact_and_value(ctx, mode):
    par, enc, dec, encoder, ev, img, coeffs, cts = ctx
    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    yops, xops = rz.make_fract_bundles(ev, rp, cp, mode, encryptor=None)
    out = rz.resize_tile(ev, jnp.asarray(cts), rp, cp, yops, xops, mode, plain=True)
    out_np = np.asarray(out)  # [H2, W2, 3, size, L, n]
    size = out_np.shape[3]
    assert size == 2  # plain path never grows
    plains = dec.decrypt_batch(out_np.reshape(-1, size, par.L, N)).reshape(
        H2, W2, 3, N
    )
    want = _golden_resize(encoder, coeffs, mode)
    np.testing.assert_array_equal(plains, want)
    vals = encoder.decode_batch(plains)
    ref = rz.resize_float(img, H2, W2, mode)
    np.testing.assert_allclose(vals, ref, atol=1e-5)


def _run_faithful(par, enc, dec, encoder, ev, coeffs, cts, mode):
    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    yops, xops = rz.make_fract_bundles(ev, rp, cp, mode, encryptor=enc)
    import jax

    tile = jax.jit(
        lambda c: rz.resize_tile(ev, c, rp, cp, yops, xops, mode, plain=False)
    )
    out = tile(jnp.asarray(cts))
    out_np = np.asarray(out)
    size = out_np.shape[3]
    assert size == (4 if mode == rz.BILINEAR else 8)  # unrelinearized growth
    plains = dec.decrypt_batch(out_np.reshape(-1, size, par.L, N)).reshape(
        H2, W2, 3, N
    )
    # same decrypted polynomials as the plain-fract path (the fract
    # encodings are identical; only noise differs)
    want = _golden_resize(encoder, coeffs, mode)
    np.testing.assert_array_equal(plains, want)
    return plains


def test_faithful_encrypted_fracts_bilinear(ctx):
    par, enc, dec, encoder, ev, img, coeffs, cts = ctx
    plains = _run_faithful(par, enc, dec, encoder, ev, coeffs, cts, rz.BILINEAR)
    vals = encoder.decode_batch(plains)
    ref = rz.resize_float(img, H2, W2, rz.BILINEAR)
    np.testing.assert_allclose(vals, ref, atol=1e-5)


def test_faithful_encrypted_fracts_bicubic_small_t():
    """Depth-4 unrelinearized bicubic exceeds the n=4096/t=2^14 noise budget
    (~85 bits vs ~110 needed) -- the same regime where the reference's own
    bicubic only succeeds at small pmod (results.txt: fails at n=2048; its
    sweep never ran pmod=16384).  We verify bit-exactness vs golden at
    t=64, where the budget fits, exactly like the reference's working
    configurations; value accuracy is covered by the plain-fract test."""
    t_small = 64
    par = BfvParams.create(n=N, t=t_small)
    kg = KeyGenerator(par, seed=99)
    enc = Encryptor(par, kg.public_key(), seed=98)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(t_small, N)
    ev = Evaluator(par, encoder)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    coeffs = encoder.encode_batch(img.astype(np.float64))
    cts = enc.encrypt_batch(coeffs.reshape(-1, N)).reshape(H, W, 3, 2, par.L, N)
    _run_faithful(par, enc, dec, encoder, ev, coeffs, cts, rz.BICUBIC)
