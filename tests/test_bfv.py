"""BFV end-to-end: encoder, encrypt/decrypt, evaluator ops vs the exact
plaintext golden model (decrypted plaintext must be BIT-EXACT vs golden
mod-t polynomial arithmetic while noise budget remains positive)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhetpu.bfv import golden
from fhetpu.bfv.crypto import Decryptor, Encryptor, KeyGenerator
from fhetpu.bfv.encoder import FractionalEncoder, Plaintext
from fhetpu.bfv.evaluator import Ct, DeviceRelinKeys, Evaluator
from fhetpu.bfv.params import BfvParams

N = 2048
T = 1 << 14


@pytest.fixture(scope="module")
def ctx():
    par = BfvParams.create(n=N, t=T)
    kg = KeyGenerator(par, seed=123)
    enc = Encryptor(par, kg.public_key(), seed=321)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(T, N)
    ev = Evaluator(par, encoder)
    return par, kg, enc, dec, encoder, ev


def test_encoder_scalar_batch_agree(ctx):
    _, _, _, _, encoder, _ = ctx
    vals = np.array([0.0, 1.0, -1.0, 0.5, -0.125, 3.75, 255.0, -128.0, 0.299])
    batch = encoder.encode_batch(vals)
    for i, v in enumerate(vals):
        np.testing.assert_array_equal(batch[i], encoder.encode(float(v)).coeffs)
        assert abs(encoder.decode_batch(batch[i : i + 1])[0] - v) < 1e-25


def test_encrypt_decrypt_bit_exact(ctx):
    par, kg, enc, dec, encoder, _ = ctx
    vals = np.array([0.0, 1.5, -200.25, 17.0, 0.333251953125])
    coeffs = encoder.encode_batch(vals)
    cts = enc.encrypt_batch(coeffs)
    out = dec.decrypt_batch(cts)
    np.testing.assert_array_equal(out, coeffs)  # bit-exact plaintext recovery
    assert dec.invariant_noise_budget(cts[0]) > 15


def test_linear_ops_bit_exact(ctx):
    par, kg, enc, dec, encoder, ev = ctx
    a, b = 13.625, -7.25
    pa, pb = encoder.encode(a), encoder.encode(b)
    ca = Ct(jnp.asarray(enc.encrypt(pa)))
    cb = Ct(jnp.asarray(enc.encrypt(pb)))
    can, cbn = ev.transform_to_ntt(ca), ev.transform_to_ntt(cb)

    # add / sub / negate
    for op, gold in (
        (ev.add(can, cbn), golden.add(pa.coeffs, pb.coeffs, T)),
        (ev.sub(can, cbn), golden.sub(pa.coeffs, pb.coeffs, T)),
        (ev.negate(can), golden.neg(pa.coeffs, T)),
    ):
        got = dec.decrypt(np.asarray(ev.transform_from_ntt(op).data)).coeffs
        np.testing.assert_array_equal(got, gold)

    # multiply_plain / add_plain / sub_plain with an encoded constant
    const = 0.541196100
    pc = encoder.encode(const)
    got = dec.decrypt(
        np.asarray(ev.transform_from_ntt(ev.multiply_plain(can, ev.encode(const))).data)
    ).coeffs
    np.testing.assert_array_equal(got, golden.mult(pa.coeffs, pc.coeffs, T))
    got = dec.decrypt(
        np.asarray(ev.transform_from_ntt(ev.add_plain(can, ev.encode(const))).data)
    ).coeffs
    np.testing.assert_array_equal(got, golden.add(pa.coeffs, pc.coeffs, T))
    got = dec.decrypt(
        np.asarray(ev.transform_from_ntt(ev.sub_plain(can, ev.encode(const))).data)
    ).coeffs
    np.testing.assert_array_equal(got, golden.sub(pa.coeffs, pc.coeffs, T))


@pytest.fixture(scope="module")
def ctx4096():
    """n=4096 params: enough noise budget (~85 bits) for ct*ct multiply
    chains; n=2048/t=2^14 cannot multiply (budget ~29 - cost ~28), which is
    exactly the reference's bicubic-fails-at-n-2048 mode (results.txt)."""
    par = BfvParams.create(n=4096, t=T)
    kg = KeyGenerator(par, seed=11)
    enc = Encryptor(par, kg.public_key(), seed=22)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(T, 4096)
    ev = Evaluator(par, encoder)
    return par, kg, enc, dec, encoder, ev


def test_ct_multiply_bit_exact_and_value(ctx4096):
    par, kg, enc, dec, encoder, ev = ctx4096
    a, b = 3.5, -2.25
    pa, pb = encoder.encode(a), encoder.encode(b)
    ca = Ct(jnp.asarray(enc.encrypt(pa)))
    cb = Ct(jnp.asarray(enc.encrypt(pb)))
    prod = ev.multiply(ca, cb)
    assert prod.size == 3
    ct_np = np.asarray(prod.data)
    assert dec.invariant_noise_budget(ct_np) > 10
    got = dec.decrypt(ct_np)
    np.testing.assert_array_equal(got.coeffs, golden.mult(pa.coeffs, pb.coeffs, T))
    assert abs(encoder.decode(got) - a * b) < 1e-9

    sq = ev.square(ca)
    got = dec.decrypt(np.asarray(sq.data))
    np.testing.assert_array_equal(got.coeffs, golden.mult(pa.coeffs, pa.coeffs, T))

    # size (3) x size (2) -> 4, like the reference's unrelinearized t^3
    cube = ev.multiply(sq, ca)
    assert cube.size == 4
    got = dec.decrypt(np.asarray(cube.data))
    want = golden.mult(golden.mult(pa.coeffs, pa.coeffs, T), pa.coeffs, T)
    np.testing.assert_array_equal(got.coeffs, want)
    assert abs(encoder.decode(got) - a ** 3) < 1e-6


def test_relinearize(ctx4096):
    par, kg, enc, dec, encoder, ev = ctx4096
    rk = DeviceRelinKeys(kg.relin_keys(max_power=2))
    a, b = 5.0, 7.0
    pa, pb = encoder.encode(a), encoder.encode(b)
    ca = Ct(jnp.asarray(enc.encrypt(pa)))
    cb = Ct(jnp.asarray(enc.encrypt(pb)))
    prod = ev.multiply(ca, cb)
    rel = ev.relinearize(prod, rk)
    assert rel.size == 2
    ct_np = np.asarray(rel.data)
    budget = dec.invariant_noise_budget(ct_np)
    assert budget > 0, "relinearization consumed the whole budget"
    got = dec.decrypt(ct_np)
    np.testing.assert_array_equal(got.coeffs, golden.mult(pa.coeffs, pb.coeffs, T))
    assert abs(encoder.decode(got) - 35.0) < 1e-9


def test_relinearize_dbc_digits(ctx4096):
    """--dbc sub-digit decomposition: identical decryption, measurably more
    remaining noise budget than one-digit-per-limb keys (VERDICT.md item 7)."""
    par, kg, enc, dec, encoder, ev = ctx4096
    a, b = 5.0, 7.0
    pa, pb = encoder.encode(a), encoder.encode(b)
    prod = ev.multiply(Ct(jnp.asarray(enc.encrypt(pa))), Ct(jnp.asarray(enc.encrypt(pb))))
    budgets = {}
    for dbc in (0, 16):
        rk = kg.relin_keys(max_power=2, digit_bits=dbc)
        assert rk.n_subdigits == (1 if dbc == 0 else 2)
        rel = ev.relinearize(prod, DeviceRelinKeys(rk))
        assert rel.size == 2
        ct_np = np.asarray(rel.data)
        got = dec.decrypt(ct_np)
        np.testing.assert_array_equal(got.coeffs, golden.mult(pa.coeffs, pb.coeffs, T))
        budgets[dbc] = dec.invariant_noise_budget(ct_np)
    # finer digits => smaller key-switch noise.  After a fresh x fresh
    # multiply the BEHZ multiply noise is close to the dbc=0 key-switch
    # noise, so the visible gain is a few bits (deterministic: fixed seeds).
    assert budgets[16] >= budgets[0] + 2, budgets


def test_batched_ops(ctx):
    par, kg, enc, dec, encoder, ev = ctx
    vals = np.arange(8, dtype=np.float64) - 3.5
    cts = enc.encrypt_batch(encoder.encode_batch(vals))  # [8, 2, L, n]
    c = ev.transform_to_ntt(Ct(jnp.asarray(cts)))
    doubled = ev.add(c, c)
    out = dec.decrypt_batch(np.asarray(ev.transform_from_ntt(doubled).data))
    np.testing.assert_allclose(encoder.decode_batch(out), 2 * vals, atol=1e-20)


def test_add_many_multiply_many_exponentiate(ctx4096):
    par, kg, enc, dec, encoder, ev = ctx4096
    vals = [1.5, -2.0, 3.0]
    plains = [encoder.encode(v) for v in vals]
    cts = [Ct(jnp.asarray(enc.encrypt(p))) for p in plains]

    s = ev.add_many(cts)
    got = dec.decrypt(np.asarray(s.data))
    want = plains[0].coeffs
    for p in plains[1:]:
        want = golden.add(want, p.coeffs, T)
    np.testing.assert_array_equal(got.coeffs, want)
    assert abs(encoder.decode(got) - sum(vals)) < 1e-9

    m = ev.multiply_many(cts)
    assert m.size == 4  # unrelinearized growth 2x2->3, 3x2->4
    got = dec.decrypt(np.asarray(m.data))
    want = golden.mult(golden.mult(plains[0].coeffs, plains[1].coeffs, T),
                       plains[2].coeffs, T)
    np.testing.assert_array_equal(got.coeffs, want)
    assert abs(encoder.decode(got) - (1.5 * -2.0 * 3.0)) < 1e-6

    # exponentiate == repeated multiply (SEAL semantics), cubed here
    e = ev.exponentiate(cts[0], 3)
    got = dec.decrypt(np.asarray(e.data))
    want = golden.mult(golden.mult(plains[0].coeffs, plains[0].coeffs, T),
                       plains[0].coeffs, T)
    np.testing.assert_array_equal(got.coeffs, want)

    # relinearized exponentiate stays size-2 and decrypts to the same value
    rk = DeviceRelinKeys(kg.relin_keys(max_power=2))
    e2 = ev.exponentiate(cts[0], 3, rk=rk)
    assert e2.size == 2
    got2 = dec.decrypt(np.asarray(e2.data))
    assert abs(encoder.decode(got2) - 1.5 ** 3) < 1e-6


def test_native_params_chain_roundtrip():
    """The opt-in fhetpu-native <=28-bit chain (BfvParams.create_native)
    carries the SAME total modulus bits as the SEAL-parity chain (same
    128-bit security) with every prime lazy-kernel eligible, and the full
    encrypt -> evaluate -> decrypt path works on it unchanged (everything
    downstream derives from the params object)."""
    par = BfvParams.create_native(n=8192, t=T)
    ref = BfvParams.create(n=8192, t=T)
    assert all(int(p).bit_length() <= 28 for p in par.q_primes)
    assert sum(int(p).bit_length() for p in par.q_primes) == \
        sum(int(p).bit_length() for p in ref.q_primes)
    assert par.L == ref.L + 1 or par.L == ref.L  # more, smaller primes
    kg = KeyGenerator(par, seed=21)
    enc = Encryptor(par, kg.public_key(), seed=22)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(T, par.n)
    ev = Evaluator(par, encoder)
    pa, pb = encoder.encode(12.25), encoder.encode(-3.5)
    ca = ev.transform_to_ntt(Ct(jnp.asarray(enc.encrypt(pa))))
    cb = ev.transform_to_ntt(Ct(jnp.asarray(enc.encrypt(pb))))
    s = ev.add(ca, cb)
    got = encoder.decode(
        dec.decrypt(np.asarray(ev.transform_from_ntt(s).data)))
    assert abs(got - 8.75) < 1e-9
    assert dec.invariant_noise_budget(np.asarray(
        ev.transform_from_ntt(s).data)) > 100
