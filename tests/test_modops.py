"""Barrett/Shoup 32-bit modular arithmetic vs exact Python-int golden model."""

import numpy as np
import jax.numpy as jnp

from fhetpu.core import modops, primes


def _rand(rng, n, p):
    return rng.integers(0, p, size=n, dtype=np.uint64).astype(np.uint32)


def test_mul32_matches_python():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint64).astype(np.uint32)
    hi, lo = modops.mul32(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi, dtype=np.uint64), prod >> 32)
    np.testing.assert_array_equal(np.asarray(lo, dtype=np.uint64), prod & 0xFFFFFFFF)


def test_mulmod_barrett_all_prime_sizes():
    rng = np.random.default_rng(1)
    for bits in (27, 28, 29, 30):
        p = primes.gen_ntt_primes(bits, 1)[0]
        pa, mu, sh = modops.barrett_params([p])
        a = _rand(rng, 4096, p)
        b = _rand(rng, 4096, p)
        got = modops.mulmod(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(pa[0, 0]),
            jnp.asarray(mu[0, 0]), jnp.asarray(sh[0, 0]),
        )
        want = (a.astype(np.uint64) * b.astype(np.uint64)) % np.uint64(p)
        np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), want)


def test_mulmod_edge_cases():
    p = primes.gen_ntt_primes(30, 1)[0]
    pa, mu, sh = modops.barrett_params([p])
    edge = np.array([0, 1, 2, p - 1, p - 2, p // 2, p // 2 + 1], dtype=np.uint32)
    a, b = np.meshgrid(edge, edge)
    got = modops.mulmod(
        jnp.asarray(a.ravel()), jnp.asarray(b.ravel()),
        jnp.asarray(pa[0, 0]), jnp.asarray(mu[0, 0]), jnp.asarray(sh[0, 0]),
    )
    want = (a.ravel().astype(np.uint64) * b.ravel().astype(np.uint64)) % np.uint64(p)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), want)


def test_mulmod_shoup_constant():
    rng = np.random.default_rng(2)
    p = primes.gen_ntt_primes(29, 1)[0]
    w = rng.integers(0, p, size=64, dtype=np.uint64).astype(np.uint32)
    ws = modops.shoup(w, np.uint64(p))
    x = _rand(rng, 64, p)
    got = modops.mulmod_shoup(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ws), jnp.uint32(p)
    )
    want = (x.astype(np.uint64) * w.astype(np.uint64)) % np.uint64(p)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.uint64), want)


def test_add_sub_neg():
    rng = np.random.default_rng(3)
    p = primes.gen_ntt_primes(30, 1)[0]
    a = _rand(rng, 512, p)
    b = _rand(rng, 512, p)
    pj = jnp.uint32(p)
    np.testing.assert_array_equal(
        np.asarray(modops.addmod(jnp.asarray(a), jnp.asarray(b), pj), np.uint64),
        (a.astype(np.uint64) + b) % np.uint64(p),
    )
    np.testing.assert_array_equal(
        np.asarray(modops.submod(jnp.asarray(a), jnp.asarray(b), pj), np.uint64),
        (a.astype(np.uint64) + np.uint64(p) - b) % np.uint64(p),
    )
    np.testing.assert_array_equal(
        np.asarray(modops.negmod(jnp.asarray(a), pj), np.uint64),
        (np.uint64(p) - a.astype(np.uint64)) % np.uint64(p),
    )


def test_default_modulus_tables():
    for n, total in primes.SEAL23_TOTAL_BITS.items():
        qs = primes.default_coeff_modulus_128(n)
        assert sum(int(q).bit_length() for q in qs) <= total
        assert sum(int(q).bit_length() for q in qs) >= total - 3
        for q in qs:
            assert (q - 1) % (1 << 16) == 0 and primes.is_prime(q)
        b, m_sk = primes.default_aux_modulus(n)
        assert len(b) == len(qs) + 1
        assert len(set(qs) | set(b) | {m_sk}) == 2 * len(qs) + 2
