"""NTT correctness: roundtrip, convolution theorem vs O(n^2) golden model,
device/host agreement, batching over limb and batch axes."""

import numpy as np
import jax.numpy as jnp

from fhetpu.core import ntt, primes


def _tables(n, nprimes=2):
    ps = tuple(primes.gen_ntt_primes(28, nprimes))
    return ntt.get_tables(ps, n)


def test_roundtrip_host_and_device():
    rng = np.random.default_rng(0)
    for n in (64, 256, 1024):
        t = _tables(n)
        L = len(t.primes)
        x = np.stack(
            [rng.integers(0, p, size=n, dtype=np.uint64) for p in t.primes]
        ).astype(np.uint32)
        x = np.broadcast_to(x, (3, L, n)).copy()  # batch of 3
        np.testing.assert_array_equal(ntt.np_intt(ntt.np_ntt(x, t), t), x)
        dev = np.asarray(ntt.intt(ntt.ntt(jnp.asarray(x), t), t))
        np.testing.assert_array_equal(dev, x)


def test_device_host_agree():
    rng = np.random.default_rng(1)
    n = 128
    t = _tables(n)
    x = np.stack(
        [rng.integers(0, p, size=n, dtype=np.uint64) for p in t.primes]
    ).astype(np.uint32)
    np.testing.assert_array_equal(
        np.asarray(ntt.ntt(jnp.asarray(x), t)), ntt.np_ntt(x, t)
    )


def test_convolution_theorem():
    rng = np.random.default_rng(2)
    n = 64
    t = _tables(n, nprimes=1)
    p = t.primes[0]
    a = rng.integers(0, p, size=n, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, p, size=n, dtype=np.uint64).astype(np.uint32)
    want = ntt.negacyclic_convolve_naive(a, b, p)
    fa = ntt.np_ntt(a[None, :], t)
    fb = ntt.np_ntt(b[None, :], t)
    prod = (fa.astype(np.uint64) * fb.astype(np.uint64) % np.uint64(p)).astype(
        np.uint32
    )
    got = ntt.np_intt(prod, t)[0]
    np.testing.assert_array_equal(got, want)


def test_convolution_x_shift():
    # multiplying by x rotates negacyclically: x * x^(n-1) == -1
    n = 32
    t = _tables(n, nprimes=1)
    p = t.primes[0]
    a = np.zeros((1, n), dtype=np.uint32)
    b = np.zeros((1, n), dtype=np.uint32)
    a[0, 1] = 1  # x
    b[0, n - 1] = 1  # x^(n-1)
    fa, fb = ntt.np_ntt(a, t), ntt.np_ntt(b, t)
    prod = (fa.astype(np.uint64) * fb.astype(np.uint64) % np.uint64(p)).astype(
        np.uint32
    )
    got = ntt.np_intt(prod, t)[0]
    want = np.zeros(n, dtype=np.uint32)
    want[0] = p - 1
    np.testing.assert_array_equal(got, want)


def test_pallas_ntt_matches_staged():
    """Single-pass Pallas kernel (interpret mode on CPU) is elementwise
    identical to the staged-XLA NTT and roundtrips, incl. a non-multiple
    batch exercising the pad/slice path (core/pallas_ntt.py)."""
    from fhetpu.core.pallas_ntt import make_ntt

    rng = np.random.default_rng(7)
    n = 256
    t = _tables(n)
    L = len(t.primes)
    x = np.stack(
        [rng.integers(0, p, size=(3, n), dtype=np.uint64) for p in t.primes],
        axis=-2,
    ).astype(np.uint32)
    ref = np.asarray(ntt.ntt(jnp.asarray(x), t))
    fwd = make_ntt(t, forward=True, rows_per_block=2, interpret=True)
    inv = make_ntt(t, forward=False, rows_per_block=2, interpret=True)
    got = np.asarray(fwd(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)
    back = np.asarray(inv(jnp.asarray(got)))
    np.testing.assert_array_equal(back, x)


def test_fourstep_mxu_ntt_matches_staged():
    """Four-step MXU transform (core/ntt4step.py) is bit-identical to the
    staged NTT in both directions across n = A*B factorizations, including
    non-square ones (n=2048 -> A=32, B=64)."""
    from fhetpu.core import ntt4step

    rng = np.random.default_rng(11)
    for n in (2048, 4096):
        t = _tables(n)
        L = len(t.primes)
        x = np.stack(
            [rng.integers(0, p, size=(3, n), dtype=np.uint64) for p in t.primes],
            axis=-2,
        ).astype(np.uint32)
        ref = np.asarray(ntt.ntt(jnp.asarray(x), t))
        got = np.asarray(ntt4step.ntt4(jnp.asarray(x), t, forward=True))
        np.testing.assert_array_equal(got, ref)
        back = np.asarray(ntt4step.ntt4(jnp.asarray(got), t, forward=False))
        np.testing.assert_array_equal(back, x)
