"""Negacyclic number-theoretic transform over RNS limbs (device + host).

Replaces the role of SEAL 2.3's polynomial arithmetic backend (SURVEY.md C1):
polynomial multiplication in Z_p[x]/(x^n+1) becomes pointwise products in the
NTT (evaluation) domain.  We use the Harvey/Longa-Naehrig formulation with the
2n-th root psi folded into the twiddle tables:

* forward: Cooley-Tukey butterflies, natural order in -> bit-reversed out;
* inverse: Gentleman-Sande, bit-reversed in -> natural out, with the final
  n^-1 scaling applied as a Shoup constant multiply.

Pointwise multiplication between two forward-transformed polynomials yields
the negacyclic convolution; no explicit bit-reversal permutation is ever
materialized.  The device implementation is a Python-unrolled loop of
log2(n) vectorized butterfly stages over arrays shaped ``[..., L, n]``; XLA
fuses each stage into a couple of elementwise kernels.  The host (NumPy)
implementation mirrors it for client-side encrypt/decrypt.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from . import modops


def _bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _find_primitive_2n_root(p: int, n: int) -> int:
    """Smallest-order-compliant psi with psi^n == -1 mod p (deterministic)."""
    order = 2 * n
    assert (p - 1) % order == 0
    exp = (p - 1) // order
    g = 2
    while True:
        psi = pow(g, exp, p)
        if pow(psi, n, p) == p - 1:
            return psi
        g += 1


class NttTables:
    """Per-(base, n) twiddle tables, stacked over limbs: arrays [L, n]."""

    def __init__(self, primes, n: int):
        self.primes = tuple(int(p) for p in primes)
        self.n = n
        logn = n.bit_length() - 1
        assert 1 << logn == n
        L = len(self.primes)
        psi_br = np.zeros((L, n), dtype=np.uint32)
        ipsi_br = np.zeros((L, n), dtype=np.uint32)
        n_inv = np.zeros((L, 1), dtype=np.uint32)
        for li, p in enumerate(self.primes):
            psi = _find_primitive_2n_root(p, n)
            ipsi = pow(psi, p - 2, p)
            pw, ipw = 1, 1
            psis = np.zeros(n, dtype=np.uint64)
            ipsis = np.zeros(n, dtype=np.uint64)
            for i in range(n):
                psis[i] = pw
                ipsis[i] = ipw
                pw = pw * psi % p
                ipw = ipw * ipsi % p
            for i in range(n):
                j = _bit_reverse(i, logn)
                psi_br[li, i] = psis[j]
                ipsi_br[li, i] = ipsis[j]
            n_inv[li, 0] = pow(n, p - 2, p)
        p_arr, mu, shift = modops.barrett_params(self.primes)
        self.p = p_arr  # [L,1] uint32
        self.mu = mu
        self.shift = shift
        self.psi_br = psi_br
        self.psi_br_shoup = modops.shoup(psi_br, p_arr.astype(np.uint64))
        self.ipsi_br = ipsi_br
        self.ipsi_br_shoup = modops.shoup(ipsi_br, p_arr.astype(np.uint64))
        self.n_inv = n_inv
        self.n_inv_shoup = modops.shoup(n_inv, p_arr.astype(np.uint64))
        self.logn = logn


@functools.lru_cache(maxsize=None)
def get_tables(primes: tuple, n: int) -> NttTables:
    return NttTables(primes, n)


def _fwd_stage(xp, a, w, ws, p):
    """One CT stage: a [..., L, m, 2, t]; w, ws [L, m, 1]."""
    u = a[..., 0, :]
    v = xp_mulmod_shoup(xp, a[..., 1, :], w, ws, p)
    return xp.stack((_addmod(xp, u, v, p), _submod(xp, u, v, p)), axis=-2)


def xp_mulmod_shoup(xp, x, w, ws, p):
    if xp is jnp:
        return modops.mulmod_shoup(x, w, ws, p)
    q = (x.astype(np.uint64) * ws.astype(np.uint64)) >> np.uint64(32)
    r = (x.astype(np.uint64) * w.astype(np.uint64) - q * p.astype(np.uint64)) & np.uint64(
        0xFFFFFFFF
    )
    r = np.where(r >= p, r - p, r)
    return r.astype(np.uint32)


def _addmod(xp, a, b, p):
    r = a + b
    return xp.where(r >= p, r - p, r)


def _submod(xp, a, b, p):
    r = a + p - b
    return xp.where(r >= p, r - p, r)


def _ntt_impl(xp, x, tables: NttTables):
    """Forward negacyclic NTT over the last axis of x [..., L, n]."""
    n, L = tables.n, len(tables.primes)
    psi = xp.asarray(tables.psi_br)
    psi_s = xp.asarray(tables.psi_br_shoup)
    p_col = xp.asarray(tables.p)  # [L,1]
    a = x
    m, t = 1, n
    for _ in range(tables.logn):
        t //= 2
        a = a.reshape(a.shape[:-1] + (m, 2, t))
        w = psi[:, m : 2 * m].reshape(L, m, 1)
        ws = psi_s[:, m : 2 * m].reshape(L, m, 1)
        p = p_col.reshape(L, 1, 1)
        a = _fwd_stage(xp, a, w, ws, p)
        a = a.reshape(a.shape[:-3] + (2 * m * t,))
        m *= 2
    return a


def _intt_impl(xp, x, tables: NttTables):
    """Inverse negacyclic NTT over the last axis of x [..., L, n]."""
    n, L = tables.n, len(tables.primes)
    ipsi = xp.asarray(tables.ipsi_br)
    ipsi_s = xp.asarray(tables.ipsi_br_shoup)
    p_col = xp.asarray(tables.p)
    a = x
    t, m = 1, n
    while m > 1:
        h = m // 2
        a = a.reshape(a.shape[:-1] + (h, 2, t))
        w = ipsi[:, h : 2 * h].reshape(L, h, 1)
        ws = ipsi_s[:, h : 2 * h].reshape(L, h, 1)
        p = p_col.reshape(L, 1, 1)
        u = a[..., 0, :]
        v = a[..., 1, :]
        lo = _addmod(xp, u, v, p)
        hi = xp_mulmod_shoup(xp, _submod(xp, u, v, p), w, ws, p)
        a = xp.stack((lo, hi), axis=-2)
        a = a.reshape(a.shape[:-3] + (2 * h * t,))
        t *= 2
        m = h
    ninv = xp.asarray(tables.n_inv)
    ninv_s = xp.asarray(tables.n_inv_shoup)
    return xp_mulmod_shoup(xp, a, ninv, ninv_s, p_col)


def _use_pallas(x, tables: NttTables) -> bool:
    """Route eligible TPU transforms to the single-pass Pallas kernel.

    Measured batch sweep on v5e (bench_core.json ntt_sweep, n=4096, L=4;
    analysis in docs/ntt_roofline.md): the Pallas kernel is batch-flat at
    ~2.7-2.8M limb-NTTs/s (24/91/363/1528 us at B=16/64/256/1024) while
    the staged-XLA graph pays a high per-dispatch floor with one sweet
    spot around B=256 (283 us) where its fusion clusters line up.  Pallas
    is used everywhere eligible except that measured XLA-wins window.
    Large L*n configs whose resident twiddle tables exceed VMEM stay on
    the staged graph."""
    import os as _os

    if _os.environ.get("FHETPU_PALLAS_NTT", "1") == "0":
        return False
    import jax

    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    L = len(tables.primes)
    if tables.n < 256 or tables.n % 128:
        return False
    if 2 * (tables.logn + 1) * L * tables.n * 4 > 4 * 1024 * 1024:
        return False  # stage tables would crowd VMEM (e.g. n=8192, L=8)
    if x.shape[-2:] != (L, tables.n):
        return False
    batch = 1
    for d in x.shape[:-2]:
        batch *= d
    if tables.n == 4096 and L == 4 and 192 <= batch <= 512:
        return False  # measured XLA-wins window at the benchmark config
    return True


def ntt(x: jnp.ndarray, tables: NttTables) -> jnp.ndarray:
    """Device forward NTT, batched over leading axes of [..., L, n]."""
    if _use_pallas(x, tables):
        from . import pallas_ntt

        return pallas_ntt.make_ntt(tables, forward=True)(x)
    return _ntt_impl(jnp, x, tables)


def intt(x: jnp.ndarray, tables: NttTables) -> jnp.ndarray:
    if _use_pallas(x, tables):
        from . import pallas_ntt

        return pallas_ntt.make_ntt(tables, forward=False)(x)
    return _intt_impl(jnp, x, tables)


def np_ntt(x: np.ndarray, tables: NttTables) -> np.ndarray:
    """Host forward NTT; uses the native C++ kernels when available
    (fhetpu/native/fastntt.cpp), falling back to vectorized NumPy."""
    x = np.ascontiguousarray(x, dtype=np.uint32)
    out = _native_ntt(x, tables, forward=True)
    if out is not None:
        return out
    return _ntt_impl(np, x, tables)


def np_intt(x: np.ndarray, tables: NttTables) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.uint32)
    out = _native_ntt(x, tables, forward=False)
    if out is not None:
        return out
    return _intt_impl(np, x, tables)


def np_intt_scaled(x: np.ndarray, tables: NttTables,
                   scale_u32: np.ndarray) -> np.ndarray:
    """Host inverse NTT with a per-limb scalar folded into the final n^-1
    scaling pass: returns INTT(x) * scale mod p at zero extra passes.
    Used by the decrypt fast path to fold qhat_inv (BFV CRT decode) into
    the transform.  scale_u32: uint32 [L]."""
    from .. import native

    x = np.ascontiguousarray(x, dtype=np.uint32)
    L, n = len(tables.primes), tables.n
    scale = np.asarray(scale_u32, dtype=np.uint64).reshape(-1)
    assert scale.shape == (L,)
    nlib = native.lib()
    if nlib is not None and x.shape[-2:] == (L, n):
        import ctypes

        u32p = ctypes.POINTER(ctypes.c_uint32)
        p64 = tables.p.astype(np.uint64).reshape(-1)
        ninv = (tables.n_inv.astype(np.uint64).reshape(-1) * scale) % p64
        ninv_sh = (ninv << np.uint64(32)) // p64
        out = x.copy()
        flat = out.reshape(-1, L, n)
        nlib.fastntt_inverse(
            out.ctypes.data_as(u32p), flat.shape[0], L, n,
            np.ascontiguousarray(tables.ipsi_br).ctypes.data_as(u32p),
            np.ascontiguousarray(tables.ipsi_br_shoup).ctypes.data_as(u32p),
            np.ascontiguousarray(tables.p.reshape(-1)).ctypes.data_as(u32p),
            np.ascontiguousarray(ninv.astype(np.uint32)).ctypes.data_as(u32p),
            np.ascontiguousarray(
                ninv_sh.astype(np.uint32)).ctypes.data_as(u32p),
            native.default_threads(),
        )
        return out
    y = np_intt(x, tables)
    p64 = tables.p.astype(np.uint64).reshape(-1, 1)
    return ((y.astype(np.uint64) * scale.reshape(-1, 1)) % p64).astype(
        np.uint32)


def np_pointwise_mulmod(a: np.ndarray, b: np.ndarray, tables: NttTables) -> np.ndarray:
    """Host pointwise a*b mod p over [..., L, n] with b either [..., L, n]
    (matching) or [L, n] (broadcast); native threaded kernel when available."""
    from .. import native

    L, n = len(tables.primes), tables.n
    nlib = native.lib()
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    if nlib is not None and a.shape[-2:] == (L, n) and b.shape in ((L, n), a.shape):
        import ctypes

        u32p = ctypes.POINTER(ctypes.c_uint32)
        out = np.empty_like(a)
        flat = a.reshape(-1, L, n)
        batch = flat.shape[0]
        b_batch = 1 if b.shape == (L, n) else batch
        p_arr = np.ascontiguousarray(tables.p.reshape(-1))
        nlib.fastntt_pointwise_mulmod(
            a.ctypes.data_as(u32p), b.ctypes.data_as(u32p),
            out.ctypes.data_as(u32p), batch, b_batch, L, n,
            p_arr.ctypes.data_as(u32p), native.default_threads(),
        )
        return out
    p64 = tables.p.astype(np.uint64)
    return (a.astype(np.uint64) * b.astype(np.uint64) % p64).astype(np.uint32)


def _native_ntt(x: np.ndarray, tables: NttTables, forward: bool):
    from .. import native

    L = len(tables.primes)
    if x.shape[-2] != L or x.shape[-1] != tables.n:
        return None
    nlib = native.lib()
    if nlib is None:
        return None
    import ctypes

    u32p = ctypes.POINTER(ctypes.c_uint32)

    def ptr(a):
        return a.ctypes.data_as(u32p)

    out = x.copy()
    flat = out.reshape(-1, L, tables.n)
    batch = flat.shape[0]
    threads = native.default_threads()
    p_arr = np.ascontiguousarray(tables.p.reshape(-1))
    if forward:
        nlib.fastntt_forward(
            ptr(flat), batch, L, tables.n,
            ptr(tables.psi_br), ptr(tables.psi_br_shoup), ptr(p_arr), threads,
        )
    else:
        nlib.fastntt_inverse(
            ptr(flat), batch, L, tables.n,
            ptr(tables.ipsi_br), ptr(tables.ipsi_br_shoup), ptr(p_arr),
            ptr(np.ascontiguousarray(tables.n_inv.reshape(-1))),
            ptr(np.ascontiguousarray(tables.n_inv_shoup.reshape(-1))),
            threads,
        )
    return out


def negacyclic_convolve_naive(a, b, p: int) -> np.ndarray:
    """O(n^2) golden model: (a*b) mod (x^n+1, p), exact Python ints."""
    n = len(a)
    out = [0] * n
    for i, ai in enumerate(int(v) for v in a):
        if ai == 0:
            continue
        for j, bj in enumerate(int(v) for v in b):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % p
            else:
                out[k - n] = (out[k - n] - ai * bj) % p
    return np.array(out, dtype=np.uint32)
