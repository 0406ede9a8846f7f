"""BEHZ RNS machinery for BFV ciphertext-by-ciphertext multiplication.

Implements the Bajard-Eynard-Hasan-Zucca full-RNS variant of FV multiply
(the role of SEAL's Evaluator::multiply/square, reference usage
fhe_resize.h:174-183 and fhe_decode.h:59-110), entirely in 32-bit device
arithmetic:

  1. exact base extension q -> Bsk = B + {m_sk} with m~ Montgomery
     correction (converts the canonical representative, no q-overflow),
  2. negacyclic tensor product in NTT domain over both bases; sizes compose
     as k1 + k2 - 1 (the reference never relinearizes, so sizes really do
     grow: Cubic produces size-5 ciphertexts -- SURVEY.md C9),
  3. approximate scale-and-floor by t/q in Bsk (fast-floor; the bounded
     alpha <= L error is absorbed by noise),
  4. exact Shenoy-Kumaresan conversion Bsk -> q via m_sk.

All constants are precomputed host-side from Python big-ints.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..core import modops, ntt
from .params import BfvParams, _prod


class BehzConsts:
    """Precomputed constant tables for one parameter set (host numpy)."""

    def __init__(self, par: BfvParams):
        q_primes = [int(x) for x in par.q_primes]
        bsk = [int(x) for x in par.bsk_primes]
        b_primes = bsk[:-1]
        m_sk = bsk[-1]
        m_tilde = 1 << 16
        L, K = len(q_primes), len(bsk)
        q = par.q
        B = _prod(b_primes)

        self.L, self.K = L, K
        self.m_tilde = m_tilde

        c = par.consts
        self.qp, self.qmu, self.qshift = c.qp, c.qmu, c.qshift
        self.bskp, self.bskmu, self.bskshift = c.bskp, c.bskmu, c.bskshift

        # --- base extension q -> Bsk with m~ correction ---
        # x'_i = x_i * m~ mod p_i
        self.m_tilde_mod_q = np.array(
            [[m_tilde % p] for p in q_primes], dtype=np.uint32
        )
        # z_i = x'_i * qhat_i^-1 mod p_i
        self.qhat_inv_mod_q = c.qhat_inv_mod_q  # [L,1]
        # (q/p_i) mod b_j for b_j in Bsk:  [L, K]
        self.q_over_pi_mod_bsk = np.array(
            [[(q // p) % bj for bj in bsk] for p in q_primes], dtype=np.uint32
        )
        # (q/p_i) mod m~ (m~ = 2^16: just low bits)
        self.q_over_pi_mod_mtilde = np.array(
            [(q // p) % m_tilde for p in q_primes], dtype=np.uint32
        )
        # -q^-1 mod m~
        self.neg_q_inv_mod_mtilde = (-pow(q % m_tilde, _phi_pow2_inv(m_tilde), m_tilde)) % m_tilde
        # q mod b_j, m~^-1 mod b_j
        self.q_mod_bsk = np.array([[q % bj] for bj in bsk], dtype=np.uint32)
        self.m_tilde_inv_mod_bsk = np.array(
            [[pow(m_tilde % bj, bj - 2, bj)] for bj in bsk], dtype=np.uint32
        )

        # --- scale by t and fast-floor by q, in Bsk ---
        self.t_mod_q = c.t_mod_q  # [L,1]
        self.t_mod_bsk = np.array([[par.t % bj] for bj in bsk], dtype=np.uint32)
        self.q_inv_mod_bsk = np.array(
            [[pow(q % bj, bj - 2, bj)] for bj in bsk], dtype=np.uint32
        )

        # --- Shenoy-Kumaresan Bsk -> q ---
        # Bhat_j = B / b_j ; Bhat_inv_j mod b_j   (over B primes only)
        self.bhat_inv_mod_b = np.array(
            [[pow((B // bj) % bj, bj - 2, bj)] for bj in b_primes], dtype=np.uint32
        )
        self.b_over_bj_mod_msk = np.array(
            [(B // bj) % m_sk for bj in b_primes], dtype=np.uint32
        )
        self.b_inv_mod_msk = pow(B % m_sk, m_sk - 2, m_sk)
        self.b_over_bj_mod_q = np.array(
            [[(B // bj) % p for p in q_primes] for bj in b_primes], dtype=np.uint32
        )  # [K-1, L]
        self.b_mod_q = np.array([[B % p] for p in q_primes], dtype=np.uint32)
        self.m_sk = m_sk
        (self.mskp,), (self.mskmu,), (self.mskshift,) = (
            np.array([m_sk], np.uint32),
            np.array([modops.barrett_params([m_sk])[1][0, 0]], np.uint32),
            np.array([modops.barrett_params([m_sk])[2][0, 0]], np.uint32),
        )


def _phi_pow2_inv(m: int) -> int:
    """Exponent for inverse mod power of two: phi(2^k) - 1 = 2^(k-1) - 1."""
    return (m >> 1) - 1


@functools.lru_cache(maxsize=None)
def get_behz(par: BfvParams) -> BehzConsts:
    return BehzConsts(par)


def _mm(a, b, p, mu, sh):
    return modops.mulmod(a, b, p, mu, sh)


class RnsTool:
    """Device-side BEHZ steps; holds jnp copies of BehzConsts."""

    def __init__(self, par: BfvParams):
        self.par = par
        bc = get_behz(par)
        self.bc = bc
        self.tables_q = par.tables_q
        self.tables_bsk = par.tables_bsk
        # numpy (not jnp): RnsTool may be built lazily inside a jit trace,
        # and jnp constants created there become trace-local tracers
        j = np.asarray
        self.qp, self.qmu, self.qsh = j(bc.qp), j(bc.qmu), j(bc.qshift)
        self.bp, self.bmu, self.bsh = j(bc.bskp), j(bc.bskmu), j(bc.bskshift)
        self.m_tilde_mod_q = j(bc.m_tilde_mod_q)
        self.qhat_inv_mod_q = j(bc.qhat_inv_mod_q)
        self.q_over_pi_mod_bsk = j(bc.q_over_pi_mod_bsk)  # [L,K]
        self.q_over_pi_mod_mtilde = j(bc.q_over_pi_mod_mtilde)  # [L]
        self.q_mod_bsk = j(bc.q_mod_bsk)
        self.m_tilde_inv_mod_bsk = j(bc.m_tilde_inv_mod_bsk)
        self.t_mod_q = j(bc.t_mod_q)
        self.t_mod_bsk = j(bc.t_mod_bsk)
        self.q_inv_mod_bsk = j(bc.q_inv_mod_bsk)
        self.bhat_inv_mod_b = j(bc.bhat_inv_mod_b)
        self.b_over_bj_mod_msk = j(bc.b_over_bj_mod_msk)
        self.b_over_bj_mod_q = j(bc.b_over_bj_mod_q)
        self.b_mod_q = j(bc.b_mod_q)

    # -- step 1: exact conversion of [..., L, n] -> [..., K, n] ------------

    def extend_q_to_bsk(self, x):
        bc = self.bc
        L, K = bc.L, bc.K
        m_tilde = bc.m_tilde
        # x' = x * m~ mod q ; z = x' * qhat_inv mod q
        xp = _mm(x, self.m_tilde_mod_q, self.qp, self.qmu, self.qsh)
        z = _mm(xp, self.qhat_inv_mod_q, self.qp, self.qmu, self.qsh)  # [...,L,n]
        # y_j = sum_i z_i * (q/p_i mod b_j)  mod b_j     [..., K, n]
        zi = z[..., :, None, :]  # [..., L, 1, n]
        cij = self.q_over_pi_mod_bsk[:, :, None]  # [L, K, 1]
        bp = self.bp[None, :, :]  # [1, K, 1]
        bmu = self.bmu[None, :, :]
        bsh = self.bsh[None, :, :]
        prod = _mm(zi, cij, bp, bmu, bsh)  # [..., L, K, n]
        y = prod[..., 0, :, :]
        for i in range(1, L):
            y = modops.addmod(y, prod[..., i, :, :], self.bp)
        # y_mtilde = sum_i z_i * (q/p_i mod m~)  mod m~ (2^16: mask adds)
        mask = jnp.uint32(m_tilde - 1)
        ym = jnp.zeros_like(z[..., 0, :])
        for i in range(L):
            ym = (ym + (z[..., i, :] & mask) * self.q_over_pi_mod_mtilde[i]) & mask
        # r = -y_mtilde * q^-1 mod m~, centered
        r = (ym * jnp.uint32(bc.neg_q_inv_mod_mtilde)) & mask
        # centered: r >= m~/2 -> r - m~ ; add q*r_c then divide by m~
        r_pos = r  # in [0, m~)
        # compute (y + q * r_c) * m~^-1 mod b_j; r_c = r_pos - m~ when >= m~/2
        qr = _mm(
            jnp.broadcast_to(r_pos[..., None, :], y.shape),
            self.q_mod_bsk,
            self.bp,
            self.bmu,
            self.bsh,
        )
        # subtract q*m~ when r was negative: (r - m~)*q = r*q - m~*q
        q_mtilde_mod_bsk = _mm(
            jnp.broadcast_to(jnp.uint32(m_tilde), self.q_mod_bsk.shape),
            self.q_mod_bsk,
            self.bp,
            self.bmu,
            self.bsh,
        )
        neg = (r_pos >= jnp.uint32(m_tilde // 2))[..., None, :]
        qr = jnp.where(
            neg, modops.submod(qr, q_mtilde_mod_bsk, self.bp), qr
        )
        num = modops.addmod(y, qr, self.bp)
        return _mm(num, self.m_tilde_inv_mod_bsk, self.bp, self.bmu, self.bsh)

    # -- step 3: floor(t*x/q) in Bsk --------------------------------------

    def scale_floor_to_bsk(self, tx_q, tx_bsk):
        """Given t*x in base q ([..., L, n]) and in Bsk ([..., K, n]),
        return approx round(t*x/q) in Bsk (error <= L absorbed in noise)."""
        L = self.bc.L
        z = _mm(tx_q, self.qhat_inv_mod_q, self.qp, self.qmu, self.qsh)
        zi = z[..., :, None, :]
        cij = self.q_over_pi_mod_bsk[:, :, None]
        bp, bmu, bsh = self.bp[None], self.bmu[None], self.bsh[None]
        prod = _mm(zi, cij, bp, bmu, bsh)
        f = prod[..., 0, :, :]
        for i in range(1, L):
            f = modops.addmod(f, prod[..., i, :, :], self.bp)
        diff = modops.submod(tx_bsk, f, self.bp)
        return _mm(diff, self.q_inv_mod_bsk, self.bp, self.bmu, self.bsh)

    # -- step 4: exact Bsk -> q (Shenoy-Kumaresan) -------------------------

    def convert_bsk_to_q(self, x_bsk):
        bc = self.bc
        nb = bc.K - 1  # number of B primes
        xb = x_bsk[..., :nb, :]
        xmsk = x_bsk[..., nb, :]
        bp_b = self.bp[:nb]
        z = _mm(xb, self.bhat_inv_mod_b, bp_b, self.bmu[:nb], self.bsh[:nb])
        # alpha = (sum_j z_j * (B/b_j) - x_msk) * B^-1 mod m_sk, centered
        msk = jnp.uint32(bc.m_sk)
        mskmu = jnp.uint32(bc.mskmu)
        msksh = jnp.uint32(bc.mskshift)
        acc = None
        for jidx in range(nb):
            term = modops.mulmod(
                z[..., jidx, :], self.b_over_bj_mod_msk[jidx], msk, mskmu, msksh
            )
            acc = term if acc is None else modops.addmod(acc, term, msk)
        acc = modops.submod(acc, xmsk, msk)
        alpha = modops.mulmod(
            acc, jnp.uint32(bc.b_inv_mod_msk), msk, mskmu, msksh
        )  # [..., n] in [0, m_sk)
        # x_i = sum_j z_j*(B/b_j) - alpha_c*B  mod p_i
        zi = z[..., :, None, :]  # [..., nb, 1, n]
        cji = self.b_over_bj_mod_q[:, :, None]  # [nb, L, 1]
        qp, qmu, qsh = self.qp[None], self.qmu[None], self.qsh[None]
        prod = _mm(zi, cji, qp, qmu, qsh)  # [..., nb, L, n]
        xq = prod[..., 0, :, :]
        for jidx in range(1, nb):
            xq = modops.addmod(xq, prod[..., jidx, :, :], self.qp)
        # alpha centered: if alpha >= m_sk/2, alpha_c = alpha - m_sk
        a_b = _mm(
            jnp.broadcast_to(alpha[..., None, :], xq.shape),
            self.b_mod_q,
            self.qp,
            self.qmu,
            self.qsh,
        )
        msk_b_mod_q = _mm(
            jnp.broadcast_to(jnp.uint32(bc.m_sk), self.b_mod_q.shape),
            self.b_mod_q,
            self.qp,
            self.qmu,
            self.qsh,
        )
        neg = (alpha >= jnp.uint32(bc.m_sk // 2))[..., None, :]
        a_b = jnp.where(neg, modops.submod(a_b, msk_b_mod_q, self.qp), a_b)
        return modops.submod(xq, a_b, self.qp)


def multiply(ct1_data, ct2_data, par: BfvParams, tool: RnsTool = None):
    """Full BEHZ multiply of coeff-domain ciphertexts
    [..., k1, L, n] x [..., k2, L, n] -> [..., k1+k2-1, L, n]."""
    tool = tool or RnsTool(par)
    bc = tool.bc
    k1, k2 = ct1_data.shape[-3], ct2_data.shape[-3]
    # 1. extend to Bsk, NTT in both bases
    def prep(ct):
        bsk = tool.extend_q_to_bsk(ct)
        return (
            ntt.ntt(ct, tool.tables_q),
            ntt.ntt(bsk, tool.tables_bsk),
        )

    a_q, a_b = prep(ct1_data)
    b_q, b_b = prep(ct2_data)
    # 2. tensor product (sizes k1+k2-1)
    out_q, out_b = [], []
    for r in range(k1 + k2 - 1):
        acc_q = acc_b = None
        for i in range(max(0, r - k2 + 1), min(k1, r + 1)):
            jdx = r - i
            tq = _mm(a_q[..., i, :, :], b_q[..., jdx, :, :], tool.qp, tool.qmu, tool.qsh)
            tb = _mm(a_b[..., i, :, :], b_b[..., jdx, :, :], tool.bp, tool.bmu, tool.bsh)
            acc_q = tq if acc_q is None else modops.addmod(acc_q, tq, tool.qp)
            acc_b = tb if acc_b is None else modops.addmod(acc_b, tb, tool.bp)
        out_q.append(acc_q)
        out_b.append(acc_b)
    prod_q = ntt.intt(jnp.stack(out_q, axis=-3), tool.tables_q)
    prod_b = ntt.intt(jnp.stack(out_b, axis=-3), tool.tables_bsk)
    # 3. multiply by t, fast-floor by q (in Bsk)
    tx_q = _mm(prod_q, tool.t_mod_q, tool.qp, tool.qmu, tool.qsh)
    tx_b = _mm(prod_b, tool.t_mod_bsk, tool.bp, tool.bmu, tool.bsh)
    scaled_bsk = tool.scale_floor_to_bsk(tx_q, tx_b)
    # 4. back to q
    return tool.convert_bsk_to_q(scaled_bsk)
