"""End-to-end encrypted JPEG pipeline: bit-exactness vs the plaintext mod-t
golden oracle, value accuracy vs double AAN DCT, and the full CLI file
protocol (client --send -> server -> client --recieve)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from fhetpu.bfv.crypto import Decryptor, Encryptor, KeyGenerator
from fhetpu.bfv.encoder import FractionalEncoder
from fhetpu.bfv.evaluator import Ct, Evaluator
from fhetpu.bfv.golden import GoldenEvaluator
from fhetpu.bfv.params import BfvParams
from fhetpu.codec import jpeg as jc
from fhetpu.io import images
from fhetpu.pipelines import jpeg_encode as pipe

N, T = 2048, 1 << 14


def _plain_dct_ref(block8: np.ndarray) -> np.ndarray:
    """The reference's plaintext double AAN DCT (fhe_image.h:399-484)."""
    d = block8.astype(np.float64).copy().reshape(8, 8)

    def pass1d(v):
        tmp0, tmp7 = v[0] + v[7], v[0] - v[7]
        tmp1, tmp6 = v[1] + v[6], v[1] - v[6]
        tmp2, tmp5 = v[2] + v[5], v[2] - v[5]
        tmp3, tmp4 = v[3] + v[4], v[3] - v[4]
        tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
        tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
        o = np.zeros(8)
        o[0], o[4] = tmp10 + tmp11, tmp10 - tmp11
        z1 = (tmp12 + tmp13) * 0.541196100
        o[2] = z1 + tmp13 * 0.765366865
        o[6] = z1 + tmp12 * -1.847759065
        z1, z2 = tmp4 + tmp7, tmp5 + tmp6
        z3, z4 = tmp4 + tmp6, tmp5 + tmp7
        z5 = (z3 + z4) * 1.175875602
        tmp4 *= 0.298631336
        tmp5 *= 2.053119869
        tmp6 *= 3.072711026
        tmp7 *= 1.501321110
        z1 *= -0.899976223
        z2 *= -2.562915447
        z3 = z3 * -1.961570560 + z5
        z4 = z4 * -0.390180644 + z5
        o[7] = tmp4 + z1 + z3
        o[5] = tmp5 + z2 + z4
        o[3] = tmp6 + z2 + z3
        o[1] = tmp7 + z1 + z4
        return o

    for r in range(8):
        d[r] = pass1d(d[r])
    for c in range(8):
        d[:, c] = pass1d(d[:, c]) / 8.0
    return d.reshape(64)


@pytest.fixture(scope="module")
def setup():
    par = BfvParams.create(n=N, t=T)
    kg = KeyGenerator(par, seed=5)
    enc = Encryptor(par, kg.public_key(), seed=6)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(T, N)
    ev = Evaluator(par, encoder)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    return par, kg, enc, dec, encoder, ev, img


def test_encrypted_pipeline_bit_exact_vs_golden(setup):
    par, kg, enc, dec, encoder, ev, img = setup
    blocks = np.stack(
        [images.split_blocks(img[..., c].astype(np.float64)) for c in range(3)],
        axis=1,
    )  # [nb, 3, 64]
    nb = blocks.shape[0]
    coeffs = encoder.encode_batch(blocks)  # [nb, 3, 64, n]
    cts = enc.encrypt_batch(coeffs.reshape(-1, N)).reshape(nb, 3, 64, 2, par.L, N)

    server = pipe.make_server(ev)
    out = np.asarray(server(jnp.asarray(cts)))  # [nb, 3, 64, 2, L, n]
    got_plain = dec.decrypt_batch(out.reshape(-1, 2, par.L, N)).reshape(nb, 3, 64, N)

    # golden: same network over plaintext coeff arrays mod t
    gev = GoldenEvaluator(encoder)
    r, g, b = coeffs[:, 0], coeffs[:, 1], coeffs[:, 2]  # [nb, 64, n]
    y, cb, cr = pipe.rgb_to_ycc(gev, r, g, b)
    want = np.zeros_like(got_plain)
    for ci, chan in enumerate((y, cb, cr)):
        slots = [chan[:, k] for k in range(64)]
        slots = pipe.dct8x8(gev, slots)
        for k in range(64):
            want[:, ci, k] = slots[k]
    np.testing.assert_array_equal(got_plain, want)

    # decoded values match the plaintext double AAN DCT pipeline closely
    vals = encoder.decode_batch(got_plain)  # [nb, 3, 64]
    rf = img[..., 0].astype(np.float64)
    gf = img[..., 1].astype(np.float64)
    bf = img[..., 2].astype(np.float64)
    yf = 0.299 * rf + 0.587 * gf + 0.114 * bf - 128.0
    cbf = -0.168736 * rf - 0.331264 * gf + 0.5 * bf
    crf = 0.5 * rf - 0.418688 * gf - 0.081312 * bf
    for ci, chan in enumerate((yf, cbf, crf)):
        chan_blocks = images.split_blocks(chan)
        for bi in range(nb):
            ref = _plain_dct_ref(chan_blocks[bi])
            np.testing.assert_allclose(vals[bi, ci], ref, atol=1e-6)


def test_pallas_dct_matches_jnp_server(setup):
    """The fused Pallas DCT kernel (interpret mode on CPU) is bit-identical
    to the jnp elementwise network inside the full server op."""
    par, kg, enc, dec, encoder, ev, img = setup
    rng = np.random.default_rng(3)
    shape = (2, 3, 64, 2, par.L, par.n)
    limbs = [
        rng.integers(0, int(p), size=shape[:-2] + (par.n,), dtype=np.uint64)
        for p in par.q_primes
    ]
    cts = jnp.asarray(np.stack(limbs, axis=-2).astype(np.uint32))
    ref = np.asarray(pipe.server_compute_fn(ev)(cts))
    fused = np.asarray(
        pipe.server_compute_fn(ev, use_pallas=True, pallas_interpret=True)(cts)
    )
    np.testing.assert_array_equal(fused, ref)


def test_fused_server_kernel_matches_jnp_server(setup):
    """The single fused YCC+DCT Pallas kernel (core/pallas_server.py,
    interpret mode on CPU) is bit-identical to the jnp elementwise server."""
    par, kg, enc, dec, encoder, ev, img = setup
    rng = np.random.default_rng(4)
    shape = (2, 3, 64, 2, par.L, par.n)
    limbs = [
        rng.integers(0, int(p), size=shape[:-2] + (par.n,), dtype=np.uint64)
        for p in par.q_primes
    ]
    cts = jnp.asarray(np.stack(limbs, axis=-2).astype(np.uint32))
    ref = np.asarray(pipe.server_compute_fn(ev, input_ntt=True, output_ntt=True)(cts))
    fused = np.asarray(
        pipe.server_compute_fn(
            ev, input_ntt=True, output_ntt=True, use_fused=True,
            pallas_interpret=True,
        )(cts)
    )
    np.testing.assert_array_equal(fused, ref)
    # deferred-reduction kernel: intermediates ride in [0, k*p), reduced at
    # pass boundaries -- must stay bit-identical after the final reduce
    lazy = np.asarray(
        pipe.server_compute_fn(
            ev, input_ntt=True, output_ntt=True, use_fused=True,
            pallas_interpret=True, fused_lazy=True,
        )(cts)
    )
    np.testing.assert_array_equal(lazy, ref)


def test_fused_lazy_m1_branch_bit_identity():
    """The lazy kernel's m=1 headroom branch (29-bit primes -- the chain the
    n=8192 default params select, where only 8p of u32 headroom remains and
    the reduction points differ from the m=2 chain) is bit-identical to the
    jnp server too.  Runs on a 29-bit-prime set at n=2048 so interpret mode
    stays CI-fast; the branch choice depends only on prime bit-length
    (core/pallas_server.py lazy_bound_multiple), not the ring degree."""
    from fhetpu.core import pallas_server
    from fhetpu.core.primes import default_aux_modulus, gen_ntt_primes

    q = tuple(gen_ntt_primes(29, 2))
    b, m_sk = default_aux_modulus(N)
    par = BfvParams(n=N, t=T, q_primes=q, b_primes=b, m_sk=m_sk)
    encoder = FractionalEncoder(T, N)
    ev = Evaluator(par, encoder)
    assert pallas_server.lazy_bound_multiple(ev) == 1
    rng = np.random.default_rng(9)
    shape = (1, 3, 64, 2, par.L, par.n)
    limbs = [
        rng.integers(0, int(p), size=shape[:-2] + (par.n,), dtype=np.uint64)
        for p in par.q_primes
    ]
    cts = jnp.asarray(np.stack(limbs, axis=-2).astype(np.uint32))
    ref = np.asarray(
        pipe.server_compute_fn(ev, input_ntt=True, output_ntt=True)(cts)
    )
    lazy = np.asarray(
        pipe.server_compute_fn(
            ev, input_ntt=True, output_ntt=True, use_fused=True,
            pallas_interpret=True, fused_lazy=True,
        )(cts)
    )
    np.testing.assert_array_equal(lazy, ref)


def test_cli_roundtrip(tmp_path, setup):
    _, _, _, _, _, _, img = setup
    from fhetpu.cli import client_jpeg, server_jpeg

    d = str(tmp_path)
    img_path = os.path.join(d, "in.png")
    images.save_rgb(img_path, img)
    common = [
        "--cmod", str(N), "--pmod", str(T),
        "--keydir", os.path.join(d, "keys"),
        "--chunk-blocks", "4",
    ]
    client_jpeg.main(
        ["--send", "-f", img_path, "-c", os.path.join(d, "c2s.bin")] + common
    )
    server_jpeg.main(
        ["-i", os.path.join(d, "c2s.bin"), "-c", os.path.join(d, "s2c.bin"),
         "--platform", "cpu"] + common
    )
    out_jpg = os.path.join(d, "out.jpg")
    client_jpeg.main(
        ["--recieve", "-f", img_path, "-i", os.path.join(d, "s2c.bin"),
         "-o", out_jpg] + common
    )
    assert os.path.exists(out_jpg)
    ours = images.load_rgb(out_jpg)
    assert ours.shape == img.shape
    # quality-0 (all-ones quant) JPEG of a random image: decoded pixels track
    # the original within JPEG rounding error
    err = images.rms_error(ours, img)
    assert err < 6.0, f"decoded JPEG too far from source (rms {err})"
