"""Multi-device tests on the 8-way virtual CPU mesh: dp-sharded JPEG server
op and sp-sharded resize with halo exchange match single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fhetpu.bfv.crypto import Decryptor, Encryptor, KeyGenerator
from fhetpu.bfv.encoder import FractionalEncoder
from fhetpu.bfv.evaluator import Evaluator
from fhetpu.bfv.params import BfvParams
from fhetpu.parallel import halo
from fhetpu.parallel.mesh import make_mesh
from fhetpu.pipelines import jpeg_encode as pipe
from fhetpu.pipelines import resize as rz

N, T = 2048, 1 << 14


@pytest.fixture(scope="module")
def ctx():
    par = BfvParams.create(n=N, t=T)
    kg = KeyGenerator(par, seed=55)
    enc = Encryptor(par, kg.public_key(), seed=56)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(T, N)
    ev = Evaluator(par, encoder)
    return par, enc, dec, encoder, ev


def test_dp_sharded_jpeg_matches_single(ctx):
    par, enc, dec, encoder, ev = ctx
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 32, 3), dtype=np.uint8)  # 8 blocks
    from fhetpu.io import images

    blocks = np.stack(
        [images.split_blocks(img[..., c].astype(np.float64)) for c in range(3)],
        axis=1,
    )
    coeffs = encoder.encode_batch(blocks)
    cts = enc.encrypt_batch(coeffs.reshape(-1, N)).reshape(8, 3, 64, 2, par.L, N)

    single = np.asarray(pipe.make_server(ev)(jnp.asarray(cts)))

    mesh = make_mesh({"dp": 8})
    sharding = NamedSharding(mesh, P("dp"))
    x = jax.device_put(jnp.asarray(cts), sharding)
    fn = jax.jit(pipe.server_compute_fn(ev), in_shardings=sharding,
                 out_shardings=sharding)
    sharded = np.asarray(fn(x))
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.parametrize("mode", [rz.BILINEAR, rz.BICUBIC])
def test_sp_sharded_resize_halo(ctx, mode):
    par, enc, dec, encoder, ev = ctx
    H = W = 16
    H2, W2 = 8, 7
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    coeffs = encoder.encode_batch(img.astype(np.float64))
    cts = enc.encrypt_batch(coeffs.reshape(-1, N)).reshape(H, W, 3, 2, par.L, N)

    # single-device reference via resize_tile
    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    yops, xops = rz.make_fract_bundles(ev, rp, cp, mode, encryptor=None)
    single = np.asarray(
        rz.resize_tile(ev, jnp.asarray(cts), rp, cp, yops, xops, mode, plain=True)
    )  # [H2, W2, 3, 2, L, n]

    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    sharding = NamedSharding(mesh, P("sp"))
    src = jax.device_put(jnp.asarray(cts), sharding)
    out = halo.resize_sharded(ev, src, H2, W2, mode, mesh)
    np.testing.assert_array_equal(np.asarray(out), single)


def _encrypt_grid(ctx, H, W, seed=3):
    par, enc, dec, encoder, ev = ctx
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    coeffs = encoder.encode_batch(img.astype(np.float64))
    cts = enc.encrypt_batch(coeffs.reshape(-1, N)).reshape(H, W, 3, 2, par.L, N)
    return img, cts


def _single_ref(ctx, cts, H, W, H2, W2, mode):
    par, enc, dec, encoder, ev = ctx
    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    yops, xops = rz.make_fract_bundles(ev, rp, cp, mode, encryptor=None)
    return np.asarray(
        rz.resize_tile(ev, jnp.asarray(cts), rp, cp, yops, xops, mode,
                       plain=True)
    )


def test_sp_sharded_nondivisible_padding(ctx):
    """10 source rows / 7 output rows on a 4-way mesh: neither divides, the
    padded-shard plan must still be bit-exact vs single-device."""
    par, enc, dec, encoder, ev = ctx
    H, W, H2, W2 = 10, 9, 7, 5
    img, cts = _encrypt_grid(ctx, H, W)
    single = _single_ref(ctx, cts, H, W, H2, W2, rz.BILINEAR)
    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    g = halo.plan_shards(rz.axis_plan(H, H2, rz.BILINEAR), H, H2, 4)
    assert g.Hp == 12 and g.H2p == 8 and not g.gather
    out = halo.resize_sharded(ev, jnp.asarray(cts), H2, W2, rz.BILINEAR, mesh)
    assert out.shape[0] == H2
    np.testing.assert_array_equal(np.asarray(out), single)


def test_sp_sharded_gather_fallback(ctx):
    """Extreme downscale: the halo would exceed the shard height, so the
    step must all-gather the source instead of refusing."""
    par, enc, dec, encoder, ev = ctx
    H, W, H2, W2 = 32, 8, 4, 5
    img, cts = _encrypt_grid(ctx, H, W, seed=4)
    g = halo.plan_shards(rz.axis_plan(H, H2, rz.BICUBIC), H, H2, 8)
    assert g.gather  # this config must exercise the fallback
    single = _single_ref(ctx, cts, H, W, H2, W2, rz.BICUBIC)
    mesh = make_mesh({"sp": 8})
    out = halo.resize_sharded(ev, jnp.asarray(cts), H2, W2, rz.BICUBIC, mesh)
    np.testing.assert_array_equal(np.asarray(out), single)


@pytest.mark.parametrize("use_relin", [False, True])
def test_sp_sharded_encrypted_fracts(use_relin):
    """Faithful encrypted-fract ct*ct bilinear, row-sharded: decrypts to the
    same plaintext polynomials as the single-device faithful path (fract
    encryption randomness differs; the decrypted computation must not).

    t=64 keeps the ct*ct noise inside the n=2048 budget (t=2^14 at n=2048
    exhausts it -- the same regime the reference's sweep avoids; its grid
    never ran pmod=16384, cf. test_resize.py small-t faithful test)."""
    from fhetpu.bfv.crypto import KeyGenerator
    from fhetpu.bfv.evaluator import DeviceRelinKeys

    t_small = 64
    par = BfvParams.create(n=N, t=t_small)
    kg = KeyGenerator(par, seed=55)
    enc = Encryptor(par, kg.public_key(), seed=56)
    dec = Decryptor(par, kg.secret)
    encoder = FractionalEncoder(t_small, N)
    ev = Evaluator(par, encoder)
    ctx = (par, enc, dec, encoder, ev)
    H, W, H2, W2 = 8, 8, 6, 5
    img, cts = _encrypt_grid(ctx, H, W, seed=5)
    mode = rz.BILINEAR
    relin = None
    if use_relin:
        # fine digits: whole-limb (27-bit) digits add ~43 bits of keyswitch
        # noise and exhaust the 46-bit budget; dbc=8 decodes exactly
        relin = DeviceRelinKeys(kg.relin_keys(max_power=2, digit_bits=8))

    rp = rz.axis_plan(H, H2, mode)
    cp = rz.axis_plan(W, W2, mode)
    yops, xops = rz.make_fract_bundles(ev, rp, cp, mode, encryptor=enc,
                                       relin=relin)
    single = np.asarray(
        rz.resize_tile(ev, jnp.asarray(cts), rp, cp, yops, xops, mode,
                       plain=False, relin=relin)
    )
    size = single.shape[3]
    assert size == (2 if use_relin else 4)
    want = dec.decrypt_batch(single.reshape(-1, size, par.L, N))

    mesh = make_mesh({"sp": 4}, devices=jax.devices()[:4])
    out = np.asarray(
        halo.resize_sharded(ev, jnp.asarray(cts), H2, W2, mode, mesh,
                            encryptor=enc, relin=relin)
    )
    assert out.shape[3] == size
    got = dec.decrypt_batch(out.reshape(-1, size, par.L, N))
    np.testing.assert_array_equal(got, want)
