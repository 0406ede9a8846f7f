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
