"""Multi-host plumbing smoke test: 2-process jax.distributed on CPU.

The reference has no distribution at all (SURVEY.md 2.3: its "network" is a
file handoff).  fhetpu's multi-host story is parallel/distributed.py:
``init_distributed`` joins the processes into one jax.distributed job and
``global_block_sharding`` builds a mesh over the *global* device set; this
test actually exercises both across two OS processes with a cross-process
collective reduction (gloo), not just single-process plumbing.

Each child clears PALLAS_AXON_POOL_IPS so the driver's sitecustomize does
not pre-register/initialize the axon PJRT backend -- jax.distributed must
initialize before any backend is created.
"""

import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %r)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fhetpu.parallel.distributed import (
        init_distributed, global_block_sharding, distribute_ciphertexts)

    assert init_distributed(), "env vars set, must initialize"
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()
    assert pid == int(sys.argv[1]), (pid, sys.argv[1])
    mesh, sharding = global_block_sharding()
    assert mesh.shape["dp"] == jax.device_count() >= 2

    # each process contributes its own local shard of a "ciphertext batch";
    # a jitted global reduction must see both processes' data
    n_local = jax.local_device_count()
    local = np.full((n_local, 8), float(pid + 1), dtype=np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local)
    from jax.sharding import NamedSharding, PartitionSpec as P
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    want = 8.0 * (1 + 2) * (jax.device_count() // 2)
    assert float(total) == want, (float(total), want)
    print("DIST_OK", pid, flush=True)
    """
)


# A REAL ciphertext pipeline op under jax.distributed (VERDICT.md round-2
# item 7): each of the 2 processes contributes one encrypted 8x8 RGB block
# as its process-local shard, the dp-sharded JPEG server op (YCC + DCT) runs
# as ONE global jit over both processes' devices, and every process checks
# its local output shard is bit-identical to the single-device computation.
CHILD_CT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %r)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fhetpu.parallel.distributed import (
        init_distributed, global_block_sharding)

    assert init_distributed(), "env vars set, must initialize"
    pid = jax.process_index()
    mesh, sharding = global_block_sharding()

    from fhetpu.bfv.crypto import Encryptor, KeyGenerator
    from fhetpu.bfv.encoder import FractionalEncoder
    from fhetpu.bfv.evaluator import Evaluator
    from fhetpu.bfv.params import BfvParams
    from fhetpu.io import images
    from fhetpu.pipelines import jpeg_encode as pipe

    N, T = 2048, 1 << 14
    par = BfvParams.create(n=N, t=T)
    kg = KeyGenerator(par, seed=55)
    enc = Encryptor(par, kg.public_key(), seed=56)
    encoder = FractionalEncoder(T, N)
    ev = Evaluator(par, encoder)

    # deterministic seeds -> both processes derive the SAME ciphertext batch
    # host-side (the trusted client role); 2 blocks, one per process
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    blocks = np.stack(
        [images.split_blocks(img[..., c].astype(np.float64)) for c in range(3)],
        axis=1,
    )
    cts = enc.encrypt_batch(
        encoder.encode_batch(blocks).reshape(-1, N)
    ).reshape(2, 3, 64, 2, par.L, N)

    # single-device oracle on this process's local device
    single = np.asarray(pipe.make_server(ev)(jnp.asarray(cts)))

    # global dp-sharded run: this process contributes block [pid]
    arr = jax.make_array_from_process_local_data(sharding, cts[pid : pid + 1])
    assert arr.shape[0] == 2, arr.shape
    fn = jax.jit(pipe.server_compute_fn(ev), in_shardings=sharding,
                 out_shardings=sharding)
    out = fn(arr)
    for shard in out.addressable_shards:
        blk = shard.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(shard.data)[0], single[blk])
    print("DIST_CT_OK", pid, flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_processes(child_src, ok_token, timeout=300, attempts=3):
    # _free_port closes the probe socket before the coordinator child binds
    # it -- a TOCTOU that can flake if another process grabs the port in
    # between (ADVICE.md round-2), so bind failures retry with a new port
    last = None
    for _ in range(attempts):
        port = _free_port()
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep axon PJRT out of children
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            XLA_FLAGS="",  # children use 1 real local CPU device each
        )
        procs = []
        for pid in range(2):
            e = dict(env, JAX_PROCESS_ID=str(pid))
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", child_src % REPO, str(pid)],
                    env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True,
                )
            )
        outs = []
        for pid, p in enumerate(procs):
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            for pid, out in enumerate(outs):
                assert f"{ok_token} {pid}" in out, out
            return
        last = "\n".join(outs)
        if "bind" not in last.lower() and "address" not in last.lower():
            break  # a real failure, not the port race
    raise AssertionError(f"distributed children failed:\n{last}")


def test_two_process_init_and_global_reduce(tmp_path):
    _run_two_processes(CHILD, "DIST_OK", timeout=180)


def test_two_process_ciphertext_jpeg_op(tmp_path):
    _run_two_processes(CHILD_CT, "DIST_CT_OK", timeout=600)
