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


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_init_and_global_reduce(tmp_path):
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
                [sys.executable, "-c", CHILD % REPO, str(pid)],
                env=e, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"DIST_OK {pid}" in out, out
