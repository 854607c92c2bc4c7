"""Multi-host (multi-process) plumbing: real cross-process collectives on
CPU, no pod required.

Spawns two coordinated processes (jax.distributed, each with 2 virtual CPU
devices), builds the DCN-aware (host, ev) mesh of parallel/distributed.py,
and runs a shard_map with the event-parallel pattern (psum over 'ev'
intra-host, psum over 'slice' across hosts) on globally-sharded arrays.
This is the initialization + mesh-layout path a TPU pod deployment uses;
only the interconnect underneath differs.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.environ["BF_REPO"])
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from better_flow_tpu.parallel.distributed import (
        initialize, make_host_mesh, process_local_slice_range,
    )

    assert initialize()   # from BF_* env vars
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    mesh = make_host_mesh()
    assert mesh.devices.shape == (2, 2)
    # inner axis must be intra-process (the ICI axis of the recipe)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    # Globally-sharded array: each process contributes its local block.
    pid = jax.process_index()
    local = np.full((1, 8), float(pid + 1), np.float32)
    sharding = NamedSharding(mesh, P("slice", "ev"))
    garr = jax.make_array_from_process_local_data(sharding, local, (2, 8))

    def body(x):
        s_ev = jax.lax.psum(jnp.sum(x), "ev")        # intra-host
        s_all = jax.lax.psum(s_ev, "slice")          # across hosts (DCN)
        return x * 0 + s_all

    out = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P("slice", "ev"),
                      out_specs=P("slice", "ev"), check_vma=False)
    )(garr)
    # sum over all = 1*8 + 2*8 = 24 on every shard
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out.addressable_shards[0].data)), 24.0
    )

    lo, hi = process_local_slice_range(10)
    assert (lo, hi) == ((0, 5) if pid == 0 else (5, 10))
    print(f"proc {pid} OK", flush=True)
""")


@pytest.mark.skipif(os.environ.get("BF_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_mesh_and_collectives(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            BF_REPO=repo,
            BF_COORDINATOR=f"127.0.0.1:{port}",
            BF_NUM_PROCESSES="2",
            BF_PROCESS_ID=str(pid),
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
