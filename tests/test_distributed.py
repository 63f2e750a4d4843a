"""Multi-process comm backend (parallel/distributed.py): a real 2-process
jax.distributed cluster over localhost TCP — the DCN-equivalent of the
reference's torch.distributed.launch + NCCL bring-up (baselines_habitat.md:63-69).
Each process contributes one CPU device; a dp-sharded global reduction must see
both processes' shards.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import jax, jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from embodied_clip_tpu.parallel.distributed import initialize_distributed, global_mesh

ok = initialize_distributed()
assert ok, "expected multi-process initialization"
assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

mesh = global_mesh(dp=2)
local = np.full((1, 4), float(pid + 1), np.float32)

from jax.experimental import multihost_utils
arr = multihost_utils.host_local_array_to_global_array(local, mesh, P("dp"))

total = jax.jit(
    jnp.sum,
    in_shardings=NamedSharding(mesh, P("dp")),
    out_shardings=NamedSharding(mesh, P()),
)(arr)
# fully replicated output: every process holds the global sum locally
got = float(np.asarray(total.addressable_shards[0].data))
assert got == 12.0, got  # 4*1 + 4*2
print("WORKER_OK", pid)
"""


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            ECT_COORDINATOR=f"127.0.0.1:{port}",
            ECT_NUM_PROCESSES="2",
            ECT_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":") if p and "axon" not in p
        ) or os.getcwd()
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out
