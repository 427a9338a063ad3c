"""Multi-host (DCN) validation: the engine's distributed top-k runs across
TWO separate JAX processes joined through jax.distributed — the CPU/Gloo
stand-in for multi-host TPU pods over DCN (SURVEY §2.3: "multi-host JAX
over DCN for Deep10M").

Each subprocess owns half the global device mesh; the corpus is built from
process-local shards (jax.make_array_from_process_local_data), and
``sharded_brute_force_topk`` must return the same exact global top-k on
every process.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n_procs = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=n_procs, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["DBTPU_REPO"])
from databend_tpu.parallel.distributed import sharded_brute_force_topk
from databend_tpu.parallel.mesh import DP_AXIS, SHARD_AXIS

devs = np.array(jax.devices())  # 4 global devices (2 per process)
mesh = Mesh(devs.reshape(1, -1), (DP_AXIS, SHARD_AXIS))

N, D, B, K = 4096, 32, 4, 5
rng = np.random.default_rng(0)        # same seed everywhere: global corpus
x_global = rng.standard_normal((N, D)).astype(np.float32)
q = x_global[[7, 99, 2048, 4000]] + 0.01

x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(SHARD_AXIS, None)),
    x_global[pid * (N // n_procs): (pid + 1) * (N // n_procs)])
qd = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P(None, None)))

d, i = sharded_brute_force_topk(mesh, qd, x, K, "l2", chunk_rows=1024)
ids = np.asarray(jax.device_get(i))
# exact ground truth
for j, qq in enumerate(q):
    dd = ((x_global - qq) ** 2).sum(-1)
    true = set(np.argpartition(dd, K)[:K].tolist())
    got = set(ids[j].tolist())
    assert got == true, (pid, j, got, true)
print(f"proc{pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_distributed_topk_across_two_processes(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = str(_free_port())
    env = dict(os.environ,
               DBTPU_REPO=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               JAX_PLATFORMS="cpu")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} OK" in out
