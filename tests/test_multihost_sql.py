"""One SQL query over a 2-process DCN mesh (VERDICT r3 item 4).

Two separate query processes register in the SAME meta service; the
registered topology elects the jax.distributed coordinator and assigns
process ids (parallel/multihost.join_cluster_mesh — the analog of the
reference building its per-query node list from meta,
clusters/cluster.rs:620). Both processes then execute the SAME SQL
statements with `enable_distributed_execution=1`; the shard axis of the
default mesh spans both processes, so the psum merge / ordered top-n /
sharded-KNN collectives run over DCN (CPU Gloo stand-in). Results are
asserted identical to host ground truth ON BOTH processes.
"""

import os
import socket
import subprocess
import sys

WORKER = r"""
import os, sys, time, socket, uuid
my_port = sys.argv[1]; root = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["DBTPU_REPO"])
import numpy as np

# 1. register this query node in the shared meta service; topology must
#    come from the registry, not argv (reference cluster discovery).
#    NodeInfo is built by hand: touching jax.device_count() here would
#    initialize the backend before jax.distributed.initialize.
from databend_tpu.meta.kv import MetaStore
from databend_tpu.meta.cluster import ClusterDiscovery, NodeInfo
meta = MetaStore(os.path.join(root, "meta.db"))
node = NodeInfo(node_id=f"{socket.gethostname()}-{os.getpid()}-"
                        f"{uuid.uuid4().hex[:6]}",
                address=f"localhost:{my_port}", version="test",
                cpu_count=1, device_count=2, cluster_id="default")
ClusterDiscovery(meta).register(node)

# 2. join the cluster mesh defined by the registry
from databend_tpu.parallel.multihost import join_cluster_mesh
mesh, proc_id = join_cluster_mesh(meta, node.node_id, 2)
assert jax.device_count() == 4, jax.device_count()

from databend_tpu.service.session import SessionContext
from databend_tpu.expression import Column, DataBlock
from databend_tpu.types import VectorType
ctx = SessionContext(root)

rng = np.random.default_rng(0)   # same data everywhere (shared storage)
n = 4000
k_col = rng.integers(0, 50, n)
v_col = rng.integers(0, 1000, n)
emb = rng.standard_normal((500, 8)).astype(np.float32)

dup_k = rng.integers(0, 50, 120)          # NON-unique join keys
dup_w = rng.integers(1, 10, 120)

flag = os.path.join(root, "ddl_done")
if proc_id == 0:
    ctx.sql("CREATE TABLE t (k INT, v BIGINT)")
    ctx.insert_block("t", DataBlock(
        ["k", "v"], [Column.from_numpy(k_col.astype(np.int32)),
                     Column.from_numpy(v_col.astype(np.int64))]))
    ctx.sql("CREATE TABLE vt (id BIGINT, emb VECTOR(8))")
    ctx.sql("CREATE VECTOR INDEX vt_v ON vt(emb) ASYNC distance='l2'")
    ctx.insert_block("vt", DataBlock(
        ["id", "emb"], [Column.from_numpy(np.arange(500, dtype=np.int64)),
                        Column.from_numpy(emb, VectorType(8))]))
    ctx.sql("CREATE TABLE dup (k INT, w BIGINT)")
    ctx.insert_block("dup", DataBlock(
        ["k", "w"], [Column.from_numpy(dup_k.astype(np.int32)),
                     Column.from_numpy(dup_w.astype(np.int64))]))
    with open(flag, "w") as f:
        f.write("1")
else:
    for _ in range(600):
        if os.path.exists(flag):
            break
        time.sleep(0.1)
    else:
        raise TimeoutError("DDL barrier")

ctx.sql("SET enable_distributed_execution = 1")
ctx.sql("SET vector_host_scan_max_rows = 0")

# --- distributed GROUP BY + HAVING + ORDER BY LIMIT (psum merge fragment)
r1 = ctx.sql("SELECT k, sum(v) AS s, count(*) AS c FROM t GROUP BY k "
             "HAVING sum(v) > 30000 ORDER BY s DESC LIMIT 5").rows()
import pandas as pd
df = pd.DataFrame({"k": k_col, "v": v_col})
g = df.groupby("k").agg(s=("v", "sum"), c=("v", "size")).reset_index()
g = g[g.s > 30000].sort_values("s", ascending=False).head(5)
exp1 = [(int(r.k), int(r.s), int(r.c)) for r in g.itertuples()]
assert [(int(a), int(b), int(c)) for a, b, c in r1] == exp1, (proc_id, r1, exp1)

# --- distributed KNN (row-sharded corpus, per-shard top-k + all_gather)
q = rng.standard_normal(8).astype(np.float32)
qlit = "[" + ",".join(f"{x:.6f}" for x in q) + "]"
r2 = [r[0] for r in ctx.sql(
    f"SELECT id FROM vt ORDER BY l2_distance(emb, {qlit}) LIMIT 5").rows()]
d = np.linalg.norm(emb - q, axis=1)
exp2 = np.argsort(d)[:5].tolist()
assert r2 == exp2, (proc_id, r2, exp2)

# --- shuffle (Normal) exchange join: NON-unique build keys force the
#     all_to_all hash-partitioned ShuffleJoin over the DCN mesh
from databend_tpu.utils.metrics import METRICS
snap0 = METRICS.snapshot()
r3 = ctx.sql("SELECT t.v, dup.w FROM t JOIN dup ON t.k = dup.k"
             " WHERE t.v >= 990 ORDER BY t.v, dup.w").rows()
snap1 = METRICS.snapshot()
assert snap1.get("shuffle_join_queries", 0) > snap0.get(
    "shuffle_join_queries", 0), "shuffle-exchange join did not fire"
jd = pd.DataFrame({"k": k_col, "v": v_col}).merge(
    pd.DataFrame({"k": dup_k, "w": dup_w}), on="k")
jd = jd[jd.v >= 990].sort_values(["v", "w"])
exp3 = [(int(r.v), int(r.w)) for r in jd.itertuples()]
assert [(int(a), int(b)) for a, b in r3] == exp3, (proc_id, len(r3))

# --- range-partition (sample-sort) exchange: ORDER BY without LIMIT
snap0 = snap1
r4 = ctx.sql("SELECT v FROM t ORDER BY v").rows()
snap1 = METRICS.snapshot()
assert snap1.get("distributed_fullsort_queries", 0) > snap0.get(
    "distributed_fullsort_queries", 0), "fullsort exchange did not fire"
assert [x[0] for x in r4] == sorted(v_col.tolist()), proc_id

# --- partition-hash window exchange
snap0 = snap1
r5 = ctx.sql("SELECT k, v, sum(v) OVER (PARTITION BY k) AS sv FROM t"
             " ORDER BY k, v LIMIT 10").rows()
snap1 = METRICS.snapshot()
assert snap1.get("distributed_window_queries", 0) > snap0.get(
    "distributed_window_queries", 0), "window exchange did not fire"
wd = pd.DataFrame({"k": k_col, "v": v_col})
wd["sv"] = wd.groupby("k").v.transform("sum")
wd = wd.sort_values(["k", "v"]).head(10)
exp5 = [(int(r.k), int(r.v), int(r.sv)) for r in wd.itertuples()]
assert [(int(a), int(b), int(c)) for a, b, c in r5] == exp5, proc_id

print(f"proc{proc_id} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_sql_query_spans_two_processes(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    root = tmp_path / "data"
    root.mkdir()
    env = dict(os.environ,
               DBTPU_REPO=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               JAX_PLATFORMS="cpu")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(_free_port()), str(root)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for _ in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    joined = "".join(outs)
    assert "proc0 OK" in joined and "proc1 OK" in joined, joined
