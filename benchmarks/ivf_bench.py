"""Big-shard KNN serving: CLUSTER BY k-means routing vs flat scan.

The TPU-first answer to the reference's >262k-rows-per-shard HNSW regime
(VERDICT item 6): rows are k-means-sorted into blocks at write time
(CLUSTER BY emb — reference TransformVectorCluster), each block carries
centroid+radius stats, and the pruner drops blocks whose score domain
cannot reach the global top-k (reference vector_stat_score_domain,
vector_index_pruner.rs:544-617). Surviving blocks are scored by ONE
stacked exact MXU scan. This is IVF re-derived at block granularity:
routing = centroid distances, cells = blocks, nprobe = adaptive (exact-
safe: a block is dropped only when its score lower bound exceeds the
k-covering threshold), so recall is 1.0 BY CONSTRUCTION — no graph, no
ef knob, no recall cliff.

Usage: python benchmarks/ivf_bench.py [--rows 1000000] [--dim 128]
"""

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(c, name, x, clustered, rpb):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import VectorType
    n, d = x.shape
    cluster = " CLUSTER BY (emb)" if clustered else ""
    c.sql(f"CREATE TABLE {name} (id BIGINT, emb VECTOR({d}),"
          f" ASYNC VECTOR INDEX {name}_v (emb) distance='l2')"
          f"{cluster} ROW_PER_BLOCK='{rpb}'")
    t0 = time.perf_counter()
    step = 262144
    for s in range(0, n, step):
        e = min(s + step, n)
        c.insert_block(name, DataBlock(
            ["id", "emb"],
            [Column.from_numpy(np.arange(s, e, dtype=np.int64)),
             Column.from_numpy(x[s:e], VectorType(d))]))
    return time.perf_counter() - t0


def measure(c, name, x, queries, k=10):
    qlats = []
    ids_all = []
    sqls = []
    for q in queries:
        qlit = "[" + ",".join(f"{v:.6f}" for v in q) + "]"
        sqls.append(f"SELECT id FROM {name} ORDER BY l2_distance(emb, {qlit})"
                    f" LIMIT {k}")
    for sql in sqls:  # warm pass: compile every touched block shape
        c.sql(sql)
    for sql in sqls:
        t0 = time.perf_counter()
        r = c.sql(sql).rows()
        qlats.append(time.perf_counter() - t0)
        ids_all.append([row[0] for row in r])
    # recall vs exact ground truth
    got = 0
    for q, ids in zip(queries, ids_all):
        diff = x - q
        dd = np.einsum("nd,nd->n", diff, diff)
        true_ids = set(np.argpartition(dd, k)[:k].tolist())
        got += len(true_ids & set(ids))
    lat = sorted(qlats)[len(qlats) // 2]
    return {"recall_at_10": got / (len(queries) * k),
            "median_ms": round(lat * 1e3, 2),
            "qps_single_stream": round(1.0 / lat, 1)}


def pruning_counts(c, name, q):
    """blocks before/after the vector stats prune for one query."""
    from databend_tpu.sql.binder import Binder
    from databend_tpu.sql.parser import parse_sql
    qlit = "[" + ",".join(f"{v:.6f}" for v in q) + "]"
    stmt = parse_sql(f"SELECT id FROM {name}"
                     f" ORDER BY l2_distance(emb, {qlit}) LIMIT 10")
    plan = Binder(c).bind_query(stmt.query)
    scan = plan
    while not hasattr(scan, "pushdown"):
        scan = scan.children()[0]
    t = c.table(name)
    parts, stats = t.read_partitions(scan.pushdown)
    return {"blocks_total": stats.blocks_before,
            "blocks_after_stats_prune": stats.blocks_vector_stats_after,
            "blocks_in_topk": stats.blocks_after}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--rpb", type=int, default=65536)
    ap.add_argument("--queries", type=int, default=30)
    a = ap.parse_args()

    from databend_tpu.service.session import SessionContext
    rng = np.random.default_rng(7)
    # clusterable data: gaussian mixture (what CLUSTER BY exists for)
    n_centers = 64
    centers = 4.0 * rng.standard_normal((n_centers, a.dim)).astype(np.float32)
    assign = rng.integers(0, n_centers, size=a.rows)
    x = (centers[assign]
         + rng.standard_normal((a.rows, a.dim)).astype(np.float32))
    queries = x[rng.integers(0, a.rows, size=a.queries)] + 0.05 * \
        rng.standard_normal((a.queries, a.dim)).astype(np.float32)

    for clustered in (False, True):
        c = SessionContext(data_root=tempfile.mkdtemp())
        name = "big"
        bt = build(c, name, x, clustered, a.rpb)
        res = measure(c, name, x, queries)
        res.update(pruning_counts(c, name, queries[0]))
        res.update({"metric": "bigshard_knn_clustered" if clustered
                    else "bigshard_knn_flat",
                    "rows": a.rows, "dim": a.dim,
                    "build_s": round(bt, 1)})
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
