"""Extended benchmark suite — the BASELINE.md configs beyond bench.py.

Run on one TPU chip:  python benchmarks/bench_suite.py [--small]
Writes one JSON line per config; bench.py stays the driver's headline.

Configs (BASELINE.md):
  2. quantized scan: SQ-u8 int8 MXU scoring + exact f32 re-rank
  3. filtered hybrid search: vector top-k + SQL predicate through the engine
  4. BM25 text search through the engine
  5. multi-shard: per-shard top-k + all_gather merge (mesh)
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_quantized(N, D, B, K):
    """Chained device-loop measurement of the SQ-u8 serving program
    (int8 MXU matmul + fused rank key + exact f32 rerank), methodology
    identical to bench.py config 1: queries resident on device, each
    iteration's input data-depends on the previous result, one
    np.asarray at the end forces the whole chain."""
    import jax
    import jax.numpy as jnp
    from databend_tpu.ops import quantization as qz
    rng = np.random.default_rng(7)
    x = rng.standard_normal((N, D), dtype=np.float32)
    q0 = x[rng.integers(0, N, size=B)] + 0.05 * rng.standard_normal((B, D)).astype(np.float32)
    corpus = qz.encode(x)
    m = corpus.meta
    x_f32 = jax.device_put(x)
    qj = jax.device_put(q0)
    qc0, _ = qz.encode_query(q0, m)
    np.asarray(corpus.codes[0])
    S = min(4 * K, N)

    @jax.jit
    def chain_step(qc, qj, codes, rank_corr, xf):
        d, i = qz._topk_l2_device(qj, qc, codes, rank_corr, xf,
                                  K, S, m.alpha, m.offset, m.dim, True)
        # serialize iterations INSIDE the jit (eager feedback ops each cost
        # a dispatch round-trip); an int multiply-by-zero would be
        # constant-folded, so fold in the low bit itself — ranking cost is
        # code-value independent
        return d, i, qc + (i[0, 0] & 1).astype(jnp.int8)

    args = (qj, corpus.codes, corpus.rank_corr, x_f32)
    d, i, qc = chain_step(qc0, *args)
    np.asarray(d)
    iters = 100
    qc = qc0
    t = time.perf_counter()
    for _ in range(iters):
        d, i, qc = chain_step(qc, *args)
    np.asarray(d)
    dt = (time.perf_counter() - t) / iters

    d, i = qz.topk_l2(q0, corpus, K, x_f32=x_f32)  # undrifted, for recall
    ids = np.asarray(i)[:16]
    got = 0
    for j in range(16):
        diff = x - q0[j]
        dd = np.einsum("nd,nd->n", diff, diff)
        got += len(set(np.argpartition(dd, K)[:K].tolist()) & set(ids[j].tolist()))
    return {"metric": "sq8_int8_scan_topk10_qps", "value": round(B / dt, 1),
            "unit": "qps", "recall_at_10": round(got / 160, 4), "n": N}


def bench_rerank(N, D, B, K):
    """Exact-recall config: bf16 scan shortlist + f32 re-rank, CHAINED —
    methodology identical to bench.py config 1 so the two headline rows
    are directly comparable (VERDICT r1 'recall honesty' item)."""
    import jax
    import jax.numpy as jnp
    from databend_tpu.ops.topk import rerank_topk
    rng = np.random.default_rng(7)
    x = rng.standard_normal((N, D), dtype=np.float32)
    q0 = x[rng.integers(0, N, size=B)] + 0.05 * rng.standard_normal(
        (B, D)).astype(np.float32)
    dev = jax.devices()[0]
    x_bf16 = jax.device_put(x.astype(jnp.bfloat16), dev)
    norms = jax.device_put(
        (x.astype(np.float64) ** 2).sum(-1).astype(np.float32), dev)
    x_f32 = jax.device_put(x, dev)
    qj = jax.device_put(q0, dev)

    @jax.jit
    def chain_step(qb, xb, nb, xf):
        v, i = rerank_topk(qb, xb, nb, xf, K, "l2", shortlist=8 * K)
        return v, i, qb + (v[0, 0] * 0.0)

    d, i, qc = chain_step(qj, x_bf16, norms, x_f32)
    np.asarray(d)
    iters = 100
    qc = qj
    t = time.perf_counter()
    for _ in range(iters):
        d, i, qc = chain_step(qc, x_bf16, norms, x_f32)
    np.asarray(d)
    dt = (time.perf_counter() - t) / iters

    ids = np.asarray(i)[:16]
    got = 0
    for j in range(16):
        diff = x - q0[j]
        dd = np.einsum("nd,nd->n", diff, diff)
        got += len(set(np.argpartition(dd, K)[:K].tolist())
                   & set(ids[j].tolist()))
    return {"metric": "exact_rerank_topk10_qps_chained",
            "value": round(B / dt, 1), "unit": "qps",
            "recall_at_10": round(got / 160, 4), "n": N}


def bench_hybrid_sql(tmpdir, n_rows=20000, dim=64):
    """Filtered vector search through the full SQL engine."""
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.service.session import SessionContext
    from databend_tpu.types import Int64, VectorType
    rng = np.random.default_rng(3)
    c = SessionContext(data_root=tmpdir)
    c.sql(f"CREATE TABLE h (id BIGINT, grp BIGINT, emb VECTOR({dim}))"
          " ROW_PER_BLOCK='4096'")
    x = rng.standard_normal((n_rows, dim)).astype(np.float32)
    c.insert_block("h", DataBlock(
        ["id", "grp", "emb"],
        [Column.from_numpy(np.arange(n_rows, dtype=np.int64)),
         Column.from_numpy((np.arange(n_rows) % 10).astype(np.int64)),
         Column.from_numpy(x, VectorType(dim))]))
    c.sql("CREATE VECTOR INDEX hv ON h(emb) ASYNC distance='l2'")
    qlit = "[" + ",".join(f"{v:.5f}" for v in x[42]) + "]"
    sql = (f"SELECT id FROM h WHERE grp = 2"
           f" ORDER BY l2_distance(emb, {qlit}) LIMIT 10")
    c.sql(sql)  # warm
    iters = 10
    t = time.perf_counter()
    for _ in range(iters):
        r = c.sql(sql)
    dt = (time.perf_counter() - t) / iters
    return {"metric": "hybrid_filtered_knn_sql_latency_ms",
            "value": round(dt * 1e3, 2), "unit": "ms", "rows": n_rows}


def bench_bm25_sql(tmpdir, n_docs=20000):
    from databend_tpu.service.session import SessionContext
    rng = np.random.default_rng(5)
    words = [f"tok{i}" for i in range(2000)] + ["foxtrot"] * 3
    c = SessionContext(data_root=tmpdir)
    c.sql("CREATE TABLE d (id BIGINT, body VARCHAR) ROW_PER_BLOCK='8192'")
    c.sql("CREATE INVERTED INDEX di ON d(body)")
    batch = []
    for i in range(n_docs):
        doc = " ".join(rng.choice(words, size=12))
        batch.append(f"({i}, '{doc}')")
        if len(batch) == 5000:
            c.sql("INSERT INTO d VALUES " + ",".join(batch))
            batch = []
    if batch:
        c.sql("INSERT INTO d VALUES " + ",".join(batch))
    sql = ("SELECT id FROM d WHERE match(body, 'foxtrot tok7')"
           " ORDER BY score() DESC LIMIT 10")
    c.sql(sql)
    iters = 10
    t = time.perf_counter()
    for _ in range(iters):
        c.sql(sql)
    dt = (time.perf_counter() - t) / iters
    return {"metric": "bm25_match_sql_latency_ms",
            "value": round(dt * 1e3, 2), "unit": "ms", "docs": n_docs}


def bench_multishard(N, D, B, K):
    """Mesh-sharded search; on one real chip this exercises the collective
    program with shard=1 (the 8-way variant runs on the virtual CPU mesh
    in CI; the driver dry-runs it via __graft_entry__.dryrun_multichip)."""
    import jax
    from databend_tpu.parallel import (make_mesh, query_sharding, shard_rows,
                                       sharded_brute_force_topk)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((N, D), dtype=np.float32)
    q0 = x[rng.integers(0, N, size=B)]
    mesh = make_mesh(jax.device_count())
    x_dev, n_valid = shard_rows(x, mesh)
    q_dev = jax.device_put(q0, query_sharding(mesh))
    d, i = sharded_brute_force_topk(mesh, q_dev, x_dev, K, "l2")
    np.asarray(d)
    iters = 20
    t = time.perf_counter()
    for _ in range(iters):
        d, i = sharded_brute_force_topk(mesh, q_dev, x_dev, K, "l2")
    np.asarray(d)
    dt = (time.perf_counter() - t) / iters
    return {"metric": "sharded_exact_topk10_qps",
            "value": round(B / dt, 1), "unit": "qps",
            "shards": int(mesh.shape["shard"]), "n": N}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CI-sized shapes (CPU-safe)")
    a = ap.parse_args()
    import tempfile
    if a.small:
        N, D, B, K = 20000, 64, 32, 10
    else:
        N, D, B, K = 1_000_000, 128, 256, 10
    print(json.dumps(bench_quantized(N, D, B, K)), flush=True)
    print(json.dumps(bench_rerank(N, D, B, K)), flush=True)
    print(json.dumps(bench_hybrid_sql(tempfile.mkdtemp(), 20000, 64)), flush=True)
    print(json.dumps(bench_bm25_sql(tempfile.mkdtemp(), 20000)), flush=True)
    print(json.dumps(bench_multishard(min(N, 262144), D, B, K)), flush=True)


if __name__ == "__main__":
    main()
