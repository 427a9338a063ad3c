"""SQL-path vector serving: prepared/batched KNN vs the literal-SQL path.

VERDICT r3 item 1: the 287k-QPS headline was kernel-only; through
`ctx.sql` a KNN query paid parse+bind+prune+dispatch per request
(39-88 ms/query at 1M). This bench measures the *product* path that
closes that gap: `ctx.prepare("SELECT id FROM t ORDER BY
l2_distance(emb, ?) LIMIT 10")` + `execute_batch(Q)` — bind once, serve
B queries as pipelined MXU top-k programs (service/prepared.py).

Rows reported:
  - literal ctx.sql single-stream (the r3 baseline path)
  - prepared single-stream EXECUTE (one query per call; tunnel-RTT bound)
  - prepared batch B=256 (one dispatch per call, sync per call)
  - prepared batch B=4096 (16 pipelined chunks per call — the serving
    analog of the kernel bench's chained loop)
plus recall@10 vs exact f32 ground truth.

Usage: python benchmarks/sql_serving_bench.py [--rows 1000000] [--dim 128]
Writes benchmarks/sql_serving.json.
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


def build(c, n, d):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import VectorType
    rng = np.random.default_rng(7)
    x = rng.standard_normal((n, d), dtype=np.float32)
    c.sql(f"CREATE TABLE st (id BIGINT, emb VECTOR({d})) "
          f"ROW_PER_BLOCK='262144'")
    c.sql("CREATE VECTOR INDEX st_v ON st(emb) ASYNC distance='l2'")
    t0 = time.perf_counter()
    step = 262144
    for s in range(0, n, step):
        e = min(s + step, n)
        c.insert_block("st", DataBlock(
            ["id", "emb"],
            [Column.from_numpy(np.arange(s, e, dtype=np.int64)),
             Column.from_numpy(x[s:e], VectorType(d))]))
    return x, time.perf_counter() - t0, rng


def recall_at_10(x, Q, outs):
    got = 0
    for q, res in zip(Q, outs):
        ids = [r[0] for r in res.rows()]
        diff = x - q
        dd = np.einsum("nd,nd->n", diff, diff)
        true = set(np.argpartition(dd, 10)[:10].tolist())
        got += len(true & set(ids))
    return got / (len(Q) * 10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    from databend_tpu.service.session import SessionContext
    c = SessionContext(tempfile.mkdtemp())
    x, build_s, rng = build(c, args.rows, args.dim)
    print(f"built {args.rows}x{args.dim} in {build_s:.1f}s", flush=True)

    k = 10
    sql_q = "SELECT id FROM st ORDER BY l2_distance(emb, ?) LIMIT 10"
    ps = c.prepare(sql_q)
    assert ps._knn is not None

    # --- recall + warm compile (B=256 and B=4096 chunk programs)
    Qr = rng.standard_normal((16, args.dim), dtype=np.float32)
    outs = ps.execute_batch(np.repeat(Qr, 16, axis=0))  # B=256 warm
    rec = recall_at_10(x, Qr, outs[::16])
    print(f"recall@10 = {rec:.4f}", flush=True)

    out = {"n": args.rows, "dim": args.dim, "k": k, "recall_at_10": rec,
           "build_s": round(build_s, 1)}

    # --- literal ctx.sql single-stream (the r3 baseline path)
    lits = []
    for i in range(8):
        q = rng.standard_normal(args.dim, dtype=np.float32)
        qlit = "[" + ",".join(f"{v:.6f}" for v in q) + "]"
        sql = (f"SELECT id FROM st ORDER BY l2_distance(emb, {qlit}) "
               f"LIMIT 10")
        if i < 2:
            c.sql(sql)  # warm
        t0 = time.perf_counter()
        c.sql(sql)
        lits.append(time.perf_counter() - t0)
    lit_ms = sorted(lits)[len(lits) // 2] * 1e3
    out["literal_sql_median_ms"] = round(lit_ms, 2)
    out["literal_sql_qps"] = round(1e3 / lit_ms, 1)
    print(f"literal ctx.sql: {lit_ms:.1f} ms/query "
          f"({1e3/lit_ms:.1f} QPS)", flush=True)

    # --- prepared single-stream (per-call sync: RTT-bound)
    ps.execute(rng.standard_normal(args.dim, dtype=np.float32))  # warm B=1
    lats = []
    for _ in range(16):
        q = rng.standard_normal(args.dim, dtype=np.float32)
        t0 = time.perf_counter()
        ps.execute(q)
        lats.append(time.perf_counter() - t0)
    one_ms = sorted(lats)[len(lats) // 2] * 1e3
    out["prepared_single_median_ms"] = round(one_ms, 2)
    out["prepared_single_qps"] = round(1e3 / one_ms, 1)
    print(f"prepared EXECUTE: {one_ms:.2f} ms/query "
          f"({1e3/one_ms:.1f} QPS)", flush=True)

    # --- batch serving; fresh random queries per call (the tunnel
    # memoizes identical input buffers)
    for B, reps in ((256, 8), (4096, 3)):
        batches = [rng.standard_normal((B, args.dim), dtype=np.float32)
                   for _ in range(reps + 1)]
        ps.execute_batch(batches[0])  # warm this shape
        t0 = time.perf_counter()
        n_served = 0
        for Qb in batches[1:]:
            res = ps.execute_batch(Qb)
            n_served += len(res)
        dt = time.perf_counter() - t0
        qps = n_served / dt
        out[f"prepared_batch{B}_qps"] = round(qps, 1)
        out[f"prepared_batch{B}_ms_per_batch"] = round(dt / reps * 1e3, 2)
        print(f"prepared batch B={B}: {qps:,.0f} QPS "
              f"({dt/reps*1e3:.1f} ms/batch)", flush=True)

    # --- bulk-block serving (ONE result block with query_index; no
    # per-query result-set construction — the high-throughput shape).
    # exact=True -> lax.top_k full sort (recall 1.0);
    # exact=False -> lax.approx_min_k (the kernel bench's selector)
    for exact in (True, False):
        tag = "exact" if exact else "approx"
        for B, reps in ((4096, 3), (16384, 2)):
            batches = [rng.standard_normal((B, args.dim), dtype=np.float32)
                       for _ in range(reps + 1)]
            ps.execute_batch_block(batches[0], exact)  # warm
            t0 = time.perf_counter()
            n_served = 0
            for Qb in batches[1:]:
                res = ps.execute_batch_block(Qb, exact)
                n_served += B
                assert res.block.num_rows == B * k
            dt = time.perf_counter() - t0
            qps = n_served / dt
            out[f"prepared_block{B}_{tag}_qps"] = round(qps, 1)
            print(f"prepared block B={B} {tag}: {qps:,.0f} QPS "
                  f"({dt/reps*1e3:.1f} ms/batch)", flush=True)

    # recall of the approx selector at this corpus (reported, not assumed)
    Qa = np.repeat(Qr, 256, axis=0)  # 16 distinct queries padded to 4096
    res = ps.execute_batch_block(Qa, False)
    rows = res.rows()
    got = 0
    for j in range(16):
        ids = {rows[j * 256 * k + r][1] for r in range(k)}
        diff = x - Qr[j]
        dd = np.einsum("nd,nd->n", diff, diff)
        got += len(set(np.argpartition(dd, k)[:k].tolist()) & ids)
    out["approx_recall_at_10"] = got / (16 * k)
    print(f"approx recall@10 = {out['approx_recall_at_10']:.4f}",
          flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sql_serving.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
