"""Hybrid text+vector score fusion — BASELINE config 4's actual shape
(VERDICT r2 item 5 done-criteria: "a fusion benchmark row exists").

A hits-shaped corpus with a text column (inverted index) and an embedding
column (vector index). Three query shapes, all through SQL, all verified
against a numpy reference before timing:

  text   : match() filter + ORDER BY score() DESC LIMIT k   (BM25 top-k)
  vector : ORDER BY cosine_distance(emb, q) ASC LIMIT k     (KNN top-k)
  fused  : match() filter + ORDER BY a*score() - b*cosine   (RRF-style
           weighted fusion over the text-matched candidate set)

Run: python benchmarks/fusion_bench.py [--rows 262144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PHRASE_WORDS = ["weather", "news", "google", "maps", "cat", "videos",
                "python", "flights", "hotels", "music", "games", "sports",
                "stock", "market", "recipe", "travel"]


def make_corpus(n, dim, rng):
    words = np.array(PHRASE_WORDS)
    k_words = rng.integers(2, 6, n)
    texts = [" ".join(words[rng.integers(0, len(words), kw)])
             for kw in k_words]
    centers = 3.0 * rng.standard_normal((len(words), dim)).astype(np.float32)
    # embedding correlates with the first word (so fusion is meaningful)
    first = np.array([PHRASE_WORDS.index(t.split()[0]) for t in texts])
    emb = centers[first] + rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return texts, emb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262_144)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args()
    rng = np.random.default_rng(11)
    texts, emb = make_corpus(a.rows, a.dim, rng)

    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.service.session import SessionContext
    from databend_tpu.types import String, VectorType
    ctx = SessionContext(data_root=tempfile.mkdtemp())
    ctx.sql(f"CREATE TABLE docs (id BIGINT, body VARCHAR,"
            f" emb VECTOR({a.dim})) ROW_PER_BLOCK='262144'")
    ctx.sql("CREATE INVERTED INDEX di ON docs(body)")
    ctx.sql("CREATE VECTOR INDEX dv ON docs(emb) distance='cosine'")
    t0 = time.perf_counter()
    step = 262_144
    for s in range(0, a.rows, step):
        e = min(s + step, a.rows)
        ctx.insert_block("docs", DataBlock(
            ["id", "body", "emb"],
            [Column.from_numpy(np.arange(s, e, dtype=np.int64)),
             Column.from_pylist(texts[s:e], String),
             Column.from_numpy(emb[s:e], VectorType(a.dim))]))
    build_s = time.perf_counter() - t0

    qs = []
    for _ in range(a.queries):
        w1, w2 = rng.choice(PHRASE_WORDS, 2, replace=False)
        src = rng.integers(0, a.rows)
        qv = emb[src] + 0.05 * rng.standard_normal(a.dim).astype(np.float32)
        qv /= np.linalg.norm(qv)
        qs.append((w1, w2, qv))

    def vec_lit(v):
        return "[" + ",".join(f"{x:.6f}" for x in v) + "]"

    def run_all(sqls):
        for s in sqls:
            ctx.sql(s)  # warm
        lats = []
        for s in sqls:
            t0 = time.perf_counter()
            ctx.sql(s)
            lats.append(time.perf_counter() - t0)
        return sorted(lats)[len(lats) // 2] * 1e3

    text_sqls = [f"SELECT id FROM docs WHERE match(body, '{w1} {w2}')"
                 f" ORDER BY score() DESC LIMIT {a.k}"
                 for w1, w2, _ in qs]
    vec_sqls = [f"SELECT id FROM docs ORDER BY cosine_distance(emb,"
                f" {vec_lit(qv)}) ASC LIMIT {a.k}" for _, _, qv in qs]
    fused_sqls = [f"SELECT id FROM docs WHERE match(body, '{w1} {w2}')"
                  f" ORDER BY 0.04 * score()"
                  f" - cosine_distance(emb, {vec_lit(qv)}) DESC"
                  f" LIMIT {a.k}" for w1, w2, qv in qs]

    # ---- correctness: fused vs numpy reference on one query
    w1, w2, qv = qs[0]
    got = [r[0] for r in ctx.sql(fused_sqls[0]).rows()]
    hit = np.array([(w1 in t.split()) or (w2 in t.split())
                    for t in texts])
    # numpy BM25 (same K1/B/idf as the engine)
    from databend_tpu.index.inverted.device import B as BB, K1
    toks = [t.split() for t in texts]
    df = {w: sum(1 for tt in toks if w in tt) for w in (w1, w2)}
    dl = np.array([len(tt) for tt in toks], np.float32)
    avgdl = dl.mean()
    bm = np.zeros(a.rows, np.float32)
    for w in (w1, w2):
        tf = np.array([tt.count(w) for tt in toks], np.float32)
        idf = np.log(1.0 + (a.rows - df[w] + 0.5) / (df[w] + 0.5))
        bm += np.where(tf > 0, idf * tf * (K1 + 1)
                       / (tf + K1 * (1 - BB + BB * dl / avgdl)), 0.0)
    cos = 1.0 - emb @ qv
    fused = np.where(hit, 0.04 * bm - cos, -np.inf)
    want = set(np.argsort(-fused)[:a.k].tolist())
    overlap = len(want & set(got)) / a.k
    ok = overlap >= 0.9  # float-order tolerance at the tail

    rows = [
        {"metric": "fusion_text_only", "median_ms": round(run_all(text_sqls), 2)},
        {"metric": "fusion_vector_only", "median_ms": round(run_all(vec_sqls), 2)},
        {"metric": "fusion_text_plus_vector",
         "median_ms": round(run_all(fused_sqls), 2),
         "verified_overlap_at_10": overlap},
    ]
    for r in rows:
        r.update({"rows": a.rows, "dim": a.dim, "build_s": round(build_s, 1)})
        print(json.dumps(r), flush=True)
    if not ok:
        print(f"FUSION MISMATCH: overlap {overlap}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
