"""BM25 scoring benchmark: host numpy vs the device segment-sum program.

BASELINE config 4 target (VERDICT r1 item 5): >=10x the r1 4.2 ms/query
on a large corpus. Builds one max-size block (262,144 docs, Zipf-ish term
distribution), then times match()-style scoring through both paths.

Run: python benchmarks/bm25_bench.py [--docs 262144]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(n_docs: int, vocab: int = 5000, seed: int = 3):
    """CSR postings built directly (vectorized) — the writer's output
    shape without the per-doc tokenizer loop, so the bench measures
    scoring, not corpus synthesis."""
    from databend_tpu.index.inverted.reader import InvertedBlockReader
    rng = np.random.default_rng(seed)
    # Zipf-ish document terms
    avg_len = 12
    doc_len = rng.integers(6, 2 * avg_len, n_docs).astype(np.int32)
    total = int(doc_len.sum())
    tok = (rng.zipf(1.3, total) % vocab).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), doc_len)
    # per (term, doc) tf: group by (term, doc)
    key = tok * n_docs + doc_of
    uniq, counts = np.unique(key, return_counts=True)
    term_of = (uniq // n_docs).astype(np.int64)
    doc_ids_flat = (uniq % n_docs).astype(np.int32)
    order = np.argsort(term_of, kind="stable")
    term_sorted = term_of[order]
    doc_ids = doc_ids_flat[order]
    tfs = counts[order].astype(np.int32)
    terms = [f"t{i:05d}" for i in range(vocab)]
    offsets = np.zeros(vocab + 1, np.int64)
    cnt = np.bincount(term_sorted, minlength=vocab)
    np.cumsum(cnt, out=offsets[1:])
    return InvertedBlockReader(terms, offsets, doc_ids, tfs, doc_len,
                               n_docs, "english", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=262_144)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from databend_tpu.index.inverted.device import DeviceBM25

    reader = build_corpus(args.docs)
    import jax
    print(f"-- corpus: {args.docs} docs, nnz={len(reader.doc_ids)}, "
          f"platform={jax.devices()[0].platform}")

    queries = [[f"t{i:05d}", f"t{j:05d}"] for i, j in
               [(1, 7), (3, 20), (2, 50), (10, 99), (5, 31)]]

    # host path
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for q in queries:
            groups = [[reader.term_id(t)] for t in q]
            _avg = float(reader.doc_len.mean())
            # call the numpy internals directly (bypassing device routing)
            InvertedHost = type(reader)
            import databend_tpu.index.inverted.reader as R
            saved = R.DEVICE_MIN_DOCS
            R.DEVICE_MIN_DOCS = 1 << 60
            reader.bm25_scores(groups, "OR")
            R.DEVICE_MIN_DOCS = saved
    host_ms = (time.perf_counter() - t0) * 1e3 / (args.iters * len(queries))

    # device path: per-query sync (latency) and queued dispatch (throughput)
    dev = DeviceBM25(reader)
    for q in queries:  # warm compiles
        dev.score([[reader.term_id(t)] for t in q], "OR")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for q in queries:
            dev.score([[reader.term_id(t)] for t in q], "OR")
    dev_ms = (time.perf_counter() - t0) * 1e3 / (args.iters * len(queries))

    # serving path: top-k selected on device, only k pairs transferred.
    # Per-call sync (latency incl. transport RTT):
    for q in queries:
        dev.top_k([[reader.term_id(t)] for t in q], 10, "OR")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        for q in queries:
            dev.top_k([[reader.term_id(t)] for t in q], 10, "OR")
    topk_ms = (time.perf_counter() - t0) * 1e3 / (args.iters * len(queries))

    # Queued throughput (the realistic serving pattern: dispatch a batch,
    # sync once; on local hardware per-call latency converges to this):
    import jax
    rng = np.random.default_rng(0)
    distinct = [[f"t{rng.integers(0, 200):05d}",
                 f"t{rng.integers(0, 5000):05d}"]
                for _ in range(args.iters * len(queries))]
    for q in distinct[:3]:
        dev.top_k([[reader.term_id(t)] for t in q], 10, "OR")
    t0 = time.perf_counter()
    import databend_tpu.index.inverted.device as D
    outs = []
    for q in distinct:
        groups = [[reader.term_id(t)] for t in q]
        outs.append(dev._dispatch_topk(groups, 10, "OR"))
    jax.block_until_ready([o for o in outs if o is not None])
    pipe_ms = (time.perf_counter() - t0) * 1e3 / len(distinct)

    print(f"host   numpy BM25 (full scores): {host_ms:8.3f} ms/query")
    print(f"device full-score round trip:    {dev_ms:8.3f} ms/query")
    print(f"device top-k(10) per-call sync:  {topk_ms:8.3f} ms/query")
    print(f"device top-k(10) queued:         {pipe_ms:8.3f} ms/query   "
          f"({host_ms / pipe_ms:.1f}x vs host)")

    # batched top-k: B queries per ONE sort (r2 verdict item 5) — the
    # per-query sort that lost to host at B=1 amortizes across the batch
    for bsz in (8, 32):
        batches = [distinct[i:i + bsz]
                   for i in range(0, len(distinct) - bsz + 1, bsz)]
        bg = [[[[reader.term_id(t)] for t in q] for q in bt]
              for bt in batches]
        for b in bg:  # warm every bucketed shape
            dev.top_k_batch(b, 10, "OR")
        t0 = time.perf_counter()
        for b in bg:
            dev.top_k_batch(b, 10, "OR")
        batch_ms = (time.perf_counter() - t0) * 1e3 / (len(bg) * bsz)
        print(f"device top-k(10) batch B={bsz:3d}:   {batch_ms:8.3f} "
              f"ms/query   ({host_ms / batch_ms:.1f}x vs host)")

    # dense doc-major impact layout (round 4): BM25 as pure dense
    # compare-multiply-reduce — no sort/scatter/gather at query time
    from databend_tpu.index.inverted.device import ImpactBM25
    imp = ImpactBM25.try_create(reader)
    if imp is None:
        print("impact layout: block too ragged, skipped")
        return
    for bsz in (1, 8, 32, 128):
        batches = [distinct[i:i + bsz]
                   for i in range(0, len(distinct) - bsz + 1, bsz)]
        bg = [[[[reader.term_id(t)] for t in q] for q in bt]
              for bt in batches]
        imp.top_k_batch(bg[0], 10, "OR")  # warm
        t0 = time.perf_counter()
        for bq in bg:
            imp.top_k_batch(bq, 10, "OR")
        ms = (time.perf_counter() - t0) * 1e3 / (len(bg) * bsz)
        print(f"impact top-k(10) batch B={bsz:3d}:   {ms:8.3f} "
              f"ms/query   ({host_ms / ms:.1f}x vs host)")


if __name__ == "__main__":
    main()
