"""Apples-to-apples HNSW build-quality table (VERDICT r3 item 5).

Same data, same N, same m/ef_construct, same ef_search sweep: the TPU
bulk-round build (index/hnsw/build.py) vs the from-scratch CPU
incremental build (native/hnsw_baseline.cpp). The CPU binary dumps its
corpus/queries (`./hnsw_baseline N 128 10 200 16 100 0 <prefix>`), this
script builds the TPU graph on those exact vectors and reports recall@10
against an exact MXU scan at each ef.

Usage:
  ./native/hnsw_baseline 100000 128 10 200 16 100 0 /tmp/h100k   # CPU rows
  python benchmarks/hnsw_quality_bench.py --prefix /tmp/h100k --n 100000
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nq", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--efs", default="40,100,200,400,800,1600")
    ap.add_argument("--refine-rounds", type=int, default=0)
    a = ap.parse_args()

    import jax.numpy as jnp

    from databend_tpu.index.hnsw import build_hnsw, hnsw_search

    x = np.fromfile(f"{a.prefix}.data.f32", dtype=np.float32).reshape(
        a.n, a.dim)
    q = np.fromfile(f"{a.prefix}.queries.f32", dtype=np.float32).reshape(
        a.nq, a.dim)

    # exact ground truth on device (chunked MXU scan)
    x_dev = jnp.asarray(x)
    q_dev = jnp.asarray(q)
    d2 = (jnp.sum(q_dev * q_dev, 1)[:, None]
          - 2.0 * q_dev @ x_dev.T + jnp.sum(x_dev * x_dev, 1)[None, :])
    truth = np.asarray(jnp.argsort(d2, axis=1)[:, : a.k])

    t0 = time.time()
    g = build_hnsw(x, m=16, ef_construct=100, metric="l2")
    build_s = time.time() - t0

    for ef in [int(e) for e in a.efs.split(",")]:
        t0 = time.time()
        _, ids = hnsw_search(g, x_dev, q, k=a.k, ef=ef)
        search_s = time.time() - t0
        ids = np.asarray(ids)
        hit = sum(len(set(ids[i].tolist()) & set(truth[i].tolist()))
                  for i in range(a.nq))
        print(json.dumps({
            "metric": "tpu_hnsw_bulk_build", "n": a.n, "dim": a.dim,
            "m": 16, "ef_construct": 100, "ef_search": ef,
            "build_s": round(build_s, 1),
            "qps": round(a.nq / search_s, 1),
            "recall_at_10": round(hit / (a.nq * a.k), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
