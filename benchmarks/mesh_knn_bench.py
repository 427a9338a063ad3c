"""Deep10M-shaped mesh-sharded KNN — BASELINE config 5 beyond shard=1
(VERDICT r2 item 2 done-criteria).

A 10M x 96 corpus (Deep1B's head slice shape) row-sharded over an
8-device mesh; per-shard MXU scoring + all_gather k-select in ONE XLA
program (`sharded_brute_force_topk`). On this host the mesh is 8 virtual
CPU devices (one real TPU chip in CI), so the numbers evidence that the
full-scale sharded program compiles, fits, and returns exact answers —
per-device latency on real ICI-connected chips scales from the
single-chip bench.py numbers.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/mesh_knn_bench.py [--rows 10000000 --dim 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from databend_tpu.parallel.distributed import sharded_brute_force_topk
    from databend_tpu.parallel.mesh import (make_mesh, query_sharding,
                                            shard_rows)

    mesh = make_mesh()
    s = mesh.shape["shard"]
    rng = np.random.default_rng(5)
    # generate shard-by-shard to bound peak host memory
    t0 = time.perf_counter()
    x = np.empty((a.rows, a.dim), np.float32)
    step = max(a.rows // 16, 1)
    for lo in range(0, a.rows, step):
        hi = min(lo + step, a.rows)
        x[lo:hi] = rng.standard_normal((hi - lo, a.dim), dtype=np.float32)
    gen_s = time.perf_counter() - t0

    picks = rng.integers(0, a.rows, a.batch)
    q = x[picks] + 0.05 * rng.standard_normal(
        (a.batch, a.dim)).astype(np.float32)

    t0 = time.perf_counter()
    x_dev, n_valid = shard_rows(x, mesh)
    q_dev = jax.device_put(q, query_sharding(mesh))
    up_s = time.perf_counter() - t0

    # bf16 halves HBM traffic on TPU; on the CPU stand-in it is software-
    # emulated (measured: the 10M scan did not finish in 28 min) -> f32
    use_bf16 = jax.devices()[0].platform == "tpu"
    t0 = time.perf_counter()
    d, ids = sharded_brute_force_topk(mesh, q_dev, x_dev, a.k,
                                      metric="l2", bf16=use_bf16,
                                      n_valid=n_valid)
    ids_np = np.asarray(ids)
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    d, ids = sharded_brute_force_topk(mesh, q_dev, x_dev, a.k,
                                      metric="l2", bf16=use_bf16,
                                      n_valid=n_valid)
    ids_np = np.asarray(ids)
    warm_s = time.perf_counter() - t0

    # exact recall check on the batch (numpy ground truth)
    hit = 0
    for bi in range(a.batch):
        diff = x - q[bi]
        dd = np.einsum("nd,nd->n", diff, diff)
        true = set(np.argpartition(dd, a.k)[:a.k].tolist())
        hit += len(true & set(ids_np[bi].tolist()))
    recall = hit / (a.batch * a.k)

    out = {
        "metric": "mesh_knn_deep10m_shape",
        "rows": a.rows, "dim": a.dim, "devices": s,
        "batch": a.batch, "k": a.k,
        "recall_at_k": recall,
        "gen_s": round(gen_s, 1), "upload_s": round(up_s, 1),
        "first_batch_s": round(first_s, 2),
        "warm_batch_s": round(warm_s, 2),
        "warm_ms_per_query": round(warm_s * 1e3 / a.batch, 1),
        "bf16": use_bf16,
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mesh_knn_deep10m.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
