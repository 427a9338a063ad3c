"""Measured crossover for the single-chip device scan-aggregate route.

Runs the same GROUP BY query through the host path and the device route
(pipeline/device_scan_agg.py) at several table sizes, on whatever
jax.devices() exposes (the real TPU in CI). Emits one JSON line per
measurement; the RESULTS.md table is generated from these.

Usage: python benchmarks/device_route_bench.py [--sizes 100000,1000000,...]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SQL = ("select k, sum(a) s1, sum(a*(1-b/100)) s2, count(*) c,"
       " min(a) mn, max(d) mx from t"
       " where d <= 11500 group by k order by k")


def build(ctx, n: int, seed: int = 7) -> None:
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Float64, Int32, Int64, String
    rng = np.random.default_rng(seed)
    ctx.sql("create table t (k string, d int, a double, b double)")
    step = 1_000_000
    for start in range(0, n, step):
        m = min(step, n - start)
        cols = [
            Column.from_pylist(list(rng.choice(list("ABCDEFGH"), m)), String),
            Column(Int64, rng.integers(10000, 12000, m).astype(np.int64)),
            Column(Float64, (rng.random(m) * 1000).round(2)),
            Column(Float64, (rng.integers(0, 11, m) / 1.0)),
        ]
        ctx.insert_block("t", DataBlock(["k", "d", "a", "b"], cols, m))


def median_ms(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,300000,1000000,3000000,10000000")
    a = ap.parse_args()
    from databend_tpu import SessionContext

    for n in [int(s) for s in a.sizes.split(",")]:
        ctx = SessionContext(data_root=tempfile.mkdtemp())
        build(ctx, n)
        ctx.sql("set device_scan_agg_min_rows = 0")
        ctx.sql("set enable_device_local_execution = 0")
        ctx.sql(SQL)
        host = median_ms(lambda: ctx.sql(SQL))
        ctx.sql("set enable_device_local_execution = 1")
        t0 = time.time()
        dev_rows = ctx.sql(SQL).rows()
        cold = (time.time() - t0) * 1e3
        dev = median_ms(lambda: ctx.sql(SQL))
        ctx.sql("set enable_device_local_execution = 0")
        host_rows = ctx.sql(SQL).rows()
        match = all(
            all((abs(x - y) < 1e-9 * max(1, abs(x))
                 if isinstance(x, float) else x == y)
                for x, y in zip(hr, dr))
            for hr, dr in zip(host_rows, dev_rows))
        print(json.dumps({
            "rows": n, "host_ms": round(host, 1),
            "device_ms": round(dev, 1), "device_cold_ms": round(cold, 1),
            "speedup": round(host / dev, 2), "match": bool(match),
        }), flush=True)


if __name__ == "__main__":
    main()
