"""ClickBench A/B: host path vs device scan-agg route, per query, in ONE
process (same caches, same box state) — the methodology that replaced a
two-process comparison whose uniform speedups turned out to be CPU
contention noise. Emits one JSON line per query with both timings and
whether the route engaged."""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import hits  # noqa: E402


def main():
    from databend_tpu import SessionContext
    from databend_tpu.utils.metrics import METRICS
    rng = np.random.default_rng(42)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    do_verify = "--verify" in sys.argv
    data = hits.make_hits(n, rng)
    ctx = SessionContext(data_root=tempfile.mkdtemp())
    hits.load(ctx, data, n)
    df = None
    if do_verify:
        import pandas as pd
        df = pd.DataFrame(data)
    rows = []
    th = td = 0.0

    def routed_count():
        s = METRICS.snapshot()
        return (s.get("device_scan_agg_queries", 0)
                + s.get("device_join_agg_queries", 0))

    for name, sql in hits.QUERIES.items():
        ctx.sql("set enable_device_local_execution = 0")
        got_h = ctx.sql(sql).rows()
        t0 = time.time()
        ctx.sql(sql)
        h = (time.time() - t0) * 1e3
        ctx.sql("set enable_device_local_execution = 1")
        before = routed_count()
        got_d = ctx.sql(sql).rows()  # warm route (cache build)
        t0 = time.time()
        ctx.sql(sql)
        d = (time.time() - t0) * 1e3
        routed = routed_count() > before
        ver = None
        if df is not None:
            ver = bool(hits.verify(df, name, got_h)) and                 bool(hits.verify(df, name, got_d))
            assert ver, f"{name} failed pandas verification"
        th += h
        td += d
        rec = {"query": name, "host_ms": round(h, 1),
               "routed_ms": round(d, 1), "device": bool(routed)}
        if ver is not None:
            rec["verified"] = ver
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    summary = {"rows": n, "host_total_s": round(th / 1000, 2),
               "routed_total_s": round(td / 1000, 2)}
    print(json.dumps(summary), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"hits_ab_{n // 1_000_000}m.json")
    json.dump({"queries": rows, **summary}, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
