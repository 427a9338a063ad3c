"""ClickBench "hits" subset harness — mirrors the reference's
benchmark/hits/queries (43 files) on a synthetic hits-shaped corpus.

Reference: benchmark/hits/{create.sql,queries/} + benchmark_local.sh.
The subset below keeps the reference queries' exact shapes (17 queries:
Q00-Q05, Q07-Q09, Q12-Q14, Q16, Q21, Q25, Q27, Q31); data is synthetic (no ClickBench download in
this environment) with ClickBench-like skew. Every query's result is
verified against pandas before timing.

Run: python benchmarks/hits.py [--rows 1000000]
Prints one JSON line per query: {"query", "ms", "rows"}.
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

QUERIES = {
    "q00": "SELECT COUNT(*) FROM hits",
    "q01": "SELECT COUNT(*) FROM hits WHERE AdvEngineID <> 0",
    "q02": ("SELECT SUM(AdvEngineID), COUNT(*), AVG(ResolutionWidth)"
            " FROM hits"),
    "q03": "SELECT AVG(UserID) FROM hits",
    "q07": ("SELECT AdvEngineID, COUNT(*) FROM hits WHERE AdvEngineID <> 0"
            " GROUP BY AdvEngineID ORDER BY COUNT(*) DESC"),
    "q08": ("SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits"
            " GROUP BY RegionID ORDER BY u DESC LIMIT 10"),
    "q12": ("SELECT SearchPhrase, COUNT(*) AS c FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY SearchPhrase"
            " ORDER BY c DESC LIMIT 10"),
    "q13": ("SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY SearchPhrase"
            " ORDER BY u DESC LIMIT 10"),
    "q21": ("SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits"
            " WHERE URL LIKE '%google%' AND SearchPhrase <> ''"
            " GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10"),
    "q27": ("SELECT CounterID, AVG(length(URL)) AS l, COUNT(*) AS c"
            " FROM hits WHERE URL <> '' GROUP BY CounterID"
            " HAVING COUNT(*) > 1000 ORDER BY l DESC LIMIT 25"),
    "q04": "SELECT COUNT(DISTINCT UserID) FROM hits",
    "q05": "SELECT COUNT(DISTINCT SearchPhrase) FROM hits",
    "q09": ("SELECT RegionID, SUM(AdvEngineID), COUNT(*) AS c,"
            " AVG(ResolutionWidth), COUNT(DISTINCT UserID) FROM hits"
            " GROUP BY RegionID ORDER BY c DESC LIMIT 10"),
    "q14": ("SELECT RegionID, SearchPhrase, COUNT(*) AS c FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY RegionID, SearchPhrase"
            " ORDER BY c DESC LIMIT 10"),
    "q16": ("SELECT UserID, SearchPhrase, COUNT(*) FROM hits"
            " GROUP BY UserID, SearchPhrase ORDER BY COUNT(*) DESC LIMIT 10"),
    "q25": ("SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''"
            " ORDER BY SearchPhrase LIMIT 10"),
    "q31": ("SELECT UserID, RegionID, COUNT(*) AS c, SUM(AdvEngineID),"
            " AVG(ResolutionWidth) FROM hits WHERE SearchPhrase <> ''"
            " GROUP BY UserID, RegionID ORDER BY c DESC LIMIT 10"),
}


def make_hits(n, rng):
    phrases = np.array(["", "", "", "weather", "news today", "google maps",
                        "cat videos", "python", "flights", "hotels"])
    urls = np.array([f"http://{'google' if i % 7 == 0 else 'example'}"
                     f".com/p{i % 97}" for i in range(128)])
    return {
        "AdvEngineID": rng.choice([0, 0, 0, 0, 1, 2, 3], size=n),
        "ResolutionWidth": rng.choice([1024, 1280, 1366, 1920], size=n),
        "UserID": rng.integers(1, n // 4 + 2, size=n),
        "RegionID": rng.integers(1, 60, size=n),
        "CounterID": rng.integers(1, 40, size=n),
        "SearchPhrase": phrases[rng.integers(0, len(phrases), size=n)],
        "URL": urls[rng.integers(0, len(urls), size=n)],
    }


def verify(df, name, got):
    """Cross-check one query against pandas."""
    if name == "q00":
        return [(len(df),)] == got
    if name == "q01":
        return [(int((df.AdvEngineID != 0).sum()),)] == got
    if name == "q02":
        want = (int(df.AdvEngineID.sum()), len(df),
                float(df.ResolutionWidth.mean()))
        g = got[0]
        return g[0] == want[0] and g[1] == want[1] \
            and abs(g[2] - want[2]) < 1e-6
    if name == "q03":
        return abs(got[0][0] - float(df.UserID.mean())) < 1e-6
    if name == "q07":
        want = df[df.AdvEngineID != 0].groupby("AdvEngineID").size() \
            .sort_values(ascending=False)
        return [int(r[1]) for r in got] == [int(v) for v in want.values]
    if name == "q08":
        want = df.groupby("RegionID").UserID.nunique() \
            .sort_values(ascending=False).head(10)
        return sorted(int(r[1]) for r in got) == sorted(int(v) for v in want.values)
    if name in ("q12", "q13"):
        sub = df[df.SearchPhrase != ""]
        agg = (sub.groupby("SearchPhrase").size() if name == "q12"
               else sub.groupby("SearchPhrase").UserID.nunique())
        want = agg.sort_values(ascending=False).head(10)
        return sorted(int(r[1]) for r in got) == sorted(int(v) for v in want.values)
    if name == "q21":
        sub = df[df.URL.str.contains("google") & (df.SearchPhrase != "")]
        want = sub.groupby("SearchPhrase").size().sort_values(ascending=False).head(10)
        return sorted(int(r[2]) for r in got) == sorted(int(v) for v in want.values)
    if name == "q27":
        sub = df[df.URL != ""]
        g = sub.groupby("CounterID").agg(
            l=("URL", lambda s: s.str.len().mean()), c=("URL", "size"))
        want = g[g.c > 1000].sort_values("l", ascending=False).head(25)
        return len(got) == len(want)
    if name == "q04":
        return got == [(int(df.UserID.nunique()),)]
    if name == "q05":
        return got == [(int(df.SearchPhrase.nunique()),)]
    if name == "q09":
        want = df.groupby("RegionID").size().sort_values(ascending=False).head(10)
        return sorted(int(r[2]) for r in got) == sorted(int(v) for v in want.values)
    if name == "q14":
        sub = df[df.SearchPhrase != ""]
        want = sub.groupby(["RegionID", "SearchPhrase"]).size() \
            .sort_values(ascending=False).head(10)
        return sorted(int(r[2]) for r in got) == sorted(int(v) for v in want.values)
    if name == "q16":
        want = df.groupby(["UserID", "SearchPhrase"]).size() \
            .sort_values(ascending=False).head(10)
        return sorted(int(r[2]) for r in got) == sorted(int(v) for v in want.values)
    if name == "q25":
        sub = df[df.SearchPhrase != ""].SearchPhrase.sort_values().head(10)
        return [r[0] for r in got] == list(sub.values)
    if name == "q31":
        sub = df[df.SearchPhrase != ""]
        want = sub.groupby(["UserID", "RegionID"]).size() \
            .sort_values(ascending=False).head(10)
        return sorted(int(r[2]) for r in got) == sorted(int(v) for v in want.values)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    a = ap.parse_args()
    import pandas as pd

    from databend_tpu import SessionContext
    rng = np.random.default_rng(42)
    data = make_hits(a.rows, rng)
    df = pd.DataFrame(data)

    ctx = SessionContext(data_root=tempfile.mkdtemp())
    ctx.sql("CREATE TABLE hits (AdvEngineID INT, ResolutionWidth INT,"
            " UserID BIGINT, RegionID INT, CounterID INT,"
            " SearchPhrase VARCHAR, URL VARCHAR)")
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Int32, Int64, String
    cols, names = [], []
    for k, v in data.items():
        names.append(k)
        if v.dtype.kind in "iu":
            cols.append(Column.from_numpy(
                v.astype(np.int64 if k == "UserID" else np.int32)))
        else:
            cols.append(Column.from_pylist(list(v), String))
    t0 = time.time()
    ctx.insert_block("hits", DataBlock(names, cols, a.rows))
    load_s = time.time() - t0
    print(json.dumps({"query": "load", "ms": round(load_s * 1e3, 1),
                      "rows": a.rows}), flush=True)

    for name, sql in QUERIES.items():
        got = ctx.sql(sql).rows()  # warm + verify
        ok = verify(df, name, got)
        t0 = time.time()
        ctx.sql(sql)
        ms = (time.time() - t0) * 1e3
        print(json.dumps({"query": name, "ms": round(ms, 1),
                          "verified": bool(ok)}), flush=True)
        if not ok:
            print(f"MISMATCH in {name}: {got[:3]}", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
