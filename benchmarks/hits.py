"""ClickBench "hits" suite — ALL 43 reference queries (Q00-Q42).

Reference: benchmark/hits/{create.sql,queries/00.sql..42.sql} +
benchmark_local.sh. Query shapes are kept verbatim from the reference
files (modulo whitespace); data is synthetic (no ClickBench download in
this environment) with ClickBench-like skew over the 25 columns the
queries touch. Every query's result is verified against pandas before
timing; ties in ORDER BY <agg> DESC LIMIT n are compared on the sorted
aggregate values.

Run: python benchmarks/hits.py [--rows 1000000]
Prints one JSON line per query: {"query", "ms", "verified"}.
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
    "q04": "SELECT COUNT(DISTINCT UserID) FROM hits",
    "q05": "SELECT COUNT(DISTINCT SearchPhrase) FROM hits",
    "q06": "SELECT MIN(EventDate), MAX(EventDate) FROM hits",
    "q07": ("SELECT AdvEngineID, COUNT(*) FROM hits WHERE AdvEngineID <> 0"
            " GROUP BY AdvEngineID ORDER BY COUNT(*) DESC"),
    "q08": ("SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits"
            " GROUP BY RegionID ORDER BY u DESC LIMIT 10"),
    "q09": ("SELECT RegionID, SUM(AdvEngineID), COUNT(*) AS c,"
            " AVG(ResolutionWidth), COUNT(DISTINCT UserID) FROM hits"
            " GROUP BY RegionID ORDER BY c DESC LIMIT 10"),
    "q10": ("SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits"
            " WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel"
            " ORDER BY u DESC LIMIT 10"),
    "q11": ("SELECT MobilePhone, MobilePhoneModel,"
            " COUNT(DISTINCT UserID) AS u FROM hits"
            " WHERE MobilePhoneModel <> ''"
            " GROUP BY MobilePhone, MobilePhoneModel"
            " ORDER BY u DESC LIMIT 10"),
    "q12": ("SELECT SearchPhrase, COUNT(*) AS c FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY SearchPhrase"
            " ORDER BY c DESC LIMIT 10"),
    "q13": ("SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY SearchPhrase"
            " ORDER BY u DESC LIMIT 10"),
    "q14": ("SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase"
            " ORDER BY c DESC LIMIT 10"),
    "q15": ("SELECT UserID, COUNT(*) FROM hits GROUP BY UserID"
            " ORDER BY COUNT(*) DESC LIMIT 10"),
    "q16": ("SELECT UserID, SearchPhrase, COUNT(*) FROM hits"
            " GROUP BY UserID, SearchPhrase ORDER BY COUNT(*) DESC LIMIT 10"),
    "q17": ("SELECT UserID, SearchPhrase, COUNT(*) FROM hits"
            " GROUP BY UserID, SearchPhrase LIMIT 10"),
    "q18": ("SELECT UserID, extract(minute FROM EventTime) AS m,"
            " SearchPhrase, COUNT(*) FROM hits"
            " GROUP BY UserID, m, SearchPhrase"
            " ORDER BY COUNT(*) DESC LIMIT 10"),
    "q19": "SELECT UserID FROM hits WHERE UserID = 435090932899640449",
    "q20": "SELECT COUNT(*) FROM hits WHERE URL LIKE '%google%'",
    "q21": ("SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits"
            " WHERE URL LIKE '%google%' AND SearchPhrase <> ''"
            " GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10"),
    "q22": ("SELECT SearchPhrase, MIN(URL), MIN(Title), COUNT(*) AS c,"
            " COUNT(DISTINCT UserID) FROM hits"
            " WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%'"
            " AND SearchPhrase <> '' GROUP BY SearchPhrase"
            " ORDER BY c DESC LIMIT 10"),
    "q23": ("SELECT * FROM hits WHERE URL LIKE '%google%'"
            " ORDER BY EventTime LIMIT 10"),
    "q24": ("SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''"
            " ORDER BY EventTime LIMIT 10"),
    "q25": ("SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''"
            " ORDER BY SearchPhrase LIMIT 10"),
    "q26": ("SELECT SearchPhrase FROM hits WHERE SearchPhrase <> ''"
            " ORDER BY EventTime, SearchPhrase LIMIT 10"),
    "q27": ("SELECT CounterID, AVG(length(URL)) AS l, COUNT(*) AS c"
            " FROM hits WHERE URL <> '' GROUP BY CounterID"
            " HAVING COUNT(*) > 10000 ORDER BY l DESC LIMIT 25"),
    "q28": (r"SELECT REGEXP_REPLACE(Referer,"
            r" '^https?://(?:www\.)?([^/]+)/.*$', '\1') AS k,"
            " AVG(length(Referer)) AS l, COUNT(*) AS c, MIN(Referer)"
            " FROM hits WHERE Referer <> '' GROUP BY k"
            " HAVING COUNT(*) > 10000 ORDER BY l DESC LIMIT 25"),
    "q29": ("SELECT " + ", ".join(
        f"SUM(ResolutionWidth + {i})" if i else "SUM(ResolutionWidth)"
        for i in range(90)) + " FROM hits"),
    "q30": ("SELECT SearchEngineID, ClientIP, COUNT(*) AS c,"
            " SUM(IsRefresh), AVG(ResolutionWidth) FROM hits"
            " WHERE SearchPhrase <> '' GROUP BY SearchEngineID, ClientIP"
            " ORDER BY c DESC LIMIT 10"),
    "q31": ("SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(IsRefresh),"
            " AVG(ResolutionWidth) FROM hits WHERE SearchPhrase <> ''"
            " GROUP BY WatchID, ClientIP ORDER BY c DESC LIMIT 10"),
    "q32": ("SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(IsRefresh),"
            " AVG(ResolutionWidth) FROM hits"
            " GROUP BY WatchID, ClientIP ORDER BY c DESC LIMIT 10"),
    "q33": ("SELECT URL, COUNT(*) AS c FROM hits GROUP BY URL"
            " ORDER BY c DESC LIMIT 10"),
    "q34": ("SELECT 1, URL, COUNT(*) AS c FROM hits GROUP BY 1, URL"
            " ORDER BY c DESC LIMIT 10"),
    "q35": ("SELECT ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3,"
            " COUNT(*) AS c FROM hits"
            " GROUP BY ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3"
            " ORDER BY c DESC LIMIT 10"),
    "q36": ("SELECT URL, COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-01'"
            " AND EventDate <= '2013-07-31' AND DontCountHits = 0"
            " AND IsRefresh = 0 AND URL <> '' GROUP BY URL"
            " ORDER BY PageViews DESC LIMIT 10"),
    "q37": ("SELECT Title, COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-01'"
            " AND EventDate <= '2013-07-31' AND DontCountHits = 0"
            " AND IsRefresh = 0 AND Title <> '' GROUP BY Title"
            " ORDER BY PageViews DESC LIMIT 10"),
    "q38": ("SELECT URL, COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-01'"
            " AND EventDate <= '2013-07-31' AND IsRefresh = 0"
            " AND IsLink <> 0 AND IsDownload = 0 GROUP BY URL"
            " ORDER BY PageViews DESC LIMIT 10 OFFSET 1000"),
    "q39": ("SELECT TraficSourceID, SearchEngineID, AdvEngineID,"
            " CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0)"
            " THEN Referer ELSE '' END AS Src, URL AS Dst,"
            " COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-01'"
            " AND EventDate <= '2013-07-31' AND IsRefresh = 0"
            " GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst"
            " ORDER BY PageViews DESC LIMIT 10 OFFSET 1000"),
    "q40": ("SELECT URLHash, EventDate, COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-01'"
            " AND EventDate <= '2013-07-31' AND IsRefresh = 0"
            " AND TraficSourceID IN (-1, 6) AND RefererHash = 3594120000172545465"
            " GROUP BY URLHash, EventDate ORDER BY PageViews DESC"
            " LIMIT 10 OFFSET 100"),
    "q41": ("SELECT WindowClientWidth, WindowClientHeight,"
            " COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-01'"
            " AND EventDate <= '2013-07-31' AND IsRefresh = 0"
            " AND DontCountHits = 0 AND URLHash = 2868770270353813622"
            " GROUP BY WindowClientWidth, WindowClientHeight"
            " ORDER BY PageViews DESC LIMIT 10 OFFSET 10000"),
    "q42": ("SELECT DATE_TRUNC('minute', EventTime) AS M,"
            " COUNT(*) AS PageViews FROM hits"
            " WHERE CounterID = 62 AND EventDate >= '2013-07-14'"
            " AND EventDate <= '2013-07-15' AND IsRefresh = 0"
            " AND DontCountHits = 0 GROUP BY DATE_TRUNC('minute', EventTime)"
            " ORDER BY DATE_TRUNC('minute', EventTime) LIMIT 10 OFFSET 1000"),
}

# q27/q28 thresholds scaled 100000 -> 10000 (1M synthetic rows vs the
# 100M-row ClickBench corpus; same selectivity ratio).


def make_hits(n, rng):
    import pandas as pd
    phrases = np.array(["", "", "", "weather", "news today", "google maps",
                        "cat videos", "python", "flights", "hotels"])
    urls = np.array([f"http://{'google' if i % 7 == 0 else 'example'}"
                     f".com/p{i % 97}" for i in range(128)])
    titles = np.array(["", "Google Search", "Example Page", "News",
                       "Maps - Google", "Shop"])
    referers = np.array([""] + [f"https://www.ref{i % 11}.org/path/{i}"
                                for i in range(40)])
    phones = np.array(["", "", "iPhone", "Galaxy", "Pixel", "Nokia 3310"])
    # EventTime over two weeks of July 2013; EventDate = its date
    t0 = int(pd.Timestamp("2013-07-01").timestamp())
    secs = t0 + rng.integers(0, 31 * 86400, size=n)
    data = {
        "WatchID": rng.integers(1, n // 2 + 2, size=n),
        "Title": titles[rng.integers(0, len(titles), size=n)],
        "EventTime": secs,                      # epoch seconds (host side)
        "EventDate": secs // 86400,             # epoch days
        "CounterID": rng.choice(
            np.array([62, 1, 7, 13, 25, 31, 40, 55]), size=n,
            p=[0.3, .1, .1, .1, .1, .1, .1, .1]),
        "ClientIP": rng.integers(1, 5000, size=n),
        "RegionID": rng.integers(1, 60, size=n),
        "UserID": rng.integers(1, n // 4 + 2, size=n),
        "URL": urls[rng.integers(0, len(urls), size=n)],
        "Referer": referers[rng.integers(0, len(referers), size=n)],
        "IsRefresh": (rng.random(n) < 0.1).astype(np.int64),
        "SearchEngineID": rng.integers(0, 4, size=n),
        "SearchPhrase": phrases[rng.integers(0, len(phrases), size=n)],
        "AdvEngineID": rng.choice([0, 0, 0, 0, 1, 2, 3], size=n),
        "ResolutionWidth": rng.choice([1024, 1280, 1366, 1920], size=n),
        "MobilePhone": rng.integers(0, 5, size=n),
        "MobilePhoneModel": phones[rng.integers(0, len(phones), size=n)],
        "TraficSourceID": rng.integers(-1, 9, size=n),
        "DontCountHits": (rng.random(n) < 0.05).astype(np.int64),
        "IsLink": (rng.random(n) < 0.2).astype(np.int64),
        "IsDownload": (rng.random(n) < 0.05).astype(np.int64),
        "URLHash": rng.choice(
            np.array([2868770270353813622, 123, 456, 789, 1011], np.int64),
            size=n),
        "RefererHash": rng.choice(
            np.array([3594120000172545465, 111, 222], np.int64), size=n),
        "WindowClientWidth": rng.choice([800, 1024, 1280, 1680], size=n),
        "WindowClientHeight": rng.choice([600, 768, 1024], size=n),
    }
    return data


INT64_COLS = {"WatchID", "UserID", "URLHash", "RefererHash", "EventTime",
              "IsRefresh", "DontCountHits", "IsLink", "IsDownload"}


def load(ctx, data, n):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Date, String, Timestamp
    cols, names, ddl = [], [], []
    for k, v in data.items():
        names.append(k)
        if k == "EventTime":
            ddl.append(f"{k} TIMESTAMP")
            cols.append(Column.from_numpy(
                (v * 1_000_000).astype(np.int64), Timestamp))
        elif k == "EventDate":
            ddl.append(f"{k} DATE")
            cols.append(Column.from_numpy(v.astype(np.int32), Date))
        elif v.dtype.kind in "iu":
            big = k in INT64_COLS
            ddl.append(f"{k} {'BIGINT' if big else 'INT'}")
            cols.append(Column.from_numpy(
                v.astype(np.int64 if big else np.int32)))
        else:
            ddl.append(f"{k} VARCHAR")
            cols.append(Column.from_pylist(list(v), String))
    ctx.sql(f"CREATE TABLE hits ({', '.join(ddl)})")
    ctx.insert_block("hits", DataBlock(names, cols, n))


# ---------------------------------------------------------------- verify

def _topn_agg(df, keys, agg_series, n, asc=False):
    """Sorted aggregate values of the top-n rows (tie-insensitive)."""
    s = agg_series.sort_values(ascending=asc)
    return sorted(s.head(n).tolist())


def verify(df, name, got):
    """Cross-check one query against pandas. For ORDER BY <agg> LIMIT n
    with possible ties, compares the sorted agg values."""
    import pandas as pd
    sub = lambda m: df[m]
    last = lambda rows, j: sorted(r[j] for r in rows)
    if name == "q00":
        return got == [(len(df),)]
    if name == "q01":
        return got == [(int((df.AdvEngineID != 0).sum()),)]
    if name == "q02":
        w = (int(df.AdvEngineID.sum()), len(df),
             float(df.ResolutionWidth.mean()))
        g = got[0]
        return g[0] == w[0] and g[1] == w[1] and abs(g[2] - w[2]) < 1e-6
    if name == "q03":
        return abs(got[0][0] - float(df.UserID.mean())) < 1e-4
    if name == "q04":
        return got == [(int(df.UserID.nunique()),)]
    if name == "q05":
        return got == [(int(df.SearchPhrase.nunique()),)]
    if name == "q06":
        lo = df.EventDate.min()
        hi = df.EventDate.max()
        return got[0][0].toordinal() - 719163 == lo \
            and got[0][1].toordinal() - 719163 == hi
    if name == "q07":
        want = sub(df.AdvEngineID != 0).groupby("AdvEngineID").size() \
            .sort_values(ascending=False)
        return [int(r[1]) for r in got] == [int(v) for v in want.values]
    if name == "q08":
        w = df.groupby("RegionID").UserID.nunique()
        return last(got, 1) == _topn_agg(df, None, w, 10)
    if name == "q09":
        w = df.groupby("RegionID").size()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name == "q10":
        s = sub(df.MobilePhoneModel != "")
        w = s.groupby("MobilePhoneModel").UserID.nunique()
        return last(got, 1) == _topn_agg(df, None, w, 10)
    if name == "q11":
        s = sub(df.MobilePhoneModel != "")
        w = s.groupby(["MobilePhone", "MobilePhoneModel"]).UserID.nunique()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name in ("q12", "q13"):
        s = sub(df.SearchPhrase != "")
        w = (s.groupby("SearchPhrase").size() if name == "q12"
             else s.groupby("SearchPhrase").UserID.nunique())
        return last(got, 1) == _topn_agg(df, None, w, 10)
    if name == "q14":
        s = sub(df.SearchPhrase != "")
        w = s.groupby(["SearchEngineID", "SearchPhrase"]).size()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name == "q15":
        w = df.groupby("UserID").size()
        return last(got, 1) == _topn_agg(df, None, w, 10)
    if name == "q16":
        w = df.groupby(["UserID", "SearchPhrase"]).size()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name == "q17":
        return len(got) == 10
    if name == "q18":
        m = pd.to_datetime(df.EventTime, unit="s").dt.minute
        w = df.groupby([df.UserID, m, df.SearchPhrase]).size()
        return last(got, 3) == _topn_agg(df, None, w, 10)
    if name == "q19":
        return got == []
    if name == "q20":
        return got == [(int(df.URL.str.contains("google").sum()),)]
    if name == "q21":
        s = sub(df.URL.str.contains("google") & (df.SearchPhrase != ""))
        w = s.groupby("SearchPhrase").size()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name == "q22":
        s = sub(df.Title.str.contains("Google")
                & ~df.URL.str.contains(".google.", regex=False)
                & (df.SearchPhrase != ""))
        w = s.groupby("SearchPhrase").size()
        return last(got, 3) == _topn_agg(df, None, w, 10)
    if name == "q23":
        s = sub(df.URL.str.contains("google")).sort_values("EventTime")
        return len(got) == 10 and \
            got[0][2].timestamp() == float(s.EventTime.iloc[0])
    if name in ("q24", "q26"):
        s = sub(df.SearchPhrase != "").sort_values(
            ["EventTime", "SearchPhrase"] if name == "q26" else "EventTime",
            kind="stable")
        if name == "q24":  # ties on EventTime: compare phrase multiset
            t10 = s.EventTime.iloc[9]
            pool = s[s.EventTime <= t10]
            return all(r[0] in set(pool.SearchPhrase) for r in got)
        return [r[0] for r in got] == s.SearchPhrase.head(10).tolist()
    if name == "q25":
        s = sub(df.SearchPhrase != "").SearchPhrase.sort_values()
        return [r[0] for r in got] == s.head(10).tolist()
    if name == "q27":
        s = sub(df.URL != "")
        g = s.groupby("CounterID").agg(l=("URL", lambda x: x.str.len().mean()),
                                       c=("URL", "size"))
        w = g[g.c > 10000].sort_values("l", ascending=False).head(25)
        return len(got) == len(w) and \
            np.allclose(sorted(r[1] for r in got), sorted(w.l), atol=1e-6)
    if name == "q28":
        s = sub(df.Referer != "").copy()
        s["k"] = s.Referer.str.replace(
            r"^https?://(?:www\.)?([^/]+)/.*$", r"\1", regex=True)
        g = s.groupby("k").agg(l=("Referer", lambda x: x.str.len().mean()),
                               c=("Referer", "size"))
        w = g[g.c > 10000].sort_values("l", ascending=False).head(25)
        return len(got) == len(w) and \
            np.allclose(sorted(r[1] for r in got), sorted(w.l), atol=1e-6)
    if name == "q29":
        w = [int((df.ResolutionWidth + i).sum()) for i in range(90)]
        return list(got[0]) == w
    if name == "q30":
        s = sub(df.SearchPhrase != "")
        w = s.groupby(["SearchEngineID", "ClientIP"]).size()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name in ("q31", "q32"):
        s = sub(df.SearchPhrase != "") if name == "q31" else df
        w = s.groupby(["WatchID", "ClientIP"]).size()
        return last(got, 2) == _topn_agg(df, None, w, 10)
    if name in ("q33", "q34"):
        j = 1 if name == "q33" else 2
        w = df.groupby("URL").size()
        return last(got, j) == _topn_agg(df, None, w, 10)
    if name == "q35":
        w = df.groupby("ClientIP").size()
        return last(got, 4) == _topn_agg(df, None, w, 10)
    if name in ("q36", "q37", "q38", "q39", "q40", "q41", "q42"):
        lo = pd.Timestamp("2013-07-01").timestamp() // 86400
        hi = pd.Timestamp("2013-07-31").timestamp() // 86400
        base = (df.CounterID == 62) & (df.EventDate >= lo) \
            & (df.EventDate <= hi) & (df.IsRefresh == 0)
        if name == "q36":
            s = sub(base & (df.DontCountHits == 0) & (df.URL != ""))
            w = s.groupby("URL").size()
            return last(got, 1) == _topn_agg(df, None, w, 10)
        if name == "q37":
            s = sub(base & (df.DontCountHits == 0) & (df.Title != ""))
            w = s.groupby("Title").size()
            return last(got, 1) == _topn_agg(df, None, w, 10)
        if name == "q38":
            s = sub(base & (df.IsLink != 0) & (df.IsDownload == 0))
            w = s.groupby("URL").size().sort_values(ascending=False)
            return len(got) == max(0, min(10, len(w) - 1000))
        if name == "q39":
            s = sub(base).copy()
            s["Src"] = np.where((s.SearchEngineID == 0) & (s.AdvEngineID == 0),
                                s.Referer, "")
            w = s.groupby(["TraficSourceID", "SearchEngineID", "AdvEngineID",
                           "Src", "URL"]).size().sort_values(ascending=False)
            want = sorted(w.iloc[1000:1010].tolist())
            return last(got, 5) == want
        if name == "q40":
            s = sub(base & df.TraficSourceID.isin([-1, 6])
                    & (df.RefererHash == 3594120000172545465))
            w = s.groupby(["URLHash", "EventDate"]).size() \
                .sort_values(ascending=False)
            want = sorted(w.iloc[100:110].tolist())
            return last(got, 2) == want
        if name == "q41":
            s = sub(base & (df.DontCountHits == 0)
                    & (df.URLHash == 2868770270353813622))
            w = s.groupby(["WindowClientWidth", "WindowClientHeight"]).size() \
                .sort_values(ascending=False)
            return len(got) == max(0, min(10, len(w) - 10000))
        if name == "q42":
            lo2 = pd.Timestamp("2013-07-14").timestamp() // 86400
            hi2 = pd.Timestamp("2013-07-15").timestamp() // 86400
            s = sub((df.CounterID == 62) & (df.EventDate >= lo2)
                    & (df.EventDate <= hi2) & (df.IsRefresh == 0)
                    & (df.DontCountHits == 0))
            m = (s.EventTime // 60 * 60)
            w = s.groupby(m).size().sort_index()
            want = w.iloc[1000:1010]
            return [int(r[1]) for r in got] == [int(v) for v in want.values] \
                and [r[0].timestamp() for r in got] == list(map(float, want.index))
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--queries", type=str, default="")
    a = ap.parse_args()
    import pandas as pd

    from databend_tpu import SessionContext
    rng = np.random.default_rng(42)
    data = make_hits(a.rows, rng)
    df = pd.DataFrame(data)

    ctx = SessionContext(data_root=tempfile.mkdtemp())
    t0 = time.time()
    load(ctx, data, a.rows)
    print(json.dumps({"query": "load", "ms": round((time.time() - t0) * 1e3, 1),
                      "rows": a.rows}), flush=True)

    names = ([q.strip() for q in a.queries.split(",") if q.strip()]
             or list(QUERIES))
    failures = []
    for name in names:
        sql = QUERIES[name]
        try:
            got = ctx.sql(sql).rows()  # warm + verify
            ok = verify(df, name, got)
            t0 = time.time()
            ctx.sql(sql)
            ms = (time.time() - t0) * 1e3
        except Exception as e:
            print(json.dumps({"query": name, "error": str(e)[:200]}),
                  flush=True)
            failures.append(name)
            continue
        print(json.dumps({"query": name, "ms": round(ms, 1),
                          "verified": bool(ok)}), flush=True)
        if not ok:
            failures.append(name)
            print(f"MISMATCH in {name}: {got[:3]}", file=sys.stderr)
    if failures:
        print(f"FAILURES: {failures}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
