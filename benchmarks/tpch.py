"""TPC-H subset harness: q1, q3, q5, q6, q10 (reference: benchmark/tpch).

Synthetic dbgen-shaped data (uniform keys, date ranges matching the spec's
1992-1998 window) generated with numpy, loaded through the bulk-ingest
path, executed through the SQL front end with the CBO on, and verified
against a pandas reference computation.

Run:  python benchmarks/tpch.py [--sf 0.01]
(sf 0.01 ~ 60k lineitem rows; sf 1.0 ~ 6M rows)
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EPOCH = dt.date(1970, 1, 1)


def _days(s: str) -> int:
    return (dt.date.fromisoformat(s) - EPOCH).days


def generate(sf: float, seed: int = 42):
    """Synthetic TPC-H tables at scale factor ``sf`` as numpy dicts."""
    rng = np.random.default_rng(seed)
    n_li = max(int(6_000_000 * sf), 100)
    n_ord = max(n_li // 4, 20)
    n_cust = max(n_ord // 10, 10)
    n_supp = max(int(10_000 * sf), 5)
    nations = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT",
               "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA",
               "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA", "MOROCCO",
               "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA",
               "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES"]
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    nation_region = np.array([0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0,
                              0, 0, 1, 2, 3, 4, 2, 3, 3, 1], np.int64)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]

    o_orderdate = rng.integers(_days("1992-01-01"), _days("1998-08-02"),
                               n_ord)
    li_order = rng.integers(0, n_ord, n_li)
    ship_lag = rng.integers(1, 122, n_li)
    flags = np.array(["A", "N", "R"])
    status = np.array(["F", "O"])
    li_ship = o_orderdate[li_order] + ship_lag
    li_flag = flags[rng.integers(0, 3, n_li)]
    li_status = status[(li_ship > _days("1995-06-17")).astype(np.int64)]

    data = {
        "region": {
            "r_regionkey": np.arange(5, dtype=np.int64),
            "r_name": regions,
        },
        "nation": {
            "n_nationkey": np.arange(25, dtype=np.int64),
            "n_name": nations,
            "n_regionkey": nation_region,
        },
        "supplier": {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_nationkey": rng.integers(0, 25, n_supp),
        },
        "customer": {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust),
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
            "c_mktsegment": [segs[i] for i in rng.integers(0, 5, n_cust)],
        },
        "orders": {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderdate": o_orderdate,
            "o_shippriority": np.zeros(n_ord, np.int64),
        },
        "lineitem": {
            "l_orderkey": li_order,
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": li_flag.tolist(),
            "l_linestatus": li_status.tolist(),
            "l_shipdate": li_ship,
        },
    }
    return data


DDL = {
    "region": "CREATE TABLE region (r_regionkey BIGINT, r_name VARCHAR)",
    "nation": ("CREATE TABLE nation (n_nationkey BIGINT, n_name VARCHAR,"
               " n_regionkey BIGINT)"),
    "supplier": "CREATE TABLE supplier (s_suppkey BIGINT, s_nationkey BIGINT)",
    "customer": ("CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR,"
                 " c_nationkey BIGINT, c_acctbal DOUBLE,"
                 " c_mktsegment VARCHAR)"),
    "orders": ("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
               " o_orderdate DATE, o_shippriority BIGINT)"),
    "lineitem": ("CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT,"
                 " l_quantity DOUBLE, l_extendedprice DOUBLE,"
                 " l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR,"
                 " l_linestatus VARCHAR, l_shipdate DATE)"),
}

QUERIES = {
    "q1": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= to_date('1998-12-01') - INTERVAL '90' day
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "q3": """
SELECT l_orderkey,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       o_orderdate, o_shippriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_shippriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
    "q5": """
SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= '1994-01-01' AND o_orderdate < '1995-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name""",
    "q6": """
SELECT sum(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
    "q10": """
SELECT c_custkey, c_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= '1993-10-01' AND o_orderdate < '1994-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",
}


def load(ctx, data):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import (Date, Float64, Int64, String)
    types = {"r_name": String, "n_name": String, "c_name": String,
             "c_mktsegment": String, "l_returnflag": String,
             "l_linestatus": String, "o_orderdate": Date,
             "l_shipdate": Date, "c_acctbal": Float64,
             "l_quantity": Float64, "l_extendedprice": Float64,
             "l_discount": Float64, "l_tax": Float64}
    for tname, cols in data.items():
        ctx.sql(DDL[tname])
        names, arrays = [], []
        for cname, vals in cols.items():
            names.append(cname)
            t = types.get(cname, Int64)
            if t == String:
                arrays.append(Column.from_pylist(list(vals), String))
            elif t == Date:
                arrays.append(Column(Date, np.asarray(vals, np.int32), None))
            else:
                arrays.append(Column(t, np.asarray(vals, t.numpy_dtype()),
                                     None))
        n = len(arrays[0].data) if not hasattr(arrays[0].data, "offsets") \
            else len(cols[names[0]])
        ctx.insert_block(tname, DataBlock(names, arrays))
        ctx.sql(f"ANALYZE TABLE {tname}")


# --------------------------------------------------------- pandas reference

def expected(data, qname):
    import pandas as pd
    li = pd.DataFrame(data["lineitem"])
    od = pd.DataFrame(data["orders"])
    cu = pd.DataFrame(data["customer"])
    su = pd.DataFrame(data["supplier"])
    na = pd.DataFrame(data["nation"])
    re_ = pd.DataFrame(data["region"])
    if qname == "q1":
        cut = _days("1998-12-01") - 90  # 90 days before, spec's interval
        # NOTE: add_months(-3) in SQL differs; q1 uses day interval
        d = li[li.l_shipdate <= cut].copy()
        d["disc_price"] = d.l_extendedprice * (1 - d.l_discount)
        d["charge"] = d.disc_price * (1 + d.l_tax)
        g = d.groupby(["l_returnflag", "l_linestatus"]).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            avg_qty=("l_quantity", "mean"),
            avg_price=("l_extendedprice", "mean"),
            avg_disc=("l_discount", "mean"),
            count_order=("l_quantity", "size")).reset_index()
        return g.sort_values(["l_returnflag", "l_linestatus"]).values.tolist()
    if qname == "q3":
        d = (cu[cu.c_mktsegment == "BUILDING"]
             .merge(od, left_on="c_custkey", right_on="o_custkey")
             .merge(li, left_on="o_orderkey", right_on="l_orderkey"))
        d = d[(d.o_orderdate < _days("1995-03-15"))
              & (d.l_shipdate > _days("1995-03-15"))].copy()
        d["rev"] = d.l_extendedprice * (1 - d.l_discount)
        g = d.groupby(["l_orderkey", "o_orderdate", "o_shippriority"])["rev"] \
             .sum().reset_index()
        g = g.sort_values(["rev", "o_orderdate", "l_orderkey"],
                          ascending=[False, True, True]).head(10)
        return g[["l_orderkey", "rev", "o_orderdate",
                  "o_shippriority"]].values.tolist()
    if qname == "q5":
        d = (cu.merge(od, left_on="c_custkey", right_on="o_custkey")
             .merge(li, left_on="o_orderkey", right_on="l_orderkey")
             .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
        d = d[d.c_nationkey == d.s_nationkey]
        d = (d.merge(na, left_on="s_nationkey", right_on="n_nationkey")
             .merge(re_, left_on="n_regionkey", right_on="r_regionkey"))
        d = d[(d.r_name == "ASIA")
              & (d.o_orderdate >= _days("1994-01-01"))
              & (d.o_orderdate < _days("1995-01-01"))].copy()
        d["rev"] = d.l_extendedprice * (1 - d.l_discount)
        g = d.groupby("n_name")["rev"].sum().reset_index()
        g = g.sort_values(["rev", "n_name"], ascending=[False, True])
        return g[["n_name", "rev"]].values.tolist()
    if qname == "q6":
        d = li[(li.l_shipdate >= _days("1994-01-01"))
               & (li.l_shipdate < _days("1995-01-01"))
               & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
               & (li.l_quantity < 24)]
        return [[float((d.l_extendedprice * d.l_discount).sum())]]
    if qname == "q10":
        d = (cu.merge(od, left_on="c_custkey", right_on="o_custkey")
             .merge(li, left_on="o_orderkey", right_on="l_orderkey")
             .merge(na, left_on="c_nationkey", right_on="n_nationkey"))
        d = d[(d.o_orderdate >= _days("1993-10-01"))
              & (d.o_orderdate < _days("1994-01-01"))
              & (d.l_returnflag == "R")].copy()
        d["rev"] = d.l_extendedprice * (1 - d.l_discount)
        g = d.groupby(["c_custkey", "c_name", "c_acctbal", "n_name"])["rev"] \
             .sum().reset_index()
        g = g.sort_values(["rev", "c_custkey"],
                          ascending=[False, True]).head(20)
        return g[["c_custkey", "c_name", "rev", "c_acctbal",
                  "n_name"]].values.tolist()
    raise KeyError(qname)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--data-root", default=None)
    args = ap.parse_args()

    import tempfile

    from databend_tpu.service.session import SessionContext
    root = args.data_root or tempfile.mkdtemp(prefix="tpch_")
    ctx = SessionContext(data_root=root)
    data = generate(args.sf)
    t0 = time.perf_counter()
    load(ctx, data)
    print(f"-- loaded sf={args.sf} "
          f"({len(data['lineitem']['l_orderkey'])} lineitem rows) "
          f"in {time.perf_counter()-t0:.2f}s")
    for name, sql in QUERIES.items():
        # warm + check
        r = ctx.sql(sql)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ctx.sql(sql)
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times)*1e3:8.1f} ms   rows={len(r)}")


if __name__ == "__main__":
    main()
