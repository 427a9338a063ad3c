"""TPC-H harness — ALL 22 queries (reference: benchmark/tpch/queries/).

Query shapes kept verbatim from the reference files (01.sql-22.sql,
modulo whitespace). Data is synthetic dbgen-shaped numpy (uniform keys,
TPC-H value domains: brands, containers, ship modes, priorities, the
1992-1998 date window) so every query returns non-empty, pandas-verified
results.

Run:  python benchmarks/tpch.py [--sf 0.1] [--queries q1,q5]
(sf 0.01 ~ 60k lineitem rows; sf 1 ~ 6M).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EPOCH = dt.date(1970, 1, 1)

NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT",
           "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA",
           "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA", "MOROCCO",
           "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA",
           "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATION_REGION = np.array([0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0,
                          0, 0, 1, 2, 3, 4, 2, 3, 3, 1], np.int64)
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SHIPINSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
                "TAKE BACK RETURN"]
CONTAINERS = [f"{a} {b}" for a in ("SM", "MED", "LG", "JUMBO", "WRAP")
              for b in ("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN",
                        "DRUM")]
TYPE_1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
P_WORDS = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
           "black", "blanched", "blue", "blush", "brown", "burlywood",
           "chartreuse", "chiffon", "chocolate", "coral", "cornflower",
           "cream", "cyan", "dark", "deep", "dim", "dodger", "drab",
           "firebrick", "floral", "forest", "frosted", "gainsboro",
           "ghost", "goldenrod", "green", "grey", "honeydew", "hot",
           "indian", "ivory", "khaki", "lace", "lavender"]


def _days(s: str) -> int:
    return (dt.date.fromisoformat(s) - EPOCH).days


def generate(sf: float, seed: int = 42):
    rng = np.random.default_rng(seed)
    n_li = max(int(6_000_000 * sf), 2000)
    n_ord = max(n_li // 4, 400)
    n_cust = max(n_ord // 10, 60)
    n_supp = max(int(10_000 * sf), 25)
    n_part = max(int(200_000 * sf), 200)

    o_orderdate = rng.integers(_days("1992-01-01"), _days("1998-08-02"),
                               n_ord)
    li_order = rng.integers(0, n_ord, n_li)
    li_ship = o_orderdate[li_order] + rng.integers(1, 122, n_li)
    li_commit = o_orderdate[li_order] + rng.integers(30, 91, n_li)
    li_receipt = li_ship + rng.integers(1, 31, n_li)
    flags = np.array(["A", "N", "R"])

    types = np.array([f"{a} {b} {c}" for a in TYPE_1 for b in TYPE_2
                      for c in TYPE_3])
    brands = np.array([f"Brand#{m}{n}" for m in range(1, 6)
                       for n in range(1, 6)] + ["Brand#45", "Brand#23",
                                               "Brand#52", "Brand#11",
                                               "Brand#51"])
    w = np.array(P_WORDS)
    p_name = np.char.add(np.char.add(
        w[rng.integers(0, len(w), n_part)], " "),
        np.char.add(w[rng.integers(0, len(w), n_part)],
                    np.char.add(" ", w[rng.integers(0, len(w), n_part)])))
    phone_cc = rng.choice(np.array(["13", "31", "23", "29", "30", "18",
                                    "17", "10", "11", "25", "33", "34"]),
                          n_cust)
    comments = np.array(["quick brown fox", "pending deposits slyly",
                         "silent pending foxes deposits", "regular ideas",
                         "Customer young Complaints", "even packages"])

    data = {
        "region": {
            "r_regionkey": np.arange(5, dtype=np.int64),
            "r_name": np.array(REGIONS),
        },
        "nation": {
            "n_nationkey": np.arange(25, dtype=np.int64),
            "n_name": np.array(NATIONS),
            "n_regionkey": NATION_REGION,
        },
        "part": {
            "p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": p_name,
            "p_mfgr": np.array([f"Manufacturer#{i % 5 + 1}"
                                for i in range(n_part)]),
            "p_brand": brands[rng.integers(0, len(brands), n_part)],
            "p_type": types[rng.integers(0, len(types), n_part)],
            "p_size": rng.integers(1, 51, n_part),
            "p_container": np.array(CONTAINERS)[
                rng.integers(0, len(CONTAINERS), n_part)],
        },
        "supplier": {
            "s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": np.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_address": np.array([f"addr {i}" for i in range(n_supp)]),
            "s_nationkey": rng.integers(0, 25, n_supp),
            "s_phone": np.array([f"{rng.integers(10, 35)}-{i:07d}"
                                 for i in range(n_supp)]),
            "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            "s_comment": comments[rng.integers(0, len(comments), n_supp)],
        },
        "partsupp": {
            # 4 suppliers per part, dbgen-style
            "ps_partkey": np.repeat(np.arange(n_part, dtype=np.int64), 4),
            "ps_suppkey": rng.integers(0, n_supp, n_part * 4),
            "ps_availqty": rng.integers(1, 10_000, n_part * 4),
            "ps_supplycost": np.round(rng.uniform(1, 1000, n_part * 4), 2),
        },
        "customer": {
            "c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": np.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_address": np.array([f"caddr {i}" for i in range(n_cust)]),
            "c_nationkey": rng.integers(0, 25, n_cust),
            "c_phone": np.char.add(np.char.add(phone_cc, "-"),
                                   np.arange(n_cust).astype(str)),
            "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        },
        "orders": {
            "o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": np.where(
                o_orderdate > _days("1995-06-17"), "O", "F"),
            "o_totalprice": np.round(rng.uniform(800, 500_000, n_ord), 2),
            "o_orderdate": o_orderdate,
            "o_orderpriority": np.array(PRIORITIES)[
                rng.integers(0, 5, n_ord)],
            "o_shippriority": np.zeros(n_ord, np.int64),
            "o_comment": comments[rng.integers(0, len(comments), n_ord)],
        },
        "lineitem": {
            "l_orderkey": li_order,
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
            "l_returnflag": flags[rng.integers(0, 3, n_li)],
            "l_linestatus": np.where(li_ship > _days("1995-06-17"),
                                     "O", "F"),
            "l_shipdate": li_ship,
            "l_commitdate": li_commit,
            "l_receiptdate": li_receipt,
            "l_shipinstruct": np.array(SHIPINSTRUCT)[
                rng.integers(0, 4, n_li)],
            "l_shipmode": np.array(SHIPMODES)[rng.integers(0, 7, n_li)],
        },
    }
    return data


DDL = {
    "region": "CREATE TABLE region (r_regionkey BIGINT, r_name VARCHAR)",
    "nation": ("CREATE TABLE nation (n_nationkey BIGINT, n_name VARCHAR,"
               " n_regionkey BIGINT)"),
    "part": ("CREATE TABLE part (p_partkey BIGINT, p_name VARCHAR,"
             " p_mfgr VARCHAR, p_brand VARCHAR, p_type VARCHAR,"
             " p_size BIGINT, p_container VARCHAR)"),
    "supplier": ("CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR,"
                 " s_address VARCHAR, s_nationkey BIGINT, s_phone VARCHAR,"
                 " s_acctbal DOUBLE, s_comment VARCHAR)"),
    "partsupp": ("CREATE TABLE partsupp (ps_partkey BIGINT,"
                 " ps_suppkey BIGINT, ps_availqty BIGINT,"
                 " ps_supplycost DOUBLE)"),
    "customer": ("CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR,"
                 " c_address VARCHAR, c_nationkey BIGINT, c_phone VARCHAR,"
                 " c_acctbal DOUBLE, c_mktsegment VARCHAR)"),
    "orders": ("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
               " o_orderstatus VARCHAR, o_totalprice DOUBLE,"
               " o_orderdate DATE, o_orderpriority VARCHAR,"
               " o_shippriority BIGINT, o_comment VARCHAR)"),
    "lineitem": ("CREATE TABLE lineitem (l_orderkey BIGINT,"
                 " l_partkey BIGINT, l_suppkey BIGINT, l_quantity DOUBLE,"
                 " l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,"
                 " l_returnflag VARCHAR, l_linestatus VARCHAR,"
                 " l_shipdate DATE, l_commitdate DATE, l_receiptdate DATE,"
                 " l_shipinstruct VARCHAR, l_shipmode VARCHAR)"),
}

QUERIES = {
    "q1": """
select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty,
  sum(l_extendedprice) as sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
  avg(l_quantity) as avg_qty, avg(l_extendedprice) as avg_price,
  avg(l_discount) as avg_disc, count(*) as count_order
from lineitem
where l_shipdate <= to_date('1998-09-02')
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus""",
    "q2": """
select s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone,
  s_comment
from part, supplier, partsupp, nation, region
where p_partkey = ps_partkey and s_suppkey = ps_suppkey and p_size = 15
  and p_type like '%BRASS' and s_nationkey = n_nationkey
  and n_regionkey = r_regionkey and r_name = 'EUROPE'
  and ps_supplycost = (
    select min(ps_supplycost)
    from partsupp, supplier, nation, region
    where p_partkey = ps_partkey and s_suppkey = ps_suppkey
      and s_nationkey = n_nationkey and n_regionkey = r_regionkey
      and r_name = 'EUROPE')
order by s_acctbal desc, n_name, s_name, p_partkey limit 100""",
    "q3": """
select l_orderkey, sum(l_extendedprice * (1 - l_discount)) as revenue,
  o_orderdate, o_shippriority
from customer, orders, lineitem
where c_mktsegment = 'BUILDING' and c_custkey = o_custkey
  and l_orderkey = o_orderkey and o_orderdate < to_date('1995-03-15')
  and l_shipdate > to_date('1995-03-15')
group by l_orderkey, o_orderdate, o_shippriority
order by revenue desc, o_orderdate limit 10""",
    "q4": """
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= to_date('1993-07-01')
  and o_orderdate < add_months(to_date('1993-07-01'), 3)
  and exists (select * from lineitem
              where l_orderkey = o_orderkey
                and l_commitdate < l_receiptdate)
group by o_orderpriority order by o_orderpriority""",
    "q5": """
select n_name, sum(l_extendedprice * (1 - l_discount)) as revenue
from customer, orders, lineitem, supplier, nation, region
where c_custkey = o_custkey and l_orderkey = o_orderkey
  and l_suppkey = s_suppkey and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey and n_regionkey = r_regionkey
  and r_name = 'ASIA' and o_orderdate >= to_date('1994-01-01')
  and o_orderdate < to_date('1995-01-01')
group by n_name order by revenue desc""",
    "q6": """
select sum(l_extendedprice * l_discount) as revenue
from lineitem
where l_shipdate >= to_date('1994-01-01')
  and l_shipdate < to_date('1995-01-01')
  and l_discount between 0.05 and 0.07 and l_quantity < 24""",
    "q7": """
select supp_nation, cust_nation, l_year, sum(volume) as revenue
from (select n1.n_name as supp_nation, n2.n_name as cust_nation,
        extract(year from l_shipdate) as l_year,
        l_extendedprice * (1 - l_discount) as volume
      from supplier, lineitem, orders, customer, nation n1, nation n2
      where s_suppkey = l_suppkey and o_orderkey = l_orderkey
        and c_custkey = o_custkey and s_nationkey = n1.n_nationkey
        and c_nationkey = n2.n_nationkey
        and ((n1.n_name = 'FRANCE' and n2.n_name = 'GERMANY')
             or (n1.n_name = 'GERMANY' and n2.n_name = 'FRANCE'))
        and l_shipdate between to_date('1995-01-01')
            and to_date('1996-12-31')) as shipping
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year""",
    "q8": """
select o_year,
  sum(case when nation = 'BRAZIL' then volume else 0 end) / sum(volume)
    as mkt_share
from (select extract(year from o_orderdate) as o_year,
        l_extendedprice * (1 - l_discount) as volume, n2.n_name as nation
      from part, supplier, lineitem, orders, customer, nation n1,
           nation n2, region
      where p_partkey = l_partkey and s_suppkey = l_suppkey
        and l_orderkey = o_orderkey and o_custkey = c_custkey
        and c_nationkey = n1.n_nationkey and n1.n_regionkey = r_regionkey
        and r_name = 'AMERICA' and s_nationkey = n2.n_nationkey
        and o_orderdate between to_date('1995-01-01')
            and to_date('1996-12-31')
        and p_type = 'ECONOMY ANODIZED STEEL') as all_nations
group by o_year order by o_year""",
    "q9": """
select nation, o_year, sum(amount) as sum_profit
from (select n_name as nation, extract(year from o_orderdate) as o_year,
        l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
          as amount
      from lineitem
      join orders on o_orderkey = l_orderkey
      join part on p_partkey = l_partkey
      join partsupp on ps_partkey = l_partkey
      join supplier on s_suppkey = l_suppkey
      join nation on s_nationkey = n_nationkey
      where ps_suppkey = l_suppkey and p_name like '%green%') as profit
group by nation, o_year order by nation, o_year desc""",
    "q10": """
select c_custkey, c_name, sum(l_extendedprice * (1 - l_discount)) as revenue,
  c_acctbal, n_name, c_address, c_phone
from customer, orders, lineitem, nation
where c_custkey = o_custkey and l_orderkey = o_orderkey
  and o_orderdate >= to_date('1993-10-01')
  and o_orderdate < to_date('1994-01-01')
  and l_returnflag = 'R' and c_nationkey = n_nationkey
group by c_custkey, c_name, c_acctbal, c_phone, n_name, c_address
order by revenue desc, c_custkey limit 20""",
    "q11": """
select ps_partkey, sum(ps_supplycost * ps_availqty) as value
from partsupp, supplier, nation
where ps_suppkey = s_suppkey and s_nationkey = n_nationkey
  and n_name = 'GERMANY'
group by ps_partkey
having sum(ps_supplycost * ps_availqty) > (
  select sum(ps_supplycost * ps_availqty) * 0.0001
  from partsupp, supplier, nation
  where ps_suppkey = s_suppkey and s_nationkey = n_nationkey
    and n_name = 'GERMANY')
order by value desc""",
    "q12": """
select l_shipmode,
  sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
      then 1 else 0 end) as high_line_count,
  sum(case when o_orderpriority <> '1-URGENT'
       and o_orderpriority <> '2-HIGH' then 1 else 0 end) as low_line_count
from orders, lineitem
where o_orderkey = l_orderkey and l_shipmode in ('MAIL', 'SHIP')
  and l_commitdate < l_receiptdate and l_shipdate < l_commitdate
  and l_receiptdate >= to_date('1994-01-01')
  and l_receiptdate < add_months(to_date('1994-01-01'), 12)
group by l_shipmode order by l_shipmode""",
    "q13": """
select c_count, count(*) as custdist
from (select c_custkey, count(o_orderkey) as c_count
      from customer
      left outer join orders on c_custkey = o_custkey
        and o_comment not like '%pending%deposits%'
      group by c_custkey) c_orders
group by c_count order by custdist desc, c_count desc""",
    "q14": """
select 100.00 * sum(case when p_type like 'PROMO%'
    then l_extendedprice * (1 - l_discount) else 0 end)
  / sum(l_extendedprice * (1 - l_discount)) as promo_revenue
from lineitem, part
where l_partkey = p_partkey and l_shipdate >= to_date('1995-09-01')
  and l_shipdate < add_months(to_date('1995-09-01'), 1)""",
    "q15": """
with revenue as (
  select l_suppkey as supplier_no,
    sum(l_extendedprice * (1 - l_discount)) as total_revenue
  from lineitem
  where l_shipdate >= to_date('1996-01-01')
    and l_shipdate < to_date('1996-04-01')
  group by l_suppkey)
select s_suppkey, s_name, s_address, s_phone, total_revenue
from supplier, revenue
where s_suppkey = supplier_no
  and total_revenue = (select max(total_revenue) from revenue)
order by s_suppkey""",
    "q16": """
select p_brand, p_type, p_size, count(distinct ps_suppkey) as supplier_cnt
from partsupp, part
where p_partkey = ps_partkey and p_brand <> 'Brand#45'
  and p_type not like 'MEDIUM POLISHED%'
  and p_size in (49, 14, 23, 45, 19, 3, 36, 9)
  and ps_suppkey not in (
    select s_suppkey from supplier
    where s_comment like '%Customer%Complaints%')
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size""",
    "q17": """
select sum(l_extendedprice) / 7.0 as avg_yearly
from lineitem, part
where p_partkey = l_partkey and p_brand = 'Brand#23'
  and p_container = 'MED BOX'
  and l_quantity < (select 0.2 * avg(l_quantity) from lineitem
                    where l_partkey = p_partkey)""",
    "q18": """
select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  sum(l_quantity)
from customer, orders, lineitem
where o_orderkey in (select l_orderkey from lineitem
                     group by l_orderkey having sum(l_quantity) > 300)
  and c_custkey = o_custkey and o_orderkey = l_orderkey
group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
order by o_totalprice desc, o_orderdate limit 100""",
    "q19": """
select sum(l_extendedprice * (1 - l_discount)) as revenue
from lineitem, part
where (p_partkey = l_partkey and p_brand = 'Brand#52'
    and p_container in ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
    and l_quantity >= 4 and l_quantity <= 4 + 10
    and p_size between 1 and 5 and l_shipmode in ('AIR', 'AIR REG')
    and l_shipinstruct = 'DELIVER IN PERSON')
  or (p_partkey = l_partkey and p_brand = 'Brand#11'
    and p_container in ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
    and l_quantity >= 18 and l_quantity <= 18 + 10
    and p_size between 1 and 10 and l_shipmode in ('AIR', 'AIR REG')
    and l_shipinstruct = 'DELIVER IN PERSON')
  or (p_partkey = l_partkey and p_brand = 'Brand#51'
    and p_container in ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
    and l_quantity >= 29 and l_quantity <= 29 + 10
    and p_size between 1 and 15 and l_shipmode in ('AIR', 'AIR REG')
    and l_shipinstruct = 'DELIVER IN PERSON')""",
    "q20": """
select s_name, s_address
from supplier, nation
where s_suppkey in (
    select ps_suppkey from partsupp
    where ps_partkey in (select p_partkey from part
                         where p_name like 'forest%')
      and ps_availqty > (
        select 0.5 * sum(l_quantity) from lineitem
        where l_partkey = ps_partkey and l_suppkey = ps_suppkey
          and l_shipdate >= to_date('1994-01-01')
          and l_shipdate < add_months(to_date('1994-01-01'), 12)))
  and s_nationkey = n_nationkey and n_name = 'CANADA'
order by s_name""",
    "q21": """
select s_name, count(*) as numwait
from supplier, lineitem l1, orders, nation
where s_suppkey = l1.l_suppkey and o_orderkey = l1.l_orderkey
  and o_orderstatus = 'F' and l1.l_receiptdate > l1.l_commitdate
  and exists (select * from lineitem l2
              where l2.l_orderkey = l1.l_orderkey
                and l2.l_suppkey <> l1.l_suppkey)
  and not exists (select * from lineitem l3
                  where l3.l_orderkey = l1.l_orderkey
                    and l3.l_suppkey <> l1.l_suppkey
                    and l3.l_receiptdate > l3.l_commitdate)
  and s_nationkey = n_nationkey and n_name = 'SAUDI ARABIA'
group by s_name order by numwait desc, s_name limit 100""",
    "q22": """
select cntrycode, count(*) as numcust, sum(c_acctbal) as totacctbal
from (select substring(c_phone, 1, 2) as cntrycode, c_acctbal
      from customer
      where substring(c_phone, 1, 2) in
            ('13', '31', '23', '29', '30', '18', '17')
        and c_acctbal > (
          select avg(c_acctbal) from customer
          where c_acctbal > 0.00 and substring(c_phone, 1, 2) in
                ('13', '31', '23', '29', '30', '18', '17'))
        and not exists (select * from orders
                        where o_custkey = c_custkey)) as custsale
group by cntrycode order by cntrycode""",
}


def load(ctx, data):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Date, Float64, Int64, String

    def coltype(name):
        if name.endswith("date"):
            return Date
        if name in ("c_acctbal", "s_acctbal", "o_totalprice", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax",
                    "ps_supplycost"):
            return Float64
        return None  # decide by dtype

    for tname, cols in data.items():
        ctx.sql(DDL[tname])
        names, arrays = [], []
        n = len(next(iter(cols.values())))
        for cname, vals in cols.items():
            names.append(cname)
            t = coltype(cname)
            arr = np.asarray(vals)
            if t == Date:
                arrays.append(Column(Date, arr.astype(np.int32), None))
            elif t == Float64:
                arrays.append(Column(Float64, arr.astype(np.float64), None))
            elif arr.dtype.kind in "iu":
                arrays.append(Column(Int64, arr.astype(np.int64), None))
            else:
                arrays.append(Column.from_pylist([str(v) for v in vals],
                                                 String))
        ctx.insert_block(tname, DataBlock(names, arrays, n))
        ctx.sql(f"ANALYZE TABLE {tname}")


# --------------------------------------------------------- pandas reference

def frames(data):
    import pandas as pd
    return {k: pd.DataFrame(v) for k, v in data.items()}


def expected(F, qname):
    """Pandas computation of each query; returns a comparable object."""
    import pandas as pd
    li, od, cu = F["lineitem"], F["orders"], F["customer"]
    su, na, re_, pa, ps = (F["supplier"], F["nation"], F["region"],
                           F["part"], F["partsupp"])
    if qname == "q1":
        s = li[li.l_shipdate <= _days("1998-09-02")].copy()
        s["disc_price"] = s.l_extendedprice * (1 - s.l_discount)
        s["charge"] = s.disc_price * (1 + s.l_tax)
        g = s.groupby(["l_returnflag", "l_linestatus"]).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base=("l_extendedprice", "sum"),
            sum_disc=("disc_price", "sum"), sum_charge=("charge", "sum"),
            cnt=("l_quantity", "size")).reset_index()
        return [(r.l_returnflag, r.l_linestatus, round(r.sum_qty, 2),
                 round(r.sum_disc, 2), int(r.cnt))
                for r in g.sort_values(["l_returnflag", "l_linestatus"])
                .itertuples()]
    if qname == "q2":
        eu = na[na.n_regionkey == 3]  # EUROPE
        m = (ps.merge(su, left_on="ps_suppkey", right_on="s_suppkey")
             .merge(eu, left_on="s_nationkey", right_on="n_nationkey"))
        best = m.groupby("ps_partkey").ps_supplycost.min()
        p = pa[(pa.p_size == 15) & pa.p_type.str.endswith("BRASS")]
        mm = m.merge(p, left_on="ps_partkey", right_on="p_partkey")
        mm = mm[mm.ps_supplycost == mm.ps_partkey.map(best)]
        mm = mm.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                            ascending=[False, True, True, True]).head(100)
        return [(round(r.s_acctbal, 2), r.s_name, r.n_name, int(r.p_partkey))
                for r in mm.itertuples()]
    if qname == "q3":
        c = cu[cu.c_mktsegment == "BUILDING"]
        o = od[od.o_orderdate < _days("1995-03-15")]
        l = li[li.l_shipdate > _days("1995-03-15")].copy()
        m = (l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
             .merge(c, left_on="o_custkey", right_on="c_custkey"))
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                      as_index=False).rev.sum()
        g = g.sort_values(["rev", "o_orderdate"],
                          ascending=[False, True]).head(10)
        return [round(v, 2) for v in g.rev]
    if qname == "q4":
        o = od[(od.o_orderdate >= _days("1993-07-01"))
               & (od.o_orderdate < _days("1993-10-01"))]
        ok = li[li.l_commitdate < li.l_receiptdate].l_orderkey.unique()
        o = o[o.o_orderkey.isin(ok)]
        g = o.groupby("o_orderpriority").size().sort_index()
        return [(k, int(v)) for k, v in g.items()]
    if qname == "q5":
        asia = na[na.n_regionkey == 2]
        o = od[(od.o_orderdate >= _days("1994-01-01"))
               & (od.o_orderdate < _days("1995-01-01"))]
        m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
             .merge(cu, left_on="o_custkey", right_on="c_custkey")
             .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
        m = m[m.c_nationkey == m.s_nationkey]
        m = m.merge(asia, left_on="s_nationkey", right_on="n_nationkey")
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby("n_name").rev.sum().sort_values(ascending=False)
        return [(k, round(v, 2)) for k, v in g.items()]
    if qname == "q6":
        s = li[(li.l_shipdate >= _days("1994-01-01"))
               & (li.l_shipdate < _days("1995-01-01"))
               & (li.l_discount >= 0.05 - 1e-9)
               & (li.l_discount <= 0.07 + 1e-9) & (li.l_quantity < 24)]
        return round(float((s.l_extendedprice * s.l_discount).sum()), 2)
    if qname == "q7":
        m = (li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
             .merge(od, left_on="l_orderkey", right_on="o_orderkey")
             .merge(cu, left_on="o_custkey", right_on="c_custkey"))
        n1 = na.rename(columns=lambda c: c + "_1")
        n2 = na.rename(columns=lambda c: c + "_2")
        m = (m.merge(n1, left_on="s_nationkey", right_on="n_nationkey_1")
             .merge(n2, left_on="c_nationkey", right_on="n_nationkey_2"))
        m = m[((m.n_name_1 == "FRANCE") & (m.n_name_2 == "GERMANY"))
              | ((m.n_name_1 == "GERMANY") & (m.n_name_2 == "FRANCE"))]
        m = m[(m.l_shipdate >= _days("1995-01-01"))
              & (m.l_shipdate <= _days("1996-12-31"))].copy()
        m["l_year"] = ((m.l_shipdate.map(
            lambda d: (EPOCH + dt.timedelta(days=int(d))).year)))
        m["volume"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby(["n_name_1", "n_name_2", "l_year"]).volume.sum()
        g = g.sort_index()
        return [(k[0], k[1], int(k[2]), round(v, 2)) for k, v in g.items()]
    if qname == "q8":
        amer = na[na.n_regionkey == 1]
        p = pa[pa.p_type == "ECONOMY ANODIZED STEEL"]
        m = (li.merge(p, left_on="l_partkey", right_on="p_partkey")
             .merge(su, left_on="l_suppkey", right_on="s_suppkey")
             .merge(od, left_on="l_orderkey", right_on="o_orderkey")
             .merge(cu, left_on="o_custkey", right_on="c_custkey")
             .merge(amer, left_on="c_nationkey", right_on="n_nationkey"))
        n2 = na.rename(columns=lambda c: c + "_2")
        m = m.merge(n2, left_on="s_nationkey", right_on="n_nationkey_2")
        m = m[(m.o_orderdate >= _days("1995-01-01"))
              & (m.o_orderdate <= _days("1996-12-31"))].copy()
        m["o_year"] = m.o_orderdate.map(
            lambda d: (EPOCH + dt.timedelta(days=int(d))).year)
        m["volume"] = m.l_extendedprice * (1 - m.l_discount)
        m["bra"] = np.where(m.n_name_2 == "BRAZIL", m.volume, 0.0)
        g = m.groupby("o_year").agg(b=("bra", "sum"), v=("volume", "sum"))
        return [(int(k), round(r.b / r.v, 4)) for k, r in g.iterrows()]
    if qname == "q9":
        p = pa[pa.p_name.str.contains("green")]
        m = (li.merge(p, left_on="l_partkey", right_on="p_partkey")
             .merge(ps, left_on=["l_partkey", "l_suppkey"],
                    right_on=["ps_partkey", "ps_suppkey"])
             .merge(su, left_on="l_suppkey", right_on="s_suppkey")
             .merge(od, left_on="l_orderkey", right_on="o_orderkey")
             .merge(na, left_on="s_nationkey", right_on="n_nationkey"))
        m = m.copy()
        m["o_year"] = m.o_orderdate.map(
            lambda d: (EPOCH + dt.timedelta(days=int(d))).year)
        m["amount"] = (m.l_extendedprice * (1 - m.l_discount)
                       - m.ps_supplycost * m.l_quantity)
        g = m.groupby(["n_name", "o_year"]).amount.sum().reset_index()
        g = g.sort_values(["n_name", "o_year"], ascending=[True, False])
        return [(r.n_name, int(r.o_year), round(r.amount, 2))
                for r in g.itertuples()]
    if qname == "q10":
        o = od[(od.o_orderdate >= _days("1993-10-01"))
               & (od.o_orderdate < _days("1994-01-01"))]
        l = li[li.l_returnflag == "R"]
        m = (l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
             .merge(cu, left_on="o_custkey", right_on="c_custkey")
             .merge(na, left_on="c_nationkey", right_on="n_nationkey"))
        m = m.copy()
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        g = m.groupby("c_custkey").rev.sum().reset_index()
        g = g.sort_values(["rev", "c_custkey"],
                          ascending=[False, True]).head(20)
        return [(int(r.c_custkey), round(r.rev, 2)) for r in g.itertuples()]
    if qname == "q11":
        ger = na[na.n_name == "GERMANY"]
        m = (ps.merge(su, left_on="ps_suppkey", right_on="s_suppkey")
             .merge(ger, left_on="s_nationkey", right_on="n_nationkey"))
        m = m.copy()
        m["v"] = m.ps_supplycost * m.ps_availqty
        g = m.groupby("ps_partkey").v.sum()
        thr = float(m.v.sum()) * 0.0001
        g = g[g > thr].sort_values(ascending=False)
        return [(int(k), round(v, 2)) for k, v in g.items()]
    if qname == "q12":
        l = li[li.l_shipmode.isin(["MAIL", "SHIP"])
               & (li.l_commitdate < li.l_receiptdate)
               & (li.l_shipdate < li.l_commitdate)
               & (li.l_receiptdate >= _days("1994-01-01"))
               & (li.l_receiptdate < _days("1995-01-01"))]
        m = l.merge(od, left_on="l_orderkey", right_on="o_orderkey").copy()
        m["high"] = m.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
        g = m.groupby("l_shipmode").agg(h=("high", "sum"),
                                        n=("high", "size")).sort_index()
        return [(k, int(r.h), int(r.n - r.h)) for k, r in g.iterrows()]
    if qname == "q13":
        o = od[~od.o_comment.str.contains("pending.*deposits", regex=True)]
        cnt = (cu.merge(o, left_on="c_custkey", right_on="o_custkey",
                        how="left").groupby("c_custkey").o_orderkey.count())
        g = cnt.value_counts().reset_index()
        g.columns = ["c_count", "custdist"]
        g = g.sort_values(["custdist", "c_count"], ascending=[False, False])
        return [(int(r.c_count), int(r.custdist)) for r in g.itertuples()]
    if qname == "q14":
        l = li[(li.l_shipdate >= _days("1995-09-01"))
               & (li.l_shipdate < _days("1995-10-01"))]
        m = l.merge(pa, left_on="l_partkey", right_on="p_partkey").copy()
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        promo = float(m[m.p_type.str.startswith("PROMO")].rev.sum())
        return round(100.0 * promo / float(m.rev.sum()), 4)
    if qname == "q15":
        l = li[(li.l_shipdate >= _days("1996-01-01"))
               & (li.l_shipdate < _days("1996-04-01"))].copy()
        l["rev"] = l.l_extendedprice * (1 - l.l_discount)
        g = l.groupby("l_suppkey").rev.sum()
        best = g.max()
        ids = sorted(int(k) for k, v in g.items() if abs(v - best) < 1e-6)
        return ids
    if qname == "q16":
        bad = su[su.s_comment.str.contains("Customer.*Complaints",
                                           regex=True)].s_suppkey
        p = pa[(pa.p_brand != "Brand#45")
               & ~pa.p_type.str.startswith("MEDIUM POLISHED")
               & pa.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])]
        m = ps[~ps.ps_suppkey.isin(bad)].merge(
            p, left_on="ps_partkey", right_on="p_partkey")
        g = m.groupby(["p_brand", "p_type", "p_size"]).ps_suppkey.nunique()
        g = g.reset_index().sort_values(
            ["ps_suppkey", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True])
        return [(r.p_brand, r.p_type, int(r.p_size), int(r.ps_suppkey))
                for r in g.itertuples()]
    if qname == "q17":
        p = pa[(pa.p_brand == "Brand#23") & (pa.p_container == "MED BOX")]
        avg_q = li.groupby("l_partkey").l_quantity.mean()
        m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
        m = m[m.l_quantity < 0.2 * m.l_partkey.map(avg_q)]
        return round(float(m.l_extendedprice.sum()) / 7.0, 2)
    if qname == "q18":
        big = li.groupby("l_orderkey").l_quantity.sum()
        big = big[big > 300].index
        o = od[od.o_orderkey.isin(big)]
        m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
             .merge(cu, left_on="o_custkey", right_on="c_custkey"))
        g = m.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                       "o_totalprice"]).l_quantity.sum().reset_index()
        g = g.sort_values(["o_totalprice", "o_orderdate"],
                          ascending=[False, True]).head(100)
        return [(int(r.o_orderkey), round(r.l_quantity, 2))
                for r in g.itertuples()]
    if qname == "q19":
        m = li.merge(pa, left_on="l_partkey", right_on="p_partkey")
        base = (m.l_shipmode.isin(["AIR", "AIR REG"])
                & (m.l_shipinstruct == "DELIVER IN PERSON"))
        c1 = (base & (m.p_brand == "Brand#52")
              & m.p_container.isin(["SM CASE", "SM BOX", "SM PACK",
                                    "SM PKG"])
              & (m.l_quantity >= 4) & (m.l_quantity <= 14)
              & (m.p_size >= 1) & (m.p_size <= 5))
        c2 = (base & (m.p_brand == "Brand#11")
              & m.p_container.isin(["MED BAG", "MED BOX", "MED PKG",
                                    "MED PACK"])
              & (m.l_quantity >= 18) & (m.l_quantity <= 28)
              & (m.p_size >= 1) & (m.p_size <= 10))
        c3 = (base & (m.p_brand == "Brand#51")
              & m.p_container.isin(["LG CASE", "LG BOX", "LG PACK",
                                    "LG PKG"])
              & (m.l_quantity >= 29) & (m.l_quantity <= 39)
              & (m.p_size >= 1) & (m.p_size <= 15))
        sel = m[c1 | c2 | c3]
        return round(float((sel.l_extendedprice
                            * (1 - sel.l_discount)).sum()), 2)
    if qname == "q20":
        forest = pa[pa.p_name.str.startswith("forest")].p_partkey
        l = li[(li.l_shipdate >= _days("1994-01-01"))
               & (li.l_shipdate < _days("1995-01-01"))]
        qsum = l.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum()
        m = ps[ps.ps_partkey.isin(forest)].copy()
        key = list(zip(m.ps_partkey, m.ps_suppkey))
        m["half"] = [0.5 * qsum.get(k, np.nan) for k in key]
        ok = m[m.ps_availqty > m.half].ps_suppkey.unique()
        canada = na[na.n_name == "CANADA"]
        s = su[su.s_suppkey.isin(ok)].merge(
            canada, left_on="s_nationkey", right_on="n_nationkey")
        return sorted(s.s_name.tolist())
    if qname == "q21":
        sa = na[na.n_name == "SAUDI ARABIA"]
        l1 = li[li.l_receiptdate > li.l_commitdate]
        f_orders = od[od.o_orderstatus == "F"]
        m = (l1.merge(f_orders, left_on="l_orderkey", right_on="o_orderkey")
             .merge(su, left_on="l_suppkey", right_on="s_suppkey")
             .merge(sa, left_on="s_nationkey", right_on="n_nationkey"))
        # exists: another supplier on the same order
        nsupp = li.groupby("l_orderkey").l_suppkey.nunique()
        m = m[m.l_orderkey.map(nsupp) > 1]
        # not exists: no OTHER supplier late on the same order
        late = li[li.l_receiptdate > li.l_commitdate]
        late_n = late.groupby("l_orderkey").l_suppkey.nunique()
        only_self_late = (m.l_orderkey.map(late_n).fillna(0) == 1)
        m = m[only_self_late]
        g = m.groupby("s_name").size().reset_index()
        g.columns = ["s_name", "numwait"]
        g = g.sort_values(["numwait", "s_name"],
                          ascending=[False, True]).head(100)
        return [(r.s_name, int(r.numwait)) for r in g.itertuples()]
    if qname == "q22":
        codes = ["13", "31", "23", "29", "30", "18", "17"]
        c = cu[cu.c_phone.str[:2].isin(codes)]
        thr = float(c[c.c_acctbal > 0].c_acctbal.mean())
        c = c[c.c_acctbal > thr]
        c = c[~c.c_custkey.isin(od.o_custkey.unique())]
        g = c.groupby(c.c_phone.str[:2]).agg(
            n=("c_acctbal", "size"), s=("c_acctbal", "sum")).sort_index()
        return [(k, int(r.n), round(r.s, 2)) for k, r in g.iterrows()]
    raise KeyError(qname)


def check(qname, got, want):
    """Compare engine rows to the pandas expectation per query."""
    def r2(x):
        return round(float(x), 2) if x is not None else 0.0
    if qname == "q1":
        if len(got) != len(want):
            return False
        for g, w in zip(got, want):
            if (g[0], g[1], int(g[9])) != (w[0], w[1], w[4]):
                return False
            if abs(r2(g[2]) - w[2]) > 0.5 or abs(r2(g[4]) - w[3]) > 0.5:
                return False  # money sums: summation-order tolerance
        return True
    if qname == "q2":
        return [(r2(r[0]), r[1], r[2], int(r[3])) for r in got] == want
    if qname == "q3":
        return [r2(r[1]) for r in got] == want
    if qname == "q4":
        return [(r[0], int(r[1])) for r in got] == want
    if qname == "q5":
        return [(r[0], r2(r[1])) for r in got] == want
    if qname == "q6":
        return abs(r2(got[0][0]) - want) < 0.05
    if qname == "q7":
        return [(r[0], r[1], int(r[2]), r2(r[3])) for r in got] == want
    if qname == "q8":
        return len(got) == len(want) and all(
            g[0] == w[0] and abs(float(g[1]) - w[1]) < 1e-3
            for g, w in zip(got, want))
    if qname == "q9":
        return [(r[0], int(r[1]), r2(r[2])) for r in got] == want
    if qname == "q10":
        return [(int(r[0]), r2(r[2])) for r in got] == want
    if qname == "q11":
        return [(int(r[0]), r2(r[1])) for r in got] == want
    if qname == "q12":
        return [(r[0], int(r[1]), int(r[2])) for r in got] == want
    if qname == "q13":
        return sorted((int(r[0]), int(r[1])) for r in got) == sorted(want)
    if qname == "q14":
        return abs(float(got[0][0]) - want) < 0.01
    if qname == "q15":
        return sorted(int(r[0]) for r in got) == want
    if qname == "q16":
        return [(r[0], r[1], int(r[2]), int(r[3])) for r in got] == want
    if qname == "q17":
        return abs(r2(got[0][0]) - want) < 0.05
    if qname == "q18":
        return sorted((int(r[2]), r2(r[5])) for r in got) == sorted(want)
    if qname == "q19":
        return abs(r2(got[0][0]) - want) < 0.05
    if qname == "q20":
        return [r[0] for r in got] == want
    if qname == "q21":
        return [(r[0], int(r[1])) for r in got] == want
    if qname == "q22":
        return [(r[0], int(r[1]), r2(r[2])) for r in got] == want
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--queries", type=str, default="")
    a = ap.parse_args()

    from databend_tpu import SessionContext
    data = generate(a.sf)
    F = frames(data)
    ctx = SessionContext(data_root=tempfile.mkdtemp())
    t0 = time.time()
    load(ctx, data)
    print(json.dumps({"query": "load", "ms": round((time.time() - t0) * 1e3, 1),
                      "sf": a.sf,
                      "lineitem_rows": len(data["lineitem"]["l_orderkey"])}),
          flush=True)

    names = ([q.strip() for q in a.queries.split(",") if q.strip()]
             or list(QUERIES))
    failures = []
    for name in names:
        sql = QUERIES[name]
        try:
            got = ctx.sql(sql).rows()  # warm + verify
            ok = check(name, got, expected(F, name))
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
