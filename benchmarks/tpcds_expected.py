"""Independent pandas implementations of the TPC-DS queries over the
synthetic corpus, used to verify every engine result before timing
(mirrors the tpch.py expected()/check() split)."""

from __future__ import annotations

import datetime as _dt

import numpy as np

_EPOCH = _dt.date(1970, 1, 1)


def _d(s: str) -> int:
    """Days-since-epoch of an ISO date (the d_date storage encoding)."""
    return (_dt.date.fromisoformat(s) - _EPOCH).days


EXPECTED = {}


def exp(name):
    def deco(f):
        EXPECTED[name] = f
        return f
    return deco


def _r2(x):
    return round(float(x), 2) if x is not None and not (
        isinstance(x, float) and np.isnan(x)) else None


def _rows_num(got, idxs, nd=2):
    """Extract and round numeric columns for comparison."""
    out = []
    for r in got:
        row = []
        for i, v in enumerate(r):
            if i in idxs:
                row.append(None if v is None else round(float(v), nd))
            else:
                row.append(v)
        out.append(tuple(row))
    return out


def _close(a, b, tol=0.02):
    if a is None or b is None:
        return a is None and b is None
    return abs(float(a) - float(b)) <= tol


def _rows_close(got, want, float_cols, tol=0.02):
    """float_cols: set of col indexes (tolerance `tol`) or {idx: tol} dict."""
    if len(got) != len(want):
        return False
    for g, w in zip(got, want):
        if len(g) != len(w):
            return False
        for i, (a, b) in enumerate(zip(g, w)):
            if i in float_cols:
                t = float_cols[i] if isinstance(float_cols, dict) else tol
                if not _close(a, b, t):
                    return False
            elif a != b:
                return False
    return True


# --------------------------------------------------------------- helpers

def _star(F, fact, date_col, item=True):
    m = F[fact].merge(F["date_dim"], left_on=date_col,
                      right_on="d_date_sk")
    if item:
        key = {"store_sales": "ss_item_sk", "catalog_sales": "cs_item_sk",
               "web_sales": "ws_item_sk"}[fact]
        m = m.merge(F["item"], left_on=key, right_on="i_item_sk")
    return m


def expected(F, q):
    if q in EXPECTED:
        return EXPECTED[q](F)
    ss, it, dd = F["store_sales"], F["item"], F["date_dim"]

    if q == "q3":
        m = _star(F, "store_sales", "ss_sold_date_sk")
        m = m[(m.i_manufact_id == 128) & (m.d_moy == 11)]
        g = (m.groupby(["d_year", "i_brand", "i_brand_id"])
             .ss_ext_sales_price.sum().reset_index())
        g = g.sort_values(["d_year", "ss_ext_sales_price", "i_brand_id"],
                          ascending=[True, False, True]).head(100)
        return [(int(r.d_year), int(r.i_brand_id), r.i_brand,
                 _r2(r.ss_ext_sales_price)) for r in g.itertuples()]

    if q in ("q7", "q26"):
        fact = "store_sales" if q == "q7" else "catalog_sales"
        p = {"q7": dict(qty="ss_quantity", lp="ss_list_price",
                        cp="ss_coupon_amt", sp="ss_sales_price",
                        cd="ss_cdemo_sk", promo="ss_promo_sk",
                        date="ss_sold_date_sk", item="ss_item_sk"),
             "q26": dict(qty="cs_quantity", lp="cs_list_price",
                         cp="cs_coupon_amt", sp="cs_sales_price",
                         cd="cs_bill_cdemo_sk", promo="cs_promo_sk",
                         date="cs_sold_date_sk", item="cs_item_sk")}[q]
        m = (F[fact]
             .merge(F["customer_demographics"], left_on=p["cd"],
                    right_on="cd_demo_sk")
             .merge(F["date_dim"], left_on=p["date"], right_on="d_date_sk")
             .merge(F["item"], left_on=p["item"], right_on="i_item_sk")
             .merge(F["promotion"], left_on=p["promo"],
                    right_on="p_promo_sk"))
        m = m[(m.cd_gender == "M") & (m.cd_marital_status == "S")
              & (m.cd_education_status == "College")
              & ((m.p_channel_email == "N") | (m.p_channel_event == "N"))
              & (m.d_year == 2000)]
        g = m.groupby("i_item_id").agg(
            agg1=(p["qty"], "mean"), agg2=(p["lp"], "mean"),
            agg3=(p["cp"], "mean"), agg4=(p["sp"], "mean")).reset_index()
        g = g.sort_values("i_item_id").head(100)
        return [(r.i_item_id, _r2(r.agg1), _r2(r.agg2), _r2(r.agg3),
                 _r2(r.agg4)) for r in g.itertuples()]

    if q == "q19":
        m = (_star(F, "store_sales", "ss_sold_date_sk")
             .merge(F["customer"], left_on="ss_customer_sk",
                    right_on="c_customer_sk")
             .merge(F["customer_address"], left_on="c_current_addr_sk",
                    right_on="ca_address_sk")
             .merge(F["store"], left_on="ss_store_sk",
                    right_on="s_store_sk"))
        m = m[(m.i_manager_id == 8) & (m.d_moy == 11) & (m.d_year == 1998)
              & (m.ca_zip.str[:5] != m.s_zip.str[:5])]
        g = (m.groupby(["i_brand", "i_brand_id", "i_manufact_id",
                        "i_manufact"])
             .ss_ext_sales_price.sum().reset_index())
        g = g.sort_values(
            ["ss_ext_sales_price", "i_brand", "i_brand_id",
             "i_manufact_id", "i_manufact"],
            ascending=[False, True, True, True, True]).head(100)
        return [(int(r.i_brand_id), r.i_brand, int(r.i_manufact_id),
                 r.i_manufact, _r2(r.ss_ext_sales_price))
                for r in g.itertuples()]

    if q in ("q42", "q52"):
        m = _star(F, "store_sales", "ss_sold_date_sk")
        m = m[(m.i_manager_id == 1) & (m.d_moy == 11) & (m.d_year == 2000)]
        if q == "q42":
            g = (m.groupby(["d_year", "i_category_id", "i_category"])
                 .ss_ext_sales_price.sum().reset_index())
            g = g.sort_values(
                ["ss_ext_sales_price", "d_year", "i_category_id",
                 "i_category"],
                ascending=[False, True, True, True]).head(100)
            return [(int(r.d_year), int(r.i_category_id), r.i_category,
                     _r2(r.ss_ext_sales_price)) for r in g.itertuples()]
        g = (m.groupby(["d_year", "i_brand", "i_brand_id"])
             .ss_ext_sales_price.sum().reset_index())
        g = g.sort_values(["d_year", "ss_ext_sales_price", "i_brand_id"],
                          ascending=[True, False, True]).head(100)
        return [(int(r.d_year), int(r.i_brand_id), r.i_brand,
                 _r2(r.ss_ext_sales_price)) for r in g.itertuples()]

    if q == "q55":
        m = _star(F, "store_sales", "ss_sold_date_sk")
        m = m[(m.i_manager_id == 28) & (m.d_moy == 11)
              & (m.d_year == 1999)]
        g = (m.groupby(["i_brand", "i_brand_id"])
             .ss_ext_sales_price.sum().reset_index())
        g = g.sort_values(["ss_ext_sales_price", "i_brand_id"],
                          ascending=[False, True]).head(100)
        return [(int(r.i_brand_id), r.i_brand, _r2(r.ss_ext_sales_price))
                for r in g.itertuples()]

    if q == "q96":
        m = (ss.merge(F["time_dim"], left_on="ss_sold_time_sk",
                      right_on="t_time_sk")
             .merge(F["household_demographics"], left_on="ss_hdemo_sk",
                    right_on="hd_demo_sk")
             .merge(F["store"], left_on="ss_store_sk",
                    right_on="s_store_sk"))
        m = m[(m.t_hour == 20) & (m.t_minute >= 30)
              & (m.hd_dep_count == 7) & (m.s_store_name == "ese")]
        return [(len(m),)]

    raise KeyError(q)


# ------------------------------------------------------------ batch 1

def _nsum(s):
    """SQL SUM: NULL (None) over an empty/all-NULL set, not 0."""
    v = s.sum(min_count=1)
    return None if v is None or (isinstance(v, float) and np.isnan(v)) else v


def _q12_family(F, fact, pre, limit):
    extc = f"{pre}_ext_sales_price"
    m = (F[fact].merge(F["item"], left_on=f"{pre}_item_sk",
                       right_on="i_item_sk")
         .merge(F["date_dim"], left_on=f"{pre}_sold_date_sk",
                right_on="d_date_sk"))
    m = m[m.i_category.isin(["Sports", "Books", "Home"])
          & (m.d_date >= _d("1999-02-22")) & (m.d_date <= _d("1999-03-24"))]
    g = (m.groupby(["i_item_id", "i_item_desc", "i_category", "i_class",
                    "i_current_price"])[extc].sum().reset_index()
         .rename(columns={extc: "rev"}))
    g["ratio"] = g.rev * 100.0 / g.groupby("i_class").rev.transform("sum")
    g = g.sort_values(["i_category", "i_class", "i_item_id", "i_item_desc",
                       "ratio"])
    if limit:
        g = g.head(limit)
    return [(r.i_item_id, r.i_item_desc, r.i_category, r.i_class,
             _r2(r.i_current_price), _r2(r.rev), _r2(r.ratio))
            for r in g.itertuples()]


@exp("q12")
def _q12(F):
    return _q12_family(F, "web_sales", "ws", 100)


@exp("q20")
def _q20(F):
    return _q12_family(F, "catalog_sales", "cs", 100)


@exp("q98")
def _q98(F):
    return _q12_family(F, "store_sales", "ss", 0)


def _q37_family(F, fact, itemc, lo, d0, d1, manufs):
    it = F["item"]
    it = it[(it.i_current_price >= lo) & (it.i_current_price <= lo + 30)
            & it.i_manufact_id.isin(manufs)]
    m = (it.merge(F["inventory"], left_on="i_item_sk",
                  right_on="inv_item_sk")
         .merge(F["date_dim"], left_on="inv_date_sk", right_on="d_date_sk"))
    m = m[(m.d_date >= _d(d0)) & (m.d_date <= _d(d1))
          & (m.inv_quantity_on_hand >= 100)
          & (m.inv_quantity_on_hand <= 500)]
    m = m[m.i_item_sk.isin(F[fact][itemc].unique())]
    g = (m[["i_item_id", "i_item_desc", "i_current_price"]]
         .drop_duplicates().sort_values(["i_item_id", "i_item_desc",
                                         "i_current_price"]).head(100))
    return [(r.i_item_id, r.i_item_desc, _r2(r.i_current_price))
            for r in g.itertuples()]


@exp("q37")
def _q37(F):
    return _q37_family(F, "catalog_sales", "cs_item_sk", 68,
                       "2000-02-01", "2000-04-01", [677, 940, 694, 808])


@exp("q82")
def _q82(F):
    return _q37_family(F, "store_sales", "ss_item_sk", 62,
                       "2000-05-25", "2000-07-24", [129, 270, 821, 423])


@exp("q43")
def _q43(F):
    m = (F["store_sales"]
         .merge(F["date_dim"], left_on="ss_sold_date_sk",
                right_on="d_date_sk")
         .merge(F["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    m = m[(m.s_gmt_offset == -5) & (m.d_year == 2000)]
    days = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
            "Friday", "Saturday"]
    rows = []
    for (nm, sid), grp in m.groupby(["s_store_name", "s_store_id"]):
        sums = [_nsum(grp.ss_sales_price[grp.d_day_name == d])
                for d in days]
        rows.append((nm, sid, *[_r2(s) for s in sums]))
    rows.sort(key=lambda r: tuple(
        (v is not None, v) for v in r))
    return rows[:100]


def _q62_family(F, fact, pre, dim, dim_key, dim_name, lower_name):
    f = F[fact]
    m = (f.merge(F["date_dim"], left_on=f"{pre}_ship_date_sk",
                 right_on="d_date_sk")
         .merge(F["warehouse"], left_on=f"{pre}_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(F["ship_mode"], left_on=f"{pre}_ship_mode_sk",
                right_on="sm_ship_mode_sk")
         .merge(F[dim], left_on=f"{pre}_{dim_key}",
                right_on=dim_name))
    m = m[(m.d_month_seq >= 1200) & (m.d_month_seq <= 1211)]
    m["w_substr"] = m.w_warehouse_name.str[:20]
    lag = m[f"{pre}_ship_date_sk"] - m[f"{pre}_sold_date_sk"]
    m["b1"] = (lag <= 30).astype(int)
    m["b2"] = ((lag > 30) & (lag <= 60)).astype(int)
    m["b3"] = ((lag > 60) & (lag <= 90)).astype(int)
    m["b4"] = ((lag > 90) & (lag <= 120)).astype(int)
    m["b5"] = (lag > 120).astype(int)
    namec = {"web_site": "web_name", "call_center": "cc_name"}[dim]
    g = (m.groupby(["w_substr", "sm_type", namec])[
        ["b1", "b2", "b3", "b4", "b5"]].sum().reset_index())
    if lower_name:
        g[namec] = g[namec].str.lower()
    g = g.sort_values(["w_substr", "sm_type", namec]).head(100)
    return [(r.w_substr, r.sm_type, getattr(r, namec), int(r.b1),
             int(r.b2), int(r.b3), int(r.b4), int(r.b5))
            for r in g.itertuples()]


@exp("q62")
def _q62(F):
    return _q62_family(F, "web_sales", "ws", "web_site", "web_site_sk",
                       "web_site_sk", False)


@exp("q99")
def _q99(F):
    return _q62_family(F, "catalog_sales", "cs", "call_center",
                       "call_center_sk", "cc_call_center_sk", True)


@exp("q13")
def _q13(F):
    m = (F["store_sales"]
         .merge(F["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(F["customer_demographics"], left_on="ss_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(F["household_demographics"], left_on="ss_hdemo_sk",
                right_on="hd_demo_sk")
         .merge(F["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk")
         .merge(F["date_dim"], left_on="ss_sold_date_sk",
                right_on="d_date_sk"))
    m = m[m.d_year == 2001]
    demo = (((m.cd_marital_status == "M")
             & (m.cd_education_status == "Advanced Degree")
             & m.ss_sales_price.between(100.0, 150.0)
             & (m.hd_dep_count == 3))
            | ((m.cd_marital_status == "S")
               & (m.cd_education_status == "College")
               & m.ss_sales_price.between(50.0, 100.0)
               & (m.hd_dep_count == 1))
            | ((m.cd_marital_status == "W")
               & (m.cd_education_status == "2 yr Degree")
               & m.ss_sales_price.between(150.0, 200.0)
               & (m.hd_dep_count == 1)))
    addr = ((m.ca_country == "United States")
            & ((m.ca_state.isin(["TX", "OH"])
                & m.ss_net_profit.between(100, 200))
               | (m.ca_state.isin(["OR", "NM", "KY"])
                  & m.ss_net_profit.between(150, 300))
               | (m.ca_state.isin(["VA", "TX", "MS"])
                  & m.ss_net_profit.between(50, 250))))
    m = m[demo & addr]
    if not len(m):
        return [(None, None, None, None)]
    return [(_r2(m.ss_quantity.mean()), _r2(m.ss_ext_sales_price.mean()),
             _r2(m.ss_ext_wholesale_cost.mean()),
             _r2(m.ss_ext_wholesale_cost.sum()))]


@exp("q15")
def _q15(F):
    m = (F["catalog_sales"]
         .merge(F["customer"], left_on="cs_bill_customer_sk",
                right_on="c_customer_sk")
         .merge(F["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(F["date_dim"], left_on="cs_sold_date_sk",
                right_on="d_date_sk"))
    zips = ["85669", "86197", "88274", "83405", "86475", "85392", "85460",
            "80348", "81792"]
    m = m[(m.ca_zip.str[:5].isin(zips) | m.ca_state.isin(["CA", "WA", "GA"])
           | (m.cs_sales_price > 500))
          & (m.d_qoy == 2) & (m.d_year == 2001)]
    g = m.groupby("ca_zip").cs_sales_price.sum().reset_index()
    g = g.sort_values("ca_zip").head(100)
    return [(r.ca_zip, _r2(r.cs_sales_price)) for r in g.itertuples()]


@exp("q21")
def _q21(F):
    it = F["item"]
    it = it[(it.i_current_price >= 0.99) & (it.i_current_price <= 1.49)]
    m = (F["inventory"]
         .merge(F["warehouse"], left_on="inv_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(it, left_on="inv_item_sk", right_on="i_item_sk")
         .merge(F["date_dim"], left_on="inv_date_sk", right_on="d_date_sk"))
    m = m[(m.d_date >= _d("2000-02-10")) & (m.d_date <= _d("2000-04-10"))]
    cut = _d("2000-03-11")
    m["before"] = np.where(m.d_date < cut, m.inv_quantity_on_hand, 0)
    m["after"] = np.where(m.d_date >= cut, m.inv_quantity_on_hand, 0)
    g = (m.groupby(["w_warehouse_name", "i_item_id"])[["before", "after"]]
         .sum().reset_index())
    ratio = np.where(g.before > 0, g.after / g.before, np.nan)
    g = g[(ratio >= 2.0 / 3.0) & (ratio <= 3.0 / 2.0)]
    g = g.sort_values(["w_warehouse_name", "i_item_id"]).head(100)
    return [(r.w_warehouse_name, r.i_item_id, int(r.before), int(r.after))
            for r in g.itertuples()]


def _three_fact(F, d1f, d2f, d3f):
    """ss ⋈ sr (ticket) ⋈ cs (returned customer+item) with per-alias
    date_dim filters d1f/d2f/d3f applied to dataframes of date_dim."""
    dd = F["date_dim"]
    d1 = dd[d1f(dd)][["d_date_sk"]]
    d2 = dd[d2f(dd)][["d_date_sk"]]
    d3 = dd[d3f(dd)][["d_date_sk"]]
    m = (F["store_sales"]
         .merge(d1, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(F["store_returns"],
                left_on=["ss_customer_sk", "ss_item_sk",
                         "ss_ticket_number"],
                right_on=["sr_customer_sk", "sr_item_sk",
                          "sr_ticket_number"])
         .merge(d2, left_on="sr_returned_date_sk", right_on="d_date_sk")
         .merge(F["catalog_sales"],
                left_on=["sr_customer_sk", "sr_item_sk"],
                right_on=["cs_bill_customer_sk", "cs_item_sk"])
         .merge(d3, left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(F["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(F["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    return m


@exp("q25")
def _q25(F):
    m = _three_fact(
        F,
        lambda d: (d.d_moy == 4) & (d.d_year == 2001),
        lambda d: d.d_moy.between(4, 10) & (d.d_year == 2001),
        lambda d: d.d_moy.between(4, 10) & (d.d_year == 2001))
    rows = []
    for k, grp in m.groupby(["i_item_id", "i_item_desc", "s_store_id",
                             "s_store_name"]):
        rows.append((*k, _r2(_nsum(grp.ss_net_profit)),
                     _r2(_nsum(grp.sr_net_loss)),
                     _r2(_nsum(grp.cs_net_profit))))
    rows.sort(key=lambda r: r[:4])
    return rows[:100]


@exp("q29")
def _q29(F):
    m = _three_fact(
        F,
        lambda d: (d.d_moy == 9) & (d.d_year == 1999),
        lambda d: d.d_moy.between(9, 12) & (d.d_year == 1999),
        lambda d: d.d_year.isin([1999, 2000, 2001]))
    rows = []
    for k, grp in m.groupby(["i_item_id", "i_item_desc", "s_store_id",
                             "s_store_name"]):
        rows.append((*k, int(grp.ss_quantity.sum()),
                     int(grp.sr_return_quantity.sum()),
                     int(grp.cs_quantity.sum())))
    rows.sort(key=lambda r: r[:4])
    return rows[:100]


@exp("q17")
def _q17(F):
    m = _three_fact(
        F,
        lambda d: d.d_quarter_name == "2001Q1",
        lambda d: d.d_quarter_name.isin(["2001Q1", "2001Q2", "2001Q3"]),
        lambda d: d.d_quarter_name.isin(["2001Q1", "2001Q2", "2001Q3"]))
    rows = []
    for k, grp in m.groupby(["i_item_id", "i_item_desc", "s_state"]):
        out = list(k)
        for col in ["ss_quantity", "sr_return_quantity", "cs_quantity"]:
            s = grp[col]
            cnt = int(s.count())
            ave = s.mean()
            std = s.std(ddof=1) if cnt > 1 else None
            cov = (std / ave) if (std is not None and ave) else None
            out += [cnt, _r2(ave), _r2(std), _r2(cov)]
        rows.append(tuple(out))
    rows.sort(key=lambda r: r[:3])
    return rows[:100]


# The float (money/avg) column positions per query's output row
_FLOAT_COLS = {
    "q3": {3}, "q7": {1, 2, 3, 4}, "q19": {4}, "q26": {1, 2, 3, 4},
    "q42": {3}, "q52": {3}, "q55": {2}, "q96": set(),
    "q12": {4: 0.02, 5: 1.0, 6: 0.05},
    "q20": {4: 0.02, 5: 1.0, 6: 0.05},
    "q98": {4: 0.02, 5: 1.0, 6: 0.05},
    "q37": {2}, "q82": {2},
    "q43": {i: 1.0 for i in range(2, 9)},
    "q13": {0: 0.05, 1: 0.05, 2: 0.05, 3: 1.0},
    "q15": {1: 1.0},
    "q25": {4: 1.0, 5: 1.0, 6: 1.0},
    "q17": {4: 0.05, 5: 0.05, 6: 0.05, 8: 0.05, 9: 0.05, 10: 0.05,
            12: 0.05, 13: 0.05, 14: 0.05},
}
# Money *sums* accumulate rounding differences; widen their tolerance
_SUM_TOL = {"q3": 1.0, "q19": 1.0, "q42": 1.0, "q52": 1.0, "q55": 1.0}


def check_query(F, q, got):
    want = expected(F, q)
    got_t = [tuple(int(v) if isinstance(v, (bool, np.integer)) else v
                   for v in r) for r in got]
    return _rows_close(got_t, want, _FLOAT_COLS.get(q, set()),
                       tol=_SUM_TOL.get(q, 0.02))
