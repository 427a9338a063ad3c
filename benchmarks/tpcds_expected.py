"""Independent pandas implementations of the TPC-DS queries over the
synthetic corpus, used to verify every engine result before timing
(mirrors the tpch.py expected()/check() split)."""

from __future__ import annotations

import numpy as np


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
    if len(got) != len(want):
        return False
    for g, w in zip(got, want):
        if len(g) != len(w):
            return False
        for i, (a, b) in enumerate(zip(g, w)):
            if i in float_cols:
                if not _close(a, b, tol):
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


# The float (money/avg) column positions per query's output row
_FLOAT_COLS = {
    "q3": {3}, "q7": {1, 2, 3, 4}, "q19": {4}, "q26": {1, 2, 3, 4},
    "q42": {3}, "q52": {3}, "q55": {2}, "q96": set(),
}
# Money *sums* accumulate rounding differences; widen their tolerance
_SUM_TOL = {"q3": 1.0, "q19": 1.0, "q42": 1.0, "q52": 1.0, "q55": 1.0}


def check_query(F, q, got):
    want = expected(F, q)
    got_t = [tuple(int(v) if isinstance(v, (bool, np.integer)) else v
                   for v in r) for r in got]
    return _rows_close(got_t, want, _FLOAT_COLS.get(q, set()),
                       tol=_SUM_TOL.get(q, 0.02))
