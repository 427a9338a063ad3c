"""TPC-DS harness (reference: tests/sqllogictests/suites/tpcds/Q1-Q99).

Query shapes are the TPC-DS spec text, kept verbatim from the reference
suite files (same methodology as benchmarks/tpch.py). Data is synthetic
dsdgen-shaped numpy: the real star schema (3 sales channels + returns +
inventory, 17 dimensions), value domains chosen so every query's filters
hit, and every result verified against an independent pandas
implementation before timing.

Run:  python benchmarks/tpcds.py [--sf 0.01] [--queries q3,q7]
(sf 0.01 ~ 29k store_sales rows; sf 1 ~ 2.9M).
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

from tpcds_queries import QUERIES  # noqa: E402  (same dir)

EPOCH = dt.date(1970, 1, 1)
D0 = dt.date(1998, 1, 1)
N_DATES = (dt.date(2003, 12, 31) - D0).days + 1

CATEGORIES = ["Books", "Children", "Electronics", "Home", "Jewelry",
              "Men", "Music", "Shoes", "Sports", "Women"]
CLASSES = ["accent", "bedding", "blinds", "curtains", "decor", "flatware",
           "furniture", "glassware", "kids", "lighting", "mattresses",
           "paint", "rugs", "tables", "wallpaper", "accessories",
           "personal", "portable", "reference", "self-help",
           "classical", "fragrances", "pants", "computers", "stereo",
           "football", "shirts", "birdal", "dresses", "maternity"]
COLORS = ["aquamarine", "azure", "beige", "black", "blue", "brown",
          "burlywood", "chartreuse", "chiffon", "chocolate", "coral",
          "cornflower", "cream", "cyan", "dark", "dim", "dodger", "drab",
          "firebrick", "floral", "forest", "frosted", "gainsboro", "ghost",
          "goldenrod", "green", "grey", "honeydew", "hot", "indian",
          "ivory", "khaki", "lace", "lavender", "lawn", "lemon", "light",
          "lime", "linen", "magenta", "deep", "medium", "midnight",
          "orange", "papaya", "peach", "powder", "purple", "snow",
          "spring", "slate", "blanched", "burnished"]
UNITS = ["Bunch", "Bundle", "Box", "Carton", "Case", "Cup", "Dozen",
         "Dram", "Each", "Gram", "Gross", "Lb", "N/A", "Ounce", "Oz",
         "Pallet", "Pound", "Tbl", "Ton", "Tsp", "Unknown"]
SIZES = ["N/A", "economy", "extra large", "large", "medium", "petite",
         "small"]
STATES = ["TN", "SC", "AL", "GA", "KY", "VA", "NC", "MS", "FL", "TX",
          "AR", "CA", "CO", "CT", "IA", "IL", "IN", "LA", "MN", "ND",
          "NJ", "NM", "OH", "OK", "OR", "WA"]
COUNTIES = ["Williamson County", "Ziebach County", "Walker County",
            "Daviess County", "Barrow County", "Fairfield County",
            "Bronx County", "Franklin Parish", "Mobile County",
            "Luce County", "Orange County", "Rush County",
            "Toole County", "Jefferson County", "Dona Ana County",
            "La Porte County"]
CITIES = ["Midway", "Fairview", "Oak Grove", "Five Points", "Oakland",
          "Edgewood",
          "Riverside", "Salem", "Georgetown", "Centerville", "Liberty",
          "Greenfield", "Oakdale", "Glenwood", "Union", "Wilson",
          "Greenwood", "Franklin", "Springfield", "Marion", "Bethel"]
COUNTRIES = ["UNITED STATES", "CANADA", "MEXICO", "BRAZIL", "GERMANY",
             "FRANCE", "ITALY", "JAPAN", "CHINA", "INDIA", "AUSTRALIA",
             "NETHERLANDS"]
EDUCATION = ["Primary", "Secondary", "College", "2 yr Degree",
             "4 yr Degree", "Advanced Degree", "Unknown"]
MARITAL = ["M", "S", "D", "W", "U"]
CREDIT = ["Low Risk", "Good", "High Risk", "Unknown"]
BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000",
                 "0-500", "Unknown"]
FIRST_NAMES = ["James", "John", "Robert", "Michael", "William", "David",
               "Mary", "Patricia", "Linda", "Barbara", "Elizabeth",
               "Jennifer", "Maria", "Susan", "Margaret", "Dorothy"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Jones", "Brown", "Davis",
              "Miller", "Wilson", "Moore", "Taylor", "Anderson", "Thomas",
              "Jackson", "White", "Harris", "Martin"]
DAY_NAMES = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]
SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "LIBRARY"]
SM_CARRIERS = ["UPS", "FEDEX", "AIRBORNE", "USPS", "DHL", "TBS", "ZHOU",
               "LATVIAN", "DIAMOND", "BARIAN"]
MEALS = ["breakfast", "dinner", "lunch", ""]
PROMO_NAMES = ["ought", "able", "pri", "ese", "anti", "cally", "ation",
               "eing", "n st", "bar"]
STORE_NAMES = ["ought", "able", "ese", "anti", "cally", "ation", "eing",
               "bar", "pri", "n st"]
BRANDS = ["scholaramalgamalg #14", "scholaramalgamalg #7",
          "exportiunivamalg #9", "scholaramalgamalg #9",
          "amalgimporto #1", "edu packscholar #1",
          "exportiimporto #1", "importoamalg #1", "amalgamalg #2",
          "edu packamalg #1", "exportischolar #1", "importoscholar #2",
          "corpunivamalg #6", "univmaxi #5", "amalgnameless #3",
          "exportiexporti #1", "brandbrand #4", "corpcorp #2",
          "maxinameless #8", "univbrand #3", "importounivamalg #11",
          "scholarbrand #5", "edu packexporti #2", "amalgexporti #1",
          "brandcorp #7", "namelesscorp #9", "univamalgamalg #12",
          "maxibrand #6", "corpmaxi #10", "edu packbrand #4",
          "importobrand #2", "scholarmaxi #8", "namelessbrand #5",
          "amalgcorp #8", "univunivamalg #4", "exportibrand #3",
          "corpbrand #1", "maxicorp #7", "namelessunivamalg #13",
          "edu packmaxi #11"]


def _date_sk(s: str) -> int:
    """d_date_sk of an ISO date (0-based day offset from 1998-01-01)."""
    return (dt.date.fromisoformat(s) - D0).days


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(sf: float, seed: int = 7):
    rng = np.random.default_rng(seed)
    n_item = max(int(18_000 * sf), 240)
    n_cust = max(int(100_000 * sf), 1_000)
    n_addr = max(n_cust // 2, 500)
    n_cd = 19_600
    n_hd = 7_200
    n_store = 12
    n_wh = 5
    n_promo = max(int(300 * sf), 32)
    n_web_site = 30
    n_web_page = 60
    n_cc = 6
    n_cp = max(int(11_000 * sf), 120)
    n_ss = max(int(2_880_000 * sf), 24_000)
    n_cs = max(int(1_440_000 * sf), 12_000)
    n_ws = max(int(720_000 * sf), 6_000)

    data = {}

    # ------------------------------------------------------------ date_dim
    days = np.arange(N_DATES)
    dates = [D0 + dt.timedelta(days=int(i)) for i in range(N_DATES)]
    years = np.array([d.year for d in dates])
    moys = np.array([d.month for d in dates])
    doms = np.array([d.day for d in dates])
    dows = np.array([d.weekday() for d in dates])
    data["date_dim"] = {
        "d_date_sk": days,
        "d_date": np.array([(d - EPOCH).days for d in dates]),
        "d_year": years,
        "d_moy": moys,
        "d_dom": doms,
        "d_qoy": (moys - 1) // 3 + 1,
        "d_dow": dows,
        "d_day_name": np.array(DAY_NAMES)[dows],
        "d_month_seq": (years - 1998) * 12 + moys - 1 + 1176,
        "d_week_seq": days // 7 + 5270,
        "d_quarter_name": np.array(
            [f"{y}Q{q}" for y, q in zip(years, (moys - 1) // 3 + 1)]),
        "d_fy_year": years,
    }

    # ------------------------------------------------------------ time_dim
    tmin = np.arange(1440)
    data["time_dim"] = {
        "t_time_sk": tmin,
        "t_time": tmin * 60,
        "t_hour": tmin // 60,
        "t_minute": tmin % 60,
        "t_meal_time": np.where(
            (tmin // 60 >= 6) & (tmin // 60 < 9), "breakfast",
            np.where((tmin // 60 >= 17) & (tmin // 60 < 21), "dinner", "")),
    }

    # ---------------------------------------------------------------- item
    isk = np.arange(n_item)
    cat_id = rng.integers(1, 11, n_item)
    class_id = rng.integers(1, len(CLASSES) + 1, n_item)
    brand_id = cat_id * 1_000_000 + class_id * 1_000 + rng.integers(
        1, 11, n_item)
    manufact_id = rng.integers(1, 201, n_item)
    manager_id = rng.integers(1, 101, n_item)
    data["item"] = {
        "i_item_sk": isk,
        # item_ids repeat across sks (dsdgen revision chains): queries
        # grouping by i_item_id rely on that
        "i_item_id": np.array(
            [f"AAAAAAAA{j % (n_item // 2):08d}" for j in isk]),
        "i_item_desc": np.array(
            [f"desc {COLORS[j % len(COLORS)]} {j % 97}" for j in isk]),
        "i_category_id": cat_id,
        "i_category": np.array(CATEGORIES)[cat_id - 1],
        "i_class_id": class_id,
        "i_class": np.array(CLASSES)[class_id - 1],
        "i_brand_id": brand_id,
        # Knuth-hash the brand_id so all BRANDS appear (brand_id's
        # 1e6/1e3 components are multiples of len(BRANDS))
        "i_brand": np.array(BRANDS)[
            (brand_id * 2654435761) % (2**32) % len(BRANDS)],
        "i_manufact_id": manufact_id,
        "i_manufact": np.array([f"manufact{m}" for m in manufact_id]),
        "i_manager_id": manager_id,
        "i_current_price": _money(rng, 0.09, 99.0, n_item),
        "i_wholesale_cost": _money(rng, 0.05, 70.0, n_item),
        "i_color": np.array(COLORS)[rng.integers(0, len(COLORS), n_item)],
        "i_units": np.array(UNITS)[rng.integers(0, len(UNITS), n_item)],
        "i_size": np.array(SIZES)[rng.integers(0, len(SIZES), n_item)],
        "i_product_name": np.array([f"product{j}" for j in isk]),
    }

    # --------------------------------------------------------------- store
    ssk = np.arange(n_store)
    data["store"] = {
        "s_store_sk": ssk,
        "s_store_id": np.array([f"AAAAAAAA{j:08d}" for j in ssk]),
        "s_store_name": np.array(STORE_NAMES)[ssk % len(STORE_NAMES)],
        "s_state": np.where(ssk % 3 == 0, "TN",
                            np.array(STATES)[ssk % len(STATES)]),
        "s_county": np.array(COUNTIES)[ssk % len(COUNTIES)],
        "s_city": np.array(CITIES)[ssk % len(CITIES)],
        "s_zip": np.array([f"{35000 + 137 * j % 65000:05d}" for j in ssk]),
        "s_number_employees": 200 + ssk * 7 % 100,
        "s_company_id": np.ones(n_store, np.int64),
        "s_company_name": np.array(["Unknown"] * n_store),
        "s_market_id": ssk % 10 + 1,
        "s_gmt_offset": np.full(n_store, -5.0),
        "s_street_number": np.array(
            [str(100 + 37 * j) for j in ssk]),
        "s_street_name": np.array(
            ["Main", "Oak", "Elm", "Park", "Lake", "Hill", "Maple",
             "Cedar", "Pine", "Walnut", "First", "Second"])[ssk % 12],
        "s_street_type": np.array(
            ["Street", "Ave", "Blvd", "Way", "Ct", "Dr"])[ssk % 6],
        "s_suite_number": np.array([f"Suite {j * 10}" for j in ssk]),
    }

    # ---------------------------------------------------------- warehouse
    wsk = np.arange(n_wh)
    data["warehouse"] = {
        "w_warehouse_sk": wsk,
        "w_warehouse_name": np.array(
            [f"Warehouse {'ABCDE'[j]}" for j in wsk]),
        "w_warehouse_sq_ft": 50_000 + wsk * 17_131,
        "w_state": np.array(STATES)[wsk % len(STATES)],
        "w_county": np.array(COUNTIES)[wsk % len(COUNTIES)],
        "w_city": np.array(CITIES)[wsk % len(CITIES)],
        "w_country": np.array(["United States"] * n_wh),
    }

    # ---------------------------------------------------- customer_address
    ask = np.arange(n_addr)
    data["customer_address"] = {
        "ca_address_sk": ask,
        "ca_address_id": np.array([f"AAAAAAAA{j:08d}" for j in ask]),
        "ca_state": np.array(STATES)[rng.integers(0, len(STATES), n_addr)],
        "ca_county": np.array(COUNTIES)[
            rng.integers(0, len(COUNTIES), n_addr)],
        "ca_city": np.array(CITIES)[rng.integers(0, len(CITIES), n_addr)],
        # ~20% of addresses share a store zip (q24's s_zip = ca_zip
        # join; dsdgen towns host both stores and customers)
        "ca_zip": np.where(
            rng.random(n_addr) < 0.2,
            np.array([f"{35000 + 137 * j % 65000:05d}"
                      for j in rng.integers(0, 12, n_addr)]),
            np.array([f"{z:05d}" for z in
                      rng.integers(10000, 99999, n_addr)])),
        "ca_country": np.array(["United States"] * n_addr),
        "ca_gmt_offset": rng.choice([-5.0, -6.0, -7.0, -8.0], n_addr,
                                    p=[0.55, 0.25, 0.12, 0.08]),
        "ca_location_type": rng.choice(
            ["apartment", "condo", "single family"], n_addr),
        "ca_street_number": np.array(
            [str(v) for v in rng.integers(1, 1000, n_addr)]),
        "ca_street_name": rng.choice(
            ["Main", "Oak", "Elm", "Park", "Lake", "Hill", "Maple",
             "Cedar", "Pine", "Walnut"], n_addr),
        "ca_suite_number": np.array(
            [f"Suite {v}" for v in rng.integers(0, 500, n_addr)]),
        "ca_street_type": rng.choice(
            ["Street", "Ave", "Blvd", "Way", "Ct", "Dr", "Ln"], n_addr),
    }

    # ------------------------------------------------ customer_demographics
    cdk = np.arange(n_cd)
    data["customer_demographics"] = {
        "cd_demo_sk": cdk,
        "cd_gender": np.array(["M", "F"])[cdk % 2],
        "cd_marital_status": np.array(MARITAL)[(cdk // 2) % 5],
        "cd_education_status": np.array(EDUCATION)[(cdk // 10) % 7],
        "cd_purchase_estimate": ((cdk // 70) % 20 + 1) * 500,
        "cd_credit_rating": np.array(CREDIT)[(cdk // 1400) % 4],
        "cd_dep_count": (cdk // 5600) % 7,
        "cd_dep_employed_count": (cdk // 11) % 7,
        "cd_dep_college_count": (cdk // 13) % 7,
    }

    # ----------------------------------------------- household_demographics
    hdk = np.arange(n_hd)
    data["household_demographics"] = {
        "hd_demo_sk": hdk,
        "hd_income_band_sk": hdk % 20 + 1,
        "hd_buy_potential": np.array(BUY_POTENTIAL)[(hdk // 20) % 6],
        "hd_dep_count": (hdk // 120) % 10,
        "hd_vehicle_count": (hdk // 1200) % 6 - 1,
    }

    ibk = np.arange(1, 21)
    data["income_band"] = {
        "ib_income_band_sk": ibk,
        "ib_lower_bound": (ibk - 1) * 10_000,
        "ib_upper_bound": ibk * 10_000,
    }

    # ------------------------------------------------------------ customer
    csk = np.arange(n_cust)
    data["customer"] = {
        "c_customer_sk": csk,
        "c_customer_id": np.array([f"AAAAAAAA{j:011d}" for j in csk]),
        "c_first_name": np.array(FIRST_NAMES)[
            rng.integers(0, len(FIRST_NAMES), n_cust)],
        "c_last_name": np.array(LAST_NAMES)[
            rng.integers(0, len(LAST_NAMES), n_cust)],
        "c_salutation": rng.choice(
            ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"], n_cust),
        "c_preferred_cust_flag": rng.choice(["Y", "N"], n_cust),
        "c_current_addr_sk": rng.integers(0, n_addr, n_cust),
        "c_current_cdemo_sk": rng.integers(0, n_cd, n_cust),
        "c_current_hdemo_sk": rng.integers(0, n_hd, n_cust),
        "c_birth_year": rng.integers(1924, 1993, n_cust),
        "c_birth_month": rng.integers(1, 13, n_cust),
        "c_birth_day": rng.integers(1, 29, n_cust),
        "c_birth_country": np.array(COUNTRIES)[
            rng.integers(0, len(COUNTRIES), n_cust)],
        "c_email_address": np.array(
            [f"c{j}@example.com" for j in csk]),
        "c_login": np.array([""] * n_cust),
        "c_first_sales_date_sk": rng.integers(0, N_DATES, n_cust),
        "c_first_shipto_date_sk": rng.integers(0, N_DATES, n_cust),
        "c_last_review_date_sk": rng.integers(0, N_DATES, n_cust),
    }

    # ----------------------------------------------------------- promotion
    psk = np.arange(n_promo)
    data["promotion"] = {
        "p_promo_sk": psk,
        "p_promo_id": np.array([f"AAAAAAAA{j:08d}" for j in psk]),
        "p_promo_name": np.array(PROMO_NAMES)[psk % len(PROMO_NAMES)],
        "p_channel_dmail": rng.choice(["Y", "N"], n_promo),
        "p_channel_email": rng.choice(["Y", "N"], n_promo),
        "p_channel_tv": rng.choice(["Y", "N"], n_promo),
        "p_channel_event": rng.choice(["Y", "N"], n_promo),
        "p_channel_catalog": rng.choice(["Y", "N"], n_promo),
        "p_cost": _money(rng, 500, 2000, n_promo),
    }

    # ----------------------------------------------------------- ship_mode
    smk = np.arange(20)
    data["ship_mode"] = {
        "sm_ship_mode_sk": smk,
        "sm_ship_mode_id": np.array([f"AAAAAAAA{j:08d}" for j in smk]),
        "sm_type": np.array(SM_TYPES)[smk % 5],
        "sm_carrier": np.array(SM_CARRIERS)[smk % 10],
        "sm_code": rng.choice(["AIR", "SURFACE", "SEA"], 20),
    }

    rk = np.arange(35)
    data["reason"] = {
        "r_reason_sk": rk,
        "r_reason_id": np.array([f"AAAAAAAA{j:08d}" for j in rk]),
        "r_reason_desc": np.array([f"reason {j}" for j in rk]),
    }

    cck = np.arange(n_cc)
    data["call_center"] = {
        "cc_call_center_sk": cck,
        "cc_call_center_id": np.array([f"AAAAAAAA{j:08d}" for j in cck]),
        "cc_name": np.array([f"call center {j}" for j in cck]),
        "cc_county": np.array(COUNTIES)[cck % len(COUNTIES)],
        "cc_manager": np.array(FIRST_NAMES)[cck % len(FIRST_NAMES)],
    }

    wbk = np.arange(n_web_site)
    data["web_site"] = {
        "web_site_sk": wbk,
        "web_site_id": np.array([f"AAAAAAAA{j:08d}" for j in wbk]),
        "web_name": np.array([f"site_{j % 6}" for j in wbk]),
        "web_company_name": np.array(PROMO_NAMES)[wbk % len(PROMO_NAMES)],
    }

    wpk = np.arange(n_web_page)
    data["web_page"] = {
        "wp_web_page_sk": wpk,
        "wp_web_page_id": np.array([f"AAAAAAAA{j:08d}" for j in wpk]),
        "wp_char_count": rng.integers(100, 8_000, n_web_page),
    }

    cpk = np.arange(n_cp)
    data["catalog_page"] = {
        "cp_catalog_page_sk": cpk,
        "cp_catalog_page_id": np.array([f"AAAAAAAA{j:08d}" for j in cpk]),
    }

    # ---------------------------------------------------------- store_sales
    # tickets group ~3 lines with one customer/store/date (Q34/Q73 count
    # lines per ticket)
    n_tickets = n_ss // 3
    t_cust = rng.integers(0, n_cust, n_tickets)
    t_store = rng.integers(0, n_store, n_tickets)
    t_date = rng.integers(0, N_DATES - 60, n_tickets)
    t_hdemo = rng.integers(0, n_hd, n_tickets)
    t_addr = rng.integers(0, n_addr, n_tickets)
    t_time = rng.integers(0, 1440, n_tickets)
    lines_per = rng.integers(1, 6, n_tickets)
    ticket_of = np.repeat(np.arange(n_tickets), lines_per)[:n_ss]
    if len(ticket_of) < n_ss:
        ticket_of = np.concatenate(
            [ticket_of, rng.integers(0, n_tickets, n_ss - len(ticket_of))])
    n_ss = len(ticket_of)
    qty = rng.integers(1, 101, n_ss).astype(np.float64)
    whole = _money(rng, 1, 100, n_ss)
    lst = np.round(whole * rng.uniform(1.0, 1.5, n_ss), 2)
    price = np.round(lst * rng.uniform(0.02, 1.0, n_ss), 2)
    ext_sales = np.round(price * qty, 2)
    ext_whole = np.round(whole * qty, 2)
    ext_list = np.round(lst * qty, 2)
    coupon = np.where(rng.random(n_ss) < 0.1,
                      np.round(ext_sales * rng.uniform(0, 0.5, n_ss), 2),
                      0.0)
    net_paid = np.round(ext_sales - coupon, 2)
    tax = np.round(net_paid * 0.06, 2)
    data["store_sales"] = {
        "ss_sold_date_sk": t_date[ticket_of],
        "ss_sold_time_sk": t_time[ticket_of],
        "ss_item_sk": rng.integers(0, n_item, n_ss),
        "ss_customer_sk": t_cust[ticket_of],
        "ss_cdemo_sk": rng.integers(0, n_cd, n_ss),
        "ss_hdemo_sk": t_hdemo[ticket_of],
        "ss_addr_sk": np.ma.masked_array(
            t_addr[ticket_of], rng.random(n_ss) < 0.02),
        "ss_store_sk": np.ma.masked_array(
            t_store[ticket_of], rng.random(n_ss) < 0.01),
        "ss_promo_sk": rng.integers(0, n_promo, n_ss),
        "ss_ticket_number": ticket_of,
        "ss_quantity": qty,
        "ss_wholesale_cost": whole,
        "ss_list_price": lst,
        "ss_sales_price": price,
        "ss_ext_discount_amt": np.round((lst - price) * qty, 2),
        "ss_ext_sales_price": ext_sales,
        "ss_ext_wholesale_cost": ext_whole,
        "ss_ext_list_price": ext_list,
        "ss_ext_tax": tax,
        "ss_coupon_amt": coupon,
        "ss_net_paid": net_paid,
        "ss_net_paid_inc_tax": np.round(net_paid + tax, 2),
        "ss_net_profit": np.round(net_paid - ext_whole, 2),
    }

    # -------------------------------------------------------- store_returns
    r_idx = rng.choice(n_ss, n_ss // 10, replace=False)
    r_qty = np.minimum(qty[r_idx],
                       rng.integers(1, 101, len(r_idx))).astype(np.float64)
    r_amt = np.round(price[r_idx] * r_qty, 2)
    data["store_returns"] = {
        "sr_returned_date_sk": np.minimum(
            data["store_sales"]["ss_sold_date_sk"][r_idx]
            + rng.integers(1, 60, len(r_idx)), N_DATES - 1),
        "sr_item_sk": data["store_sales"]["ss_item_sk"][r_idx],
        "sr_customer_sk": data["store_sales"]["ss_customer_sk"][r_idx],
        "sr_cdemo_sk": data["store_sales"]["ss_cdemo_sk"][r_idx],
        "sr_store_sk": data["store_sales"]["ss_store_sk"][r_idx],
        "sr_reason_sk": rng.integers(0, 35, len(r_idx)),
        "sr_ticket_number": data["store_sales"]["ss_ticket_number"][r_idx],
        "sr_return_quantity": r_qty,
        "sr_return_amt": r_amt,
        "sr_return_tax": np.round(r_amt * 0.06, 2),
        "sr_return_amt_inc_tax": np.round(r_amt * 1.06, 2),
        "sr_fee": _money(rng, 0.5, 100, len(r_idx)),
        "sr_return_ship_cost": _money(rng, 0, 500, len(r_idx)),
        "sr_refunded_cash": np.round(r_amt * rng.uniform(0, 1, len(r_idx)),
                                     2),
        "sr_reversed_charge": _money(rng, 0, 50, len(r_idx)),
        "sr_store_credit": _money(rng, 0, 50, len(r_idx)),
        "sr_net_loss": _money(rng, 0.5, 1000, len(r_idx)),
    }

    # --------------------------------------------------------- catalog_sales
    n_orders_cs = n_cs // 2
    o_cust = rng.integers(0, n_cust, n_orders_cs)
    o_date = rng.integers(0, N_DATES - 150, n_orders_cs)
    order_of = np.repeat(np.arange(n_orders_cs), 2)[:n_cs]
    qty_c = rng.integers(1, 101, n_cs).astype(np.float64)
    whole_c = _money(rng, 1, 100, n_cs)
    lst_c = np.round(whole_c * rng.uniform(1.0, 1.5, n_cs), 2)
    price_c = np.round(lst_c * rng.uniform(0.02, 1.0, n_cs), 2)
    ext_sales_c = np.round(price_c * qty_c, 2)
    ext_whole_c = np.round(whole_c * qty_c, 2)
    coupon_c = np.where(rng.random(n_cs) < 0.1,
                        np.round(ext_sales_c * rng.uniform(0, 0.5, n_cs), 2),
                        0.0)
    net_paid_c = np.round(ext_sales_c - coupon_c, 2)
    tax_c = np.round(net_paid_c * 0.06, 2)
    ship_cost_c = _money(rng, 0.5, 500, n_cs)
    data["catalog_sales"] = {
        "cs_sold_date_sk": o_date[order_of],
        "cs_sold_time_sk": rng.integers(0, 1440, n_cs),
        "cs_ship_date_sk": np.minimum(
            o_date[order_of] + rng.integers(1, 120, n_cs), N_DATES - 1),
        "cs_bill_customer_sk": o_cust[order_of],
        "cs_bill_cdemo_sk": rng.integers(0, n_cd, n_cs),
        "cs_bill_hdemo_sk": rng.integers(0, n_hd, n_cs),
        "cs_bill_addr_sk": rng.integers(0, n_addr, n_cs),
        "cs_ship_customer_sk": np.where(
            rng.random(n_cs) < 0.85, o_cust[order_of],
            rng.integers(0, n_cust, n_cs)),
        "cs_ship_addr_sk": np.ma.masked_array(
            rng.integers(0, n_addr, n_cs), rng.random(n_cs) < 0.01),
        "cs_ship_mode_sk": rng.integers(0, 20, n_cs),
        "cs_call_center_sk": rng.integers(0, n_cc, n_cs),
        "cs_warehouse_sk": rng.integers(0, n_wh, n_cs),
        "cs_catalog_page_sk": rng.integers(0, n_cp, n_cs),
        "cs_item_sk": rng.integers(0, n_item, n_cs),
        "cs_promo_sk": np.ma.masked_array(
            rng.integers(0, n_promo, n_cs), rng.random(n_cs) < 0.03),
        "cs_order_number": order_of,
        "cs_quantity": qty_c,
        "cs_wholesale_cost": whole_c,
        "cs_list_price": lst_c,
        "cs_sales_price": price_c,
        "cs_ext_discount_amt": np.round((lst_c - price_c) * qty_c, 2),
        "cs_ext_sales_price": ext_sales_c,
        "cs_ext_wholesale_cost": ext_whole_c,
        "cs_ext_list_price": np.round(lst_c * qty_c, 2),
        "cs_ext_tax": tax_c,
        "cs_coupon_amt": coupon_c,
        "cs_ext_ship_cost": ship_cost_c,
        "cs_net_paid": net_paid_c,
        "cs_net_paid_inc_tax": np.round(net_paid_c + tax_c, 2),
        "cs_net_paid_inc_ship": np.round(net_paid_c + ship_cost_c, 2),
        "cs_net_paid_inc_ship_tax": np.round(
            net_paid_c + ship_cost_c + tax_c, 2),
        "cs_net_profit": np.round(net_paid_c - ext_whole_c, 2),
    }

    cr_idx = rng.choice(n_cs, n_cs // 10, replace=False)
    cr_qty = np.minimum(qty_c[cr_idx],
                        rng.integers(1, 101, len(cr_idx))).astype(np.float64)
    cr_amt = np.round(price_c[cr_idx] * cr_qty, 2)
    data["catalog_returns"] = {
        "cr_returned_date_sk": np.minimum(
            data["catalog_sales"]["cs_sold_date_sk"][cr_idx]
            + rng.integers(1, 60, len(cr_idx)), N_DATES - 1),
        "cr_item_sk": data["catalog_sales"]["cs_item_sk"][cr_idx],
        "cr_order_number": data["catalog_sales"]["cs_order_number"][cr_idx],
        "cr_returning_customer_sk": data["catalog_sales"][
            "cs_bill_customer_sk"][cr_idx],
        "cr_refunded_customer_sk": data["catalog_sales"][
            "cs_bill_customer_sk"][cr_idx],
        "cr_call_center_sk": data["catalog_sales"][
            "cs_call_center_sk"][cr_idx],
        "cr_catalog_page_sk": data["catalog_sales"][
            "cs_catalog_page_sk"][cr_idx],
        "cr_returning_addr_sk": rng.integers(0, n_addr, len(cr_idx)),
        "cr_return_quantity": cr_qty,
        "cr_return_amount": cr_amt,
        "cr_return_amt_inc_tax": np.round(cr_amt * 1.06, 2),
        "cr_refunded_cash": np.round(
            cr_amt * rng.uniform(0, 1, len(cr_idx)), 2),
        "cr_reversed_charge": _money(rng, 0, 50, len(cr_idx)),
        "cr_store_credit": _money(rng, 0, 50, len(cr_idx)),
        "cr_net_loss": _money(rng, 0.5, 1000, len(cr_idx)),
    }

    # ------------------------------------------------------------ web_sales
    n_orders_ws = n_ws // 2
    wo_cust = rng.integers(0, n_cust, n_orders_ws)
    wo_date = rng.integers(0, N_DATES - 150, n_orders_ws)
    wo_wh = rng.integers(0, n_wh, n_orders_ws)
    worder_of = np.repeat(np.arange(n_orders_ws), 2)[:n_ws]
    qty_w = rng.integers(1, 101, n_ws).astype(np.float64)
    whole_w = _money(rng, 1, 100, n_ws)
    lst_w = np.round(whole_w * rng.uniform(1.0, 1.5, n_ws), 2)
    price_w = np.round(lst_w * rng.uniform(0.02, 1.0, n_ws), 2)
    ext_sales_w = np.round(price_w * qty_w, 2)
    ext_whole_w = np.round(whole_w * qty_w, 2)
    net_paid_w = ext_sales_w
    tax_w = np.round(net_paid_w * 0.06, 2)
    ship_cost_w = _money(rng, 0.5, 500, n_ws)
    data["web_sales"] = {
        "ws_sold_date_sk": wo_date[worder_of],
        "ws_sold_time_sk": rng.integers(0, 1440, n_ws),
        "ws_ship_date_sk": np.minimum(
            wo_date[worder_of] + rng.integers(1, 120, n_ws), N_DATES - 1),
        "ws_bill_customer_sk": wo_cust[worder_of],
        "ws_bill_cdemo_sk": rng.integers(0, n_cd, n_ws),
        "ws_bill_hdemo_sk": rng.integers(0, n_hd, n_ws),
        "ws_ship_hdemo_sk": rng.integers(0, n_hd, n_ws),
        "ws_bill_addr_sk": rng.integers(0, n_addr, n_ws),
        "ws_ship_customer_sk": np.ma.masked_array(
            np.where(rng.random(n_ws) < 0.85, wo_cust[worder_of],
                     rng.integers(0, n_cust, n_ws)),
            rng.random(n_ws) < 0.01),
        "ws_ship_addr_sk": rng.integers(0, n_addr, n_ws),
        "ws_web_page_sk": rng.integers(0, n_web_page, n_ws),
        "ws_web_site_sk": rng.integers(0, n_web_site, n_ws),
        "ws_ship_mode_sk": rng.integers(0, 20, n_ws),
        "ws_warehouse_sk": wo_wh[worder_of],
        "ws_promo_sk": rng.integers(0, n_promo, n_ws),
        "ws_item_sk": rng.integers(0, n_item, n_ws),
        "ws_order_number": worder_of,
        "ws_quantity": qty_w,
        "ws_wholesale_cost": whole_w,
        "ws_list_price": lst_w,
        "ws_sales_price": price_w,
        "ws_ext_discount_amt": np.round((lst_w - price_w) * qty_w, 2),
        "ws_ext_sales_price": ext_sales_w,
        "ws_ext_wholesale_cost": ext_whole_w,
        "ws_ext_list_price": np.round(lst_w * qty_w, 2),
        "ws_ext_tax": tax_w,
        "ws_coupon_amt": np.zeros(n_ws),
        "ws_ext_ship_cost": ship_cost_w,
        "ws_net_paid": net_paid_w,
        "ws_net_paid_inc_tax": np.round(net_paid_w + tax_w, 2),
        "ws_net_paid_inc_ship": np.round(net_paid_w + ship_cost_w, 2),
        "ws_net_paid_inc_ship_tax": np.round(
            net_paid_w + ship_cost_w + tax_w, 2),
        "ws_net_profit": np.round(net_paid_w - ext_whole_w, 2),
    }

    wr_idx = rng.choice(n_ws, n_ws // 10, replace=False)
    wr_qty = np.minimum(qty_w[wr_idx],
                        rng.integers(1, 101, len(wr_idx))).astype(np.float64)
    wr_amt = np.round(price_w[wr_idx] * wr_qty, 2)
    data["web_returns"] = {
        "wr_returned_date_sk": np.minimum(
            data["web_sales"]["ws_sold_date_sk"][wr_idx]
            + rng.integers(1, 60, len(wr_idx)), N_DATES - 1),
        "wr_item_sk": data["web_sales"]["ws_item_sk"][wr_idx],
        "wr_order_number": data["web_sales"]["ws_order_number"][wr_idx],
        "wr_returning_customer_sk": data["web_sales"][
            "ws_bill_customer_sk"][wr_idx],
        "wr_refunded_customer_sk": data["web_sales"][
            "ws_bill_customer_sk"][wr_idx],
        "wr_refunded_cdemo_sk": data["web_sales"][
            "ws_bill_cdemo_sk"][wr_idx],
        "wr_refunded_addr_sk": data["web_sales"][
            "ws_bill_addr_sk"][wr_idx],
        "wr_returning_cdemo_sk": data["web_sales"][
            "ws_bill_cdemo_sk"][wr_idx],
        "wr_returning_addr_sk": data["web_sales"][
            "ws_bill_addr_sk"][wr_idx],
        "wr_web_page_sk": data["web_sales"]["ws_web_page_sk"][wr_idx],
        "wr_reason_sk": rng.integers(0, 35, len(wr_idx)),
        "wr_return_quantity": wr_qty,
        "wr_return_amt": wr_amt,
        "wr_fee": _money(rng, 0.5, 100, len(wr_idx)),
        "wr_refunded_cash": np.round(
            wr_amt * rng.uniform(0, 1, len(wr_idx)), 2),
        "wr_net_loss": _money(rng, 0.5, 1000, len(wr_idx)),
    }

    # ------------------------------------------------------------ inventory
    # weekly snapshots: every Monday x sampled (item, warehouse) pairs
    mondays = days[dows == 0]
    n_pairs = min(n_item * n_wh, 4000)
    inv_item = rng.integers(0, n_item, n_pairs)
    inv_wh = rng.integers(0, n_wh, n_pairs)
    inv_date = np.repeat(mondays, n_pairs)
    data["inventory"] = {
        "inv_date_sk": inv_date,
        "inv_item_sk": np.tile(inv_item, len(mondays)),
        "inv_warehouse_sk": np.tile(inv_wh, len(mondays)),
        "inv_quantity_on_hand": rng.integers(
            0, 1000, len(mondays) * n_pairs),
    }

    return data


# ------------------------------------------------------------------- DDL

_TYPES = {
    "d_date": "DATE",
    "d_day_name": "VARCHAR", "d_quarter_name": "VARCHAR",
}


def _sql_type(name: str, arr: np.ndarray) -> str:
    if name in _TYPES:
        return _TYPES[name]
    if arr.dtype.kind in "US":
        return "VARCHAR"
    if arr.dtype.kind == "f":
        return "DOUBLE"
    return "BIGINT"


def load(ctx, data):
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import Date, Float64, Int64, String
    for tname, cols in data.items():
        fields = ", ".join(f"{c} {_sql_type(c, np.asarray(a))}"
                           for c, a in cols.items())
        ctx.sql(f"CREATE TABLE {tname} ({fields})")
        out = []
        for c, a in cols.items():
            if isinstance(a, np.ma.MaskedArray):   # nullable fk (dsdgen)
                out.append(Column(Int64, a.filled(0).astype(np.int64),
                                  ~np.ma.getmaskarray(a)))
                continue
            arr = np.asarray(a)
            if _sql_type(c, arr) == "DATE":
                out.append(Column(Date, arr.astype(np.int32), None))
            elif arr.dtype.kind in "US":
                out.append(Column.from_pylist([str(v) for v in arr],
                                              String))
            elif arr.dtype.kind == "f":
                out.append(Column(Float64, arr.astype(np.float64), None))
            else:
                out.append(Column(Int64, arr.astype(np.int64), None))
        n = len(next(iter(cols.values())))
        ctx.insert_block(tname, DataBlock(list(cols), out, n))
        ctx.sql(f"ANALYZE TABLE {tname}")


def frames(data):
    import pandas as pd
    out = {}
    for t, cols in data.items():
        conv = {c: (np.where(np.ma.getmaskarray(a), np.nan,
                             a.filled(0).astype(np.float64))
                    if isinstance(a, np.ma.MaskedArray) else a)
                for c, a in cols.items()}
        out[t] = pd.DataFrame(conv)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--queries", type=str, default="")
    a = ap.parse_args()

    from tpcds_expected import check_query

    from databend_tpu import SessionContext
    data = generate(a.sf)
    F = frames(data)
    ctx = SessionContext(data_root=tempfile.mkdtemp())
    t0 = time.time()
    load(ctx, data)
    print(json.dumps({"query": "load",
                      "ms": round((time.time() - t0) * 1e3, 1),
                      "sf": a.sf,
                      "store_sales_rows":
                          len(data["store_sales"]["ss_item_sk"])}),
          flush=True)

    from tpcds_expected import EXPECTED, _FLOAT_COLS
    implemented = [q for q in QUERIES
                   if q in EXPECTED or q in _FLOAT_COLS]
    names = ([q.strip() for q in a.queries.split(",") if q.strip()]
             or sorted(implemented, key=lambda n: int(n[1:])))
    failures = []
    for name in names:
        sql = QUERIES[name]
        try:
            got = ctx.sql(sql).rows()  # warm + verify
            ok = check_query(F, name, got)
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
