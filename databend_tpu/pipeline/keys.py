"""Vectorized key machinery for group-by / distinct / hash join.

The reference's group/join hashtables (src/common/hashtable — open
addressing with short-string specialization) map here onto C-speed
factorization: pandas ``factorize`` assigns dense per-column codes, and
``np.unique`` over the stacked code records yields composite group ids.
Per-row Python loops run only over the (small) set of distinct keys.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..expression import Column

NULL_CODE = -1


def key_values(col: Column) -> np.ndarray:
    """A 1-D array of the column's values suitable for hashing: numeric
    payloads pass through; everything else becomes an object array."""
    data = col.data
    if isinstance(data, np.ndarray) and data.ndim == 1 \
            and data.dtype != object:
        return data
    if hasattr(data, "as_object_array"):  # StringData: cached decode
        return data.as_object_array()
    return np.asarray(col.to_pylist(), dtype=object)


def factorize_column(col: Column) -> np.ndarray:
    """Dense int64 codes per row; NULLs get NULL_CODE. Codes are
    block-local (not comparable across calls)."""
    import pandas as pd
    from ..expression.column import StringData
    data = col.data
    if isinstance(data, StringData):
        # native byte-level factorize: no per-row decode (the reference's
        # short-string hashtable specialization, native/tokenize.cpp)
        codes = data.codes()
        if codes is not None:
            if col.validity is not None:
                codes = np.where(col.validity, codes, NULL_CODE)
            return codes
    vals = key_values(col)
    codes, _ = pd.factorize(vals, use_na_sentinel=True)
    codes = codes.astype(np.int64, copy=False)
    if col.validity is not None:
        codes = np.where(col.validity, codes, NULL_CODE)
    return codes


def composite_group(codes_list: List[np.ndarray]) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """Composite dense group ids over one or more code arrays.

    Returns (local_gid [n], rep_row_idx [g]) where ``rep_row_idx[k]`` is
    the first row of group k. NULL codes group together (SQL GROUP BY
    semantics: NULLs form one group).
    """
    import pandas as pd
    n = len(codes_list[0])
    if len(codes_list) == 1:
        comb = codes_list[0]
    else:
        # pack per-column codes into one int64 (hash-based, no sort);
        # +1 shifts NULL_CODE to 0 so packing stays non-negative
        sizes = [int(c.max(initial=-1)) + 2 for c in codes_list]
        total = 1
        overflow = False
        for s in sizes:
            total *= s
            if total > (1 << 62):
                overflow = True
                break
        if overflow:
            stacked = np.ascontiguousarray(np.stack(codes_list, axis=1))
            rec = stacked.view([("", np.int64)] * len(codes_list)).reshape(n)
            _, idx, inv = np.unique(rec, return_index=True,
                                    return_inverse=True)
            return inv.astype(np.int64, copy=False).reshape(-1), idx
        comb = codes_list[0] + 1
        for c, s in zip(codes_list[1:], sizes[1:]):
            comb = comb * s + (c + 1)
    gids, uniq = pd.factorize(comb)
    gids = gids.astype(np.int64, copy=False)
    g = len(uniq)
    # first-occurrence row per group: reversed scatter, last write wins
    rep = np.empty(g, np.int64)
    rep[gids[::-1]] = np.arange(n - 1, -1, -1, dtype=np.int64)
    return gids, rep


def hashable_rows(cols: List[Column], idx: np.ndarray) -> list:
    """Key tuples for the given row indices, built column-wise (one
    vectorized take per column + one C-level zip) — the per-row
    Column.get path costs ~10x more at high key cardinality."""
    idx = np.asarray(idx, np.int64)
    parts = []
    for c in cols:
        vals = key_values(c)[idx]
        lst = vals.tolist()
        if c.validity is not None:
            vmask = c.validity[idx]
            lst = [v if ok else None for v, ok in zip(lst, vmask.tolist())]
        if lst and isinstance(lst[0], (list, np.ndarray)):
            lst = [tuple(v) if isinstance(v, list) else tuple(v.tolist())
                   for v in lst]
        parts.append(lst)
    return list(zip(*parts))


def hashable_row(cols: List[Column], i: int) -> tuple:
    out = []
    for c in cols:
        v = c.get(int(i))
        if isinstance(v, np.ndarray):
            v = tuple(v.tolist())
        elif isinstance(v, list):
            v = tuple(v)
        out.append(v)
    return tuple(out)


def match_indices(build_keys: List[Column], probe_keys: List[Column]
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized equi-join matching.

    Returns (lidx, ridx): for every probe row with >=1 build match, one
    entry per (probe row, build row) pair, ordered by probe row (then
    build row). Rows with NULL in any key never match (SQL equality).
    """
    import pandas as pd
    m = len(build_keys[0]) if build_keys else 0
    n = len(probe_keys[0]) if probe_keys else 0
    bcols = {}
    bnull = np.zeros(m, np.bool_)
    for j, c in enumerate(build_keys):
        bcols[f"k{j}"] = key_values(c)
        if c.validity is not None:
            bnull |= ~c.validity
    pcols = {}
    pnull = np.zeros(n, np.bool_)
    for j, c in enumerate(probe_keys):
        pcols[f"k{j}"] = key_values(c)
        if c.validity is not None:
            pnull |= ~c.validity
    keys = list(bcols)
    bdf = pd.DataFrame(bcols)
    bdf["__r"] = np.arange(m, dtype=np.int64)
    if bnull.any():
        bdf = bdf[~bnull]
    pdf = pd.DataFrame(pcols)
    pdf["__l"] = np.arange(n, dtype=np.int64)
    if pnull.any():
        pdf = pdf[~pnull]
    merged = pdf.merge(bdf, on=keys, how="inner")
    lidx = merged["__l"].to_numpy(np.int64)
    ridx = merged["__r"].to_numpy(np.int64)
    order = np.lexsort((ridx, lidx))
    return lidx[order], ridx[order]
