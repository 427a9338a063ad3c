"""system.* tables.

Reference analog: src/query/storages/system/src/ (46 system tables). Each
table is generated on demand from live engine state and bound as a values
plan, so the full SQL surface (filters, joins, aggregates) works over them.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

from ..expression import Column, DataBlock, DataField
from ..types import Boolean, Float64, Int64, String


def _block(cols: List[Tuple[str, object, list]]) -> Tuple[DataBlock, List[DataField]]:
    names = [c[0] for c in cols]
    fields = [DataField(n, t) for n, t, _ in cols]
    n = len(cols[0][2]) if cols else 0
    columns = [Column.from_pylist(v, t.wrap_nullable()
                                  if any(x is None for x in v) else t)
               for _, t, v in cols]
    return DataBlock(names, columns, n), fields


def _sys_one(s):
    return _block([("dummy", Int64, [1])])


def _sys_databases(s):
    names = sorted(d.name for d in s.catalog.list_databases())
    return _block([("name", String, names)])


def _sys_tables(s):
    rows = []
    for d in s.catalog.list_databases():
        for info in s.catalog.list_tables(d.name):
            t = s.open_table(info)
            snap = t.read_snapshot()
            rows.append((d.name, info.name, info.engine,
                         snap.row_count if snap else 0,
                         snap.block_count if snap else 0,
                         snap.snapshot_id if snap else None,
                         ",".join(info.cluster_by)))
    cols = list(zip(*rows)) if rows else [[] for _ in range(7)]
    return _block([
        ("database", String, list(cols[0])), ("name", String, list(cols[1])),
        ("engine", String, list(cols[2])), ("num_rows", Int64, list(cols[3])),
        ("num_blocks", Int64, list(cols[4])),
        ("snapshot_id", String, list(cols[5])),
        ("cluster_by", String, list(cols[6]))])


def _sys_columns(s):
    rows = []
    for d in s.catalog.list_databases():
        for info in s.catalog.list_tables(d.name):
            for f in info.schema.fields:
                rows.append((f.name, d.name, info.name,
                             f.dtype.sql_name(), f.dtype.is_nullable(),
                             None if f.default is None else str(f.default)))
    cols = list(zip(*rows)) if rows else [[] for _ in range(6)]
    return _block([
        ("name", String, list(cols[0])), ("database", String, list(cols[1])),
        ("table", String, list(cols[2])), ("type", String, list(cols[3])),
        ("is_nullable", Boolean, list(cols[4])),
        ("default_expression", String, list(cols[5]))])


def _sys_settings(s):
    rows = s.settings.all()
    return _block([
        ("name", String, [r[0] for r in rows]),
        ("value", String, [str(r[1]) for r in rows]),
        ("default", String, [str(r[2]) for r in rows]),
        ("description", String, [str(r[3]) for r in rows])])


def _sys_functions(s):
    from ..expression.functions import registry
    from ..expression.functions.aggregates import AGGREGATE_FUNCTIONS
    scalars = sorted(registry.names())
    aggs = sorted(AGGREGATE_FUNCTIONS)
    names = scalars + aggs
    return _block([
        ("name", String, names),
        ("is_aggregate", Boolean, [False] * len(scalars) + [True] * len(aggs))])


def _sys_metrics(s):
    from ..utils.metrics import METRICS
    snap = METRICS.snapshot()
    items = sorted(snap.items())
    return _block([
        ("metric", String, [k for k, _ in items]),
        ("value", Float64, [float(v) if not isinstance(v, dict) else float(v.get("sum", 0))
                            for _, v in items])])


def _sys_query_log(s):
    rows = list(getattr(s, "query_log", []))
    return _block([
        ("query_id", String, [r["query_id"] for r in rows]),
        ("query_text", String, [r["query_text"] for r in rows]),
        ("query_kind", String, [r["query_kind"] for r in rows]),
        ("query_start_time", Float64, [r["start"] for r in rows]),
        ("query_duration_ms", Float64, [r["duration_ms"] for r in rows]),
        ("result_rows", Int64, [r["result_rows"] for r in rows]),
        ("exception_text", String, [r["error"] for r in rows])])


def _sys_indexes(s):
    rows = []
    for d in s.catalog.list_databases():
        for info in s.catalog.list_tables(d.name):
            for idx in info.indexes.values():
                rows.append((idx.name, idx.index_type.lower(), d.name,
                             info.name, ",".join(idx.columns)))
    cols = list(zip(*rows)) if rows else [[] for _ in range(5)]
    return _block([
        ("name", String, list(cols[0])), ("type", String, list(cols[1])),
        ("database", String, list(cols[2])), ("table", String, list(cols[3])),
        ("columns", String, list(cols[4]))])


def _sys_caches(s):
    from ..utils.cache import CacheManager
    cm = CacheManager.instance()
    named = {n: getattr(cm, n) for n in
             ("vector_columns", "vector_indexes", "bloom_filters",
              "inverted_indexes", "blocks")}
    rows = [(name, len(c), c.capacity, c.hits, c.misses)
            for name, c in sorted(named.items())]
    cols = list(zip(*rows)) if rows else [[] for _ in range(5)]
    return _block([
        ("name", String, list(cols[0])), ("num_items", Int64, list(cols[1])),
        ("capacity", Int64, list(cols[2])), ("hits", Int64, list(cols[3])),
        ("misses", Int64, list(cols[4]))])


def _sys_build_options(s):
    import jax
    from ..version import __version__
    platforms = ",".join(sorted({d.platform for d in jax.devices()}))
    return _block([
        ("name", String, ["version", "jax_version", "device_platform",
                          "device_count"]),
        ("value", String, [__version__, jax.__version__, platforms,
                           str(jax.device_count())])])


SYSTEM_TABLES: Dict[str, Callable] = {
    "one": _sys_one,
    "databases": _sys_databases,
    "tables": _sys_tables,
    "columns": _sys_columns,
    "settings": _sys_settings,
    "functions": _sys_functions,
    "metrics": _sys_metrics,
    "query_log": _sys_query_log,
    "indexes": _sys_indexes,
    "caches": _sys_caches,
    "build_options": _sys_build_options,
}


def system_table_plan(session, name: str):
    fn = SYSTEM_TABLES.get(name.lower())
    if fn is None:
        from ..errors import UnknownTable
        raise UnknownTable(f"unknown system table system.{name}")
    from ..sql.plans import ValuesPlan
    block, fields = fn(session)
    return ValuesPlan(block, fields)
