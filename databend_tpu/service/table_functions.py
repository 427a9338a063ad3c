"""Table functions: numbers(), fuse_snapshot(), fuse_segment(), fuse_block().

(reference: src/query/service/src/table_functions/ — numbers.rs,
fuse_snapshots, fuse_segments, fuse_blocks)
"""

from __future__ import annotations

import numpy as np

from ..errors import BadArguments, SemanticError
from ..expression import Column, DataBlock, DataField
from ..sql import ast as A
from ..sql.plans import Plan, ValuesPlan
from ..types import Float64, Int64, String, UInt64


def bind_table_function(session, ref: A.TableFunctionRef) -> Plan:
    name = ref.name.lower()
    if name == "numbers":
        return _numbers(ref.args)
    if name in ("fuse_snapshot", "fuse_snapshots"):
        return _fuse_snapshot(session, ref.args)
    if name in ("fuse_segment", "fuse_segments"):
        return _fuse_segment(session, ref.args)
    if name in ("fuse_block", "fuse_blocks"):
        return _fuse_block(session, ref.args)
    if name in ("unnest", "flatten"):
        return _unnest(ref.args)
    raise SemanticError(f"unknown table function {ref.name!r}")


def _unnest(args) -> Plan:
    """unnest([v1, v2, ...]) — one row per array element (reference:
    the unnest/flatten table function)."""
    from ..expression import Column, DataBlock
    from ..expression.evaluator import infer_literal_type
    if len(args) != 1 or not isinstance(args[0], A.Literal) \
            or not isinstance(args[0].value, (list, tuple)):
        raise SemanticError("unnest expects a constant array")
    vals = list(args[0].value)
    dtype = infer_literal_type(vals[0]) if vals else Int64
    col = Column.from_pylist(vals, dtype.wrap_nullable()
                             if any(v is None for v in vals) else dtype)
    block = DataBlock(["value"], [col], len(vals))
    return ValuesPlan(block, [DataField("value", col.dtype)])


def _const_args(args, n, fname):
    out = []
    for a in args:
        if not isinstance(a, A.Literal):
            raise BadArguments(f"{fname} expects constant arguments")
        out.append(a.value)
    if len(out) != n:
        raise BadArguments(f"{fname} expects {n} arguments")
    return out


def _numbers(args) -> Plan:
    (n,) = _const_args(args, 1, "numbers")
    block = DataBlock(["number"], [Column.from_numpy(
        np.arange(int(n), dtype=np.uint64))])
    return ValuesPlan(block, [DataField("number", UInt64)])


def _open(session, db, tbl):
    info = session.catalog.get_table(db, tbl)
    return session.open_table(info)


def _fuse_snapshot(session, args) -> Plan:
    db, tbl = _const_args(args, 2, "fuse_snapshot")
    table = _open(session, db, tbl)
    rows = []
    snap = table.read_snapshot()
    while snap is not None:
        rows.append((snap.snapshot_id, snap.prev_snapshot, len(snap.segments),
                     snap.block_count, snap.row_count, snap.index_size,
                     float(snap.timestamp)))
        if not snap.prev_snapshot:
            break
        try:
            snap = table.read_snapshot(snap.prev_snapshot)
        except Exception:
            snap = None  # history vacuumed past the retention window
    names = ["snapshot_id", "previous_snapshot_id", "segment_count",
             "block_count", "row_count", "vector_index_size", "timestamp"]
    types = [String, String, Int64, Int64, Int64, Int64, Float64]
    cols = [Column.from_pylist([r[i] for r in rows], t.wrap_nullable() if i == 1 else t)
            for i, t in enumerate(types)]
    return ValuesPlan(DataBlock(names, cols, len(rows)),
                      [DataField(n, t) for n, t in zip(names, types)])


def _fuse_segment(session, args) -> Plan:
    db, tbl = _const_args(args, 2, "fuse_segment")
    table = _open(session, db, tbl)
    rows = []
    snap = table.read_snapshot()
    if snap is not None:
        for loc in snap.segments:
            from ..storage.fuse.snapshot import SegmentInfo, read_json
            seg = SegmentInfo.from_dict(read_json(table.abs_path(loc)))
            vsize = sum(v.get("size", 0) for b in seg.blocks
                        for v in b.vector_indexes.values())
            rows.append((loc, len(seg.blocks), seg.row_count, vsize))
    names = ["segment_location", "block_count", "row_count", "vector_index_size"]
    types = [String, Int64, Int64, Int64]
    cols = [Column.from_pylist([r[i] for r in rows], t) for i, t in enumerate(types)]
    return ValuesPlan(DataBlock(names, cols, len(rows)),
                      [DataField(n, t) for n, t in zip(names, types)])


def _fuse_block(session, args) -> Plan:
    db, tbl = _const_args(args, 2, "fuse_block")
    table = _open(session, db, tbl)
    rows = []
    snap = table.read_snapshot()
    if snap is not None:
        for seg in table.read_segments(snap):
            for b in seg.blocks:
                vsize = sum(v.get("size", 0) for v in b.vector_indexes.values())
                isize = sum(v.get("size", 0) for v in b.inverted_indexes.values())
                rows.append((b.location, b.row_count, b.block_size, vsize, isize))
    names = ["block_location", "row_count", "block_size",
             "vector_index_size", "inverted_index_size"]
    types = [String, Int64, Int64, Int64, Int64]
    cols = [Column.from_pylist([r[i] for r in rows], t) for i, t in enumerate(types)]
    return ValuesPlan(DataBlock(names, cols, len(rows)),
                      [DataField(n, t) for n, t in zip(names, types)])
