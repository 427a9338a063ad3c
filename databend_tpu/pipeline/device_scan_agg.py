"""Single-chip device routing for relational scan->filter->group->agg.

The reference runs every relational operator inside its N-worker pipeline
executor (src/query/service/src/pipelines/executor/
query_pipeline_executor.rs:62) so a plain ``SELECT ... GROUP BY`` saturates
the machine. The TPU-native analog is NOT a thread pool: it is routing the
whole Scan -> Filter -> Aggregate fragment onto the accelerator as ONE
compiled XLA program over **HBM-resident table columns**, so a query
dispatch ships no row data at all — only the [G, n_aggs] result comes back.

Design (measured on a v5e through the axon tunnel, see
benchmarks/device_route_bench.py):

* **Residency beats bandwidth.** The host<->device link is the slow path
  (~50 MB/s through the tunnel; PCIe-class on a production host). Shipping
  6M rows per query can never win, so columns are uploaded once per
  (table, snapshot) and cached in HBM (``CacheManager.device_table_columns``
  — the relational sibling of the vector corpus cache, reference
  VectorIndexFileCache caches.rs:57). Snapshots are immutable, so the cache
  needs no invalidation, only LRU eviction.

* **Two resident forms per column.**
  - ``codes``: order-preserving dense rank codes (i32) + host-side sorted
    uniques. Grouping, filtering and MIN/MAX run on codes and are therefore
    EXACT for every type (strings and dates included) — the device only
    ever compares small ints; the host maps ranks back to values.
  - ``planes``: fixed-point byte planes (u8 [n, p]) with (scale, bias).
    SUM/AVG run on these via **base-256 limb arithmetic**: every
    arithmetic expression over decimal/integer columns is compiled into a
    list of signed i32 limb arrays with statically tracked magnitude
    bounds; limbs renormalize (carry-split) whenever a bound would
    overflow the i32 accumulator. Per-group masked sums of each limb are
    exact, and the host recombines ``sum = (sum_i 256^i * S_i) / scale``
    in arbitrary-precision Python ints. No f64 emulation on device, no
    f32 rounding in results: the device aggregate is bit-exact (it is
    *more* exact than a host f64 np.sum at >2^53 magnitudes).

* **No scatters.** ``jax.ops.segment_sum`` lowers to scatter-add, which is
  serialized on TPU (measured 50-900 ms at 6M rows). Per-group masked
  reductions (G * n_limbs dense VPU passes) hit the RTT floor instead
  (~2-6 ms device time at G<=64, 6M rows). The route therefore caps the
  dense group-grid size (``device_scan_agg_max_groups``); larger G stays
  on the host factorize path (measured crossover in RESULTS.md).

Reference parity: the routed fragment is the reference's
``AggregatorPartial -> AggregatorFinal`` over a table scan
(src/query/sql/src/executor/physical_plans/physical_aggregate_*.rs),
with filters applied exactly as the host scan does
(pipeline/executor.py::_exec_scan).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..expression import Column, DataBlock
from ..expression.expr import BoundColumn, Constant, Func, ScalarExpr

NULL_CODE = -1
# i32 masked-sum accumulator bound: limb_max * chunk_rows must stay below
# 2^31. Limbs renormalize to <=255, so chunks cap at 8M rows.
CHUNK_ROWS = 8_000_000
LIMB_MAX = 255


class _Bail(Exception):
    """Expression/plan shape the device route does not cover."""


# ------------------------------------------------------------ resident forms


class _LazyChunks:
    """Row-chunked device residency with upload-on-first-use: a query
    that compiles forms but then bails (group grid too large) costs no
    host->device transfer."""

    def __init__(self, host_chunks):
        self._host = host_chunks
        self._dev = [None] * len(host_chunks)

    def __len__(self):
        return len(self._host)

    def __getitem__(self, i):
        if self._dev[i] is None:
            import jax
            self._dev[i] = jax.device_put(self._host[i])
        return self._dev[i]


class DeviceTableColumns:
    """HBM-resident forms of one table snapshot's columns (lazy per column).

    Chunked along rows at CHUNK_ROWS so i32 limb accumulators never
    overflow and arbitrarily large tables stream through the same program.
    """

    def __init__(self, table, snapshot_id: Optional[str]):
        self.table = table
        self.snapshot_id = snapshot_id
        self.n_rows = 0
        self._sample_ndv: Dict[str, int] = {}
        self.names: List[str] = []
        # name -> {"codes": [dev i32 per chunk], "uniques": np, "has_null",
        #          "planes": [dev u8 [c,p] per chunk], "scale", "bias",
        #          "nplanes", "valid": [dev bool per chunk] | None}
        self.cols: Dict[str, dict] = {}
        self.nbytes = 0

    # -- host read of one raw column (through the normal scan path)
    def _read_column(self, name: str) -> Column:
        from ..catalog.pushdown import PushDownInfo
        from ..sql.plans import Scan
        from . import executor as ex
        scan = Scan(table=self.table, pushdown=PushDownInfo(projection=[name]),
                    snapshot_id=self.snapshot_id, columns=[name])
        parts = [b.column(name) for b in ex.execute_plan_blocks(scan)]
        if not parts:
            raise _Bail("empty table")
        col = parts[0] if len(parts) == 1 else Column.concat(parts)
        if self.n_rows == 0:
            self.n_rows = len(col)
        return col

    def _chunks(self, arr: np.ndarray):
        return [arr[i:i + CHUNK_ROWS] for i in range(0, len(arr), CHUNK_ROWS)]

    def _put(self, arr: np.ndarray):
        self.nbytes += arr.nbytes
        return _LazyChunks(self._chunks(arr))

    def get(self, name: str, form: str) -> dict:
        """Ensure ``form`` ("codes" or "planes") of column ``name`` is
        resident; returns the column's form dict."""
        ent = self.cols.setdefault(name, {})
        if form in ent:
            return ent
        col = ent.pop("_host", None)
        if col is None:
            col = self._read_column(name)
        if form == "codes":
            self._build_codes(ent, col)
        elif form == "planes":
            self._build_planes(ent, col)
        else:  # pragma: no cover
            raise ValueError(form)
        # keep the host column around only while both forms may be needed
        if not ("codes" in ent and "planes" in ent):
            ent["_host"] = col
        return ent

    def sample_ndv(self, name: str) -> int:
        """Distinct count of the FIRST block only — a cheap upper-bound
        screen before paying a whole-table codes build (a 6M-row column
        read + np.unique costs seconds; a bailing GROUP BY should not
        pay it)."""
        cached = self._sample_ndv.get(name)
        if cached is not None:
            return cached
        from ..storage.fuse import block_io
        snap = self.table.read_snapshot(self.snapshot_id)
        ndv = 0
        if snap is not None:
            done = False
            for seg in self.table.read_segments(snap):
                for bm in seg.blocks:
                    b = block_io.read_block(
                        self.table.abs_path(bm.location),
                        self.table.schema, projection=[name])
                    col = b.column(name)
                    try:
                        vals, valid = self._values_validity(col)
                        sel = vals if valid is None else vals[valid]
                        ndv = len(np.unique(sel))
                    except (TypeError, _Bail):
                        ndv = 1 << 30
                    done = True
                    break
                if done:
                    break
        self._sample_ndv[name] = ndv
        return ndv

    def _values_validity(self, col: Column):
        from ..expression.column import StringData
        data = col.data
        if isinstance(data, StringData):
            vals = data.as_object_array()
        elif isinstance(data, np.ndarray) and data.ndim == 1:
            vals = data
        else:
            raise _Bail("unsupported column layout")
        valid = col.validity
        return vals, valid

    def _build_codes(self, ent: dict, col: Column) -> None:
        vals, valid = self._values_validity(col)
        sel = vals if valid is None else vals[valid]
        try:
            uniques = np.unique(sel)
        except TypeError:
            raise _Bail("un-orderable column values")
        codes = np.searchsorted(uniques, vals).astype(np.int32)
        if valid is not None:
            codes = np.where(valid, codes, np.int32(NULL_CODE))
        ent["codes"] = self._put(codes)
        ent["uniques"] = uniques
        ent["has_null"] = bool(valid is not None and not valid.all())
        ent["dtype"] = col.dtype

    def _build_planes(self, ent: dict, col: Column) -> None:
        vals, valid = self._values_validity(col)
        if not isinstance(vals, np.ndarray) or vals.dtype.kind not in "iufb":
            raise _Bail("non-numeric sum argument")
        v = vals.astype(np.float64, copy=False)
        if valid is not None:
            v = np.where(valid, v, 0.0)
        if vals.dtype.kind in "ib":
            scale = 1
            w = v
        else:
            for scale in (1, 10, 100, 10000):
                w = v * scale
                if np.abs(w).max(initial=0.0) < 2 ** 53 \
                        and np.all(np.abs(w - np.rint(w)) < 1e-6):
                    break
            else:
                raise _Bail("column is not fixed-point")
            w = np.rint(w)
        wi = w.astype(np.int64)
        bias = int(wi.min(initial=0))
        if bias > 0:
            bias = 0
        u = wi - bias  # non-negative
        umax = int(u.max(initial=0))
        nplanes = max(1, (umax.bit_length() + 7) // 8)
        planes = np.empty((len(u), nplanes), np.uint8)
        for i in range(nplanes):
            planes[:, i] = (u >> (8 * i)) & 0xFF
        ent["planes"] = self._put(planes)
        ent["scale"] = scale
        ent["bias"] = bias
        ent["nplanes"] = nplanes
        if valid is not None:
            ent["valid"] = self._put(valid)
        else:
            ent["valid"] = None


def _cache() -> "Any":
    from ..utils.cache import CacheManager, LruCache
    cm = CacheManager.instance()
    if not hasattr(cm, "device_table_columns"):
        cm.device_table_columns = LruCache(
            capacity_bytes=4 << 30, sizeof=lambda v: max(v.nbytes, 1))
    return cm.device_table_columns


def get_table_columns(table, snapshot_id) -> DeviceTableColumns:
    key = (table.info.table_id, snapshot_id)
    return _cache().get_or_load(
        key, lambda: DeviceTableColumns(table, snapshot_id))


# ------------------------------------------------------- expression compiler
#
# Compilation produces a hashable IR; `_build_program` (lru_cached on the
# IR) traces it once per distinct query shape. Value nodes carry exact
# fixed-point semantics: value = (sum_i 256^i * limb_i) / scale, with the
# per-limb |max| tracked statically so renormalization happens exactly
# when an i32 accumulator could overflow.


class _Compiler:
    """Lowers bound scalar expressions to the device IR, recording which
    resident forms each referenced column needs."""

    def __init__(self, dtc: DeviceTableColumns):
        self.dtc = dtc
        self.slots: List[Tuple[str, str]] = []  # (col, form) -> env slot

    def _slot(self, name: str, form: str) -> int:
        key = (name, form)
        if key not in self.slots:
            # building the form now also validates eligibility (raises _Bail)
            built = "planes" if form == "planes_valid" else form
            ent = self.dtc.get(name, built)
            if form == "planes_valid" and ent.get("valid") is None:
                raise _Bail("validity slot of a non-nullable column")
            self.slots.append(key)
        return self.slots.index(key)

    def _const(self, e: ScalarExpr):
        """Fold a column-free subtree to a Python value via the host
        evaluator (to_date('...'), 1 + 2, ...)."""
        if any(isinstance(x, BoundColumn) for x in e.walk()):
            return None
        if isinstance(e, Constant):
            return e.value
        from ..expression.evaluator import Evaluator
        try:
            col = Evaluator(DataBlock([], [], 1)).run(e)
            return col.get(0)
        except Exception:
            raise _Bail("unfoldable constant")

    # ---- value IR: exact fixed-point ("num", scale, node) where node is
    #      ("col", slot, scale, bias, nplanes) | ("const", int_scaled)
    #      | ("add"|"sub", a, b) | ("mul", a, b)
    def value(self, e: ScalarExpr):
        if not any(isinstance(x, BoundColumn) for x in e.walk()):
            cv = self._const(e)
            if cv is None or isinstance(cv, bool) \
                    or not isinstance(cv, (int, float, np.integer,
                                           np.floating)):
                raise _Bail("non-numeric constant")
            f = float(cv)
            for scale in (1, 10, 100, 10000, 1000000):
                if abs(f * scale - round(f * scale)) < 1e-9:
                    return ("const", int(round(f * scale)), scale)
            raise _Bail("constant is not fixed-point")
        if isinstance(e, BoundColumn):
            slot = self._slot(e.name, "planes")
            ent = self.dtc.cols[e.name]
            return ("col", slot, ent["scale"], ent["bias"], ent["nplanes"])
        if isinstance(e, Func):
            nm = e.name
            if nm in ("plus", "add") and len(e.args) == 2:
                return ("add", self.value(e.args[0]), self.value(e.args[1]))
            if nm in ("minus", "sub", "subtract") and len(e.args) == 2:
                return ("sub", self.value(e.args[0]), self.value(e.args[1]))
            if nm in ("multiply", "mul") and len(e.args) == 2:
                return ("mul", self.value(e.args[0]), self.value(e.args[1]))
            if nm == "negate" and len(e.args) == 1:
                return ("sub", ("const", 0, 1), self.value(e.args[0]))
            if nm == "divide" and len(e.args) == 2:
                # division by a constant is exact rational arithmetic:
                # (W/s) / (cw/cs) = (W*cs) / (s*cw)
                d = self.value(e.args[1])
                if d[0] != "const" or d[1] == 0:
                    raise _Bail("non-constant or zero divisor")
                cw, cs = d[1], d[2]
                a = self.value(e.args[0])
                if cw < 0:
                    a = ("sub", ("const", 0, 1), a)
                    cw = -cw
                if cs != 1:
                    a = ("mul", a, ("const", cs, 1))
                return ("rescale", a, cw)
        raise _Bail(f"unsupported value expr {e.display()}")

    def value_valid_slots(self, e: ScalarExpr) -> Tuple[int, ...]:
        """Env slots of the validity arrays the expression's NULLness
        depends on (SQL: any NULL input -> NULL row, skipped by SUM)."""
        out = []
        for x in e.walk():
            if isinstance(x, BoundColumn):
                self._slot(x.name, "planes")
                ent = self.dtc.cols[x.name]
                if ent.get("valid") is not None:
                    out.append(self._slot(x.name, "planes_valid"))
        return tuple(sorted(set(out)))

    # ---- predicate IR over codes:
    #      ("cmp", op, slot, code_bound) | ("inlist", slot, codes)
    #      | ("and"|"or", a, b) | ("not", a) | ("isnull", slot, neg)
    #      | ("true",)
    def pred(self, e: Optional[ScalarExpr]):
        if e is None:
            return ("true",)
        if isinstance(e, Func):
            nm = e.name
            if nm in ("and", "logical_and") and len(e.args) == 2:
                return ("and", self.pred(e.args[0]), self.pred(e.args[1]))
            if nm in ("or", "logical_or") and len(e.args) == 2:
                return ("or", self.pred(e.args[0]), self.pred(e.args[1]))
            if nm in ("not", "logical_not") and len(e.args) == 1:
                return ("not", self.pred(e.args[0]))
            if nm in ("is_null", "is_not_null") and len(e.args) == 1 \
                    and isinstance(e.args[0], BoundColumn):
                slot = self._slot(e.args[0].name, "codes")
                return ("isnull", slot, nm == "is_not_null")
            if nm in ("eq", "noteq", "lt", "lte", "gt", "gte") \
                    and len(e.args) == 2:
                a, b = e.args
                if not isinstance(a, BoundColumn) \
                        and isinstance(b, BoundColumn):
                    flip = {"lt": "gt", "lte": "gte", "gt": "lt",
                            "gte": "lte", "eq": "eq", "noteq": "noteq"}
                    a, b, nm = b, a, flip[nm]
                if isinstance(a, BoundColumn):
                    cv = self._const(b)
                    if cv is None:
                        raise _Bail("column-vs-column predicate")
                    return self._cmp_const(nm, a, cv)
        raise _Bail(f"unsupported predicate {e.display() if e else ''}")

    def _cmp_const(self, op: str, col: BoundColumn, cv) -> tuple:
        slot = self._slot(col.name, "codes")
        uniques = self.dtc.cols[col.name]["uniques"]
        try:
            if uniques.dtype.kind == "O":
                cv = str(cv)
                lo = int(np.searchsorted(uniques, cv, side="left"))
                hi = int(np.searchsorted(uniques, cv, side="right"))
            else:
                cvf = float(cv) if uniques.dtype.kind == "f" else cv
                lo = int(np.searchsorted(uniques, cvf, side="left"))
                hi = int(np.searchsorted(uniques, cvf, side="right"))
        except TypeError:
            raise _Bail("incomparable predicate constant")
        # codes are sorted ranks: value < cv  <=>  code < lo, etc.
        if op == "eq":
            if hi == lo:
                return ("false",)
            return ("cmp", "eqcode", slot, lo)
        if op == "noteq":
            if hi == lo:
                return ("notnull_true", slot)
            return ("cmp", "neqcode", slot, lo)
        if op == "lt":
            return ("cmp", "lt", slot, lo)
        if op == "lte":
            return ("cmp", "lt", slot, hi)
        if op == "gt":
            return ("cmp", "gte", slot, hi)
        if op == "gte":
            return ("cmp", "gte", slot, lo)
        raise _Bail(op)


# ------------------------------------------------------------ limb algebra


class _Limbs:
    """Traced exact fixed-point value: value = sum_i 256^i * limbs[i],
    limbs signed i32 arrays, |limbs[i]| <= maxabs[i] (static bound)."""

    __slots__ = ("limbs", "maxabs")

    def __init__(self, limbs, maxabs):
        self.limbs = limbs
        self.maxabs = maxabs


def _limb_renorm(v: _Limbs, bound: int, symbolic: bool = False) -> _Limbs:
    """Carry-split limbs so every |limb| <= LIMB_MAX (when any static
    bound exceeds ``bound``). floor-div carries are exact for signed.
    ``symbolic``: limbs are Python ints (0) — bound tracking only, used
    to derive the static output layout without touching the device."""
    if all(m <= bound for m in v.maxabs):
        return v
    if not symbolic:
        import jax.numpy as jnp
    limbs = list(v.limbs)
    maxabs = list(v.maxabs)
    i = 0
    while i < len(limbs):
        if maxabs[i] > bound:
            if symbolic or isinstance(limbs[i], int):
                hi = lo = 0
            else:
                hi = jnp.floor_divide(limbs[i], 256)
                lo = limbs[i] - hi * 256
            limbs[i] = lo
            maxabs_i = maxabs[i]
            maxabs[i] = LIMB_MAX
            if i + 1 < len(limbs):
                limbs[i + 1] = limbs[i + 1] + hi
                maxabs[i + 1] = maxabs[i + 1] + maxabs_i // 256 + 1
            else:
                limbs.append(hi)
                maxabs.append(maxabs_i // 256 + 1)
        i += 1
    return _Limbs(limbs, maxabs)


def _limb_scale_mul(v: _Limbs, k: int) -> _Limbs:
    if k == 1:
        return v
    out = _Limbs([l * k for l in v.limbs], [m * k for m in v.maxabs])
    return _limb_renorm(out, LIMB_MAX)


def _limb_add(a: _Limbs, b: _Limbs, sub: bool = False) -> _Limbs:
    import jax.numpy as jnp
    n = max(len(a.limbs), len(b.limbs))
    limbs, maxabs = [], []
    for i in range(n):
        la = a.limbs[i] if i < len(a.limbs) else None
        lb = b.limbs[i] if i < len(b.limbs) else None
        ma = a.maxabs[i] if i < len(a.limbs) else 0
        mb = b.maxabs[i] if i < len(b.limbs) else 0
        if la is None:
            limbs.append(-lb if sub else lb)
        elif lb is None:
            limbs.append(la)
        else:
            limbs.append(la - lb if sub else la + lb)
        maxabs.append(ma + mb)
    return _limb_renorm(_Limbs(limbs, maxabs), LIMB_MAX)


def _limb_mul(a: _Limbs, b: _Limbs) -> _Limbs:
    # schoolbook convolution; renormalize inputs first so each product
    # term and the per-diagonal accumulation stay within i32
    a = _limb_renorm(a, LIMB_MAX)
    b = _limb_renorm(b, LIMB_MAX)
    na, nb = len(a.limbs), len(b.limbs)
    limbs: List[Any] = [None] * (na + nb - 1)
    maxabs = [0] * (na + nb - 1)
    for i in range(na):
        for j in range(nb):
            t = a.limbs[i] * b.limbs[j]
            m = a.maxabs[i] * b.maxabs[j]
            if limbs[i + j] is None:
                limbs[i + j] = t
            else:
                limbs[i + j] = limbs[i + j] + t
            maxabs[i + j] += m
    return _limb_renorm(_Limbs(limbs, maxabs), LIMB_MAX)


def _align_scales(av, a_scale: int, bv, b_scale: int):
    if a_scale == b_scale:
        return av, bv, a_scale
    if a_scale % b_scale == 0:
        return av, _limb_scale_mul(bv, a_scale // b_scale), a_scale
    if b_scale % a_scale == 0:
        return _limb_scale_mul(av, b_scale // a_scale), bv, b_scale
    s = a_scale * b_scale
    return (_limb_scale_mul(av, b_scale), _limb_scale_mul(bv, a_scale), s)


def _eval_value(node, env, n: int, symbolic: bool = False):
    """IR -> (_Limbs, scale). Traced inside the program; with
    ``symbolic=True`` limbs are Python ints (0) and only the magnitude
    bounds are computed — used to derive the static output layout."""
    if not symbolic:
        import jax.numpy as jnp
    op = node[0]
    if op == "const":
        _, w, scale = node
        limbs, maxabs = [], []
        u = abs(w)
        sign = 1 if w >= 0 else -1
        if u == 0:
            limbs = [0 if symbolic else jnp.zeros((n,), jnp.int32)]
            maxabs = [0]
        while u:
            d = u & 0xFF
            limbs.append(0 if symbolic
                         else jnp.full((n,), sign * d, jnp.int32))
            maxabs.append(d)
            u >>= 8
        return _Limbs(limbs, maxabs), scale
    if op == "col":
        _, slot, scale, bias, nplanes = node
        if symbolic:
            limbs = [0] * nplanes
        else:
            planes = env[slot]  # u8 [n, p]
            limbs = [planes[:, i].astype(jnp.int32) for i in range(nplanes)]
        maxabs = [LIMB_MAX] * nplanes
        v = _Limbs(limbs, maxabs)
        if bias:
            b, _ = _eval_value(("const", bias, 1), env, n, symbolic)
            v = _limb_add(v, b)
        return v, scale
    if op in ("add", "sub"):
        av, ascale = _eval_value(node[1], env, n, symbolic)
        bv, bscale = _eval_value(node[2], env, n, symbolic)
        av, bv, s = _align_scales(av, ascale, bv, bscale)
        return _limb_add(av, bv, sub=(op == "sub")), s
    if op == "mul":
        av, ascale = _eval_value(node[1], env, n, symbolic)
        bv, bscale = _eval_value(node[2], env, n, symbolic)
        return _limb_mul(av, bv), ascale * bscale
    if op == "rescale":  # exact division by a positive integer constant
        av, ascale = _eval_value(node[1], env, n, symbolic)
        return av, ascale * node[2]
    raise ValueError(op)  # pragma: no cover


def _eval_pred(node, env, n: int):
    import jax.numpy as jnp
    op = node[0]
    if op == "true":
        return jnp.ones((n,), jnp.bool_)
    if op == "false":
        return jnp.zeros((n,), jnp.bool_)
    if op == "and":
        return _eval_pred(node[1], env, n) & _eval_pred(node[2], env, n)
    if op == "or":
        return _eval_pred(node[1], env, n) | _eval_pred(node[2], env, n)
    if op == "not":
        # SQL 3-valued NOT over code predicates: code predicates are
        # False on NULL rows either way, which matches WHERE semantics
        # (NULL filters out) for the monotone predicates we compile.
        return ~_eval_pred(node[1], env, n)
    if op == "isnull":
        _, slot, neg = node
        isnull = env[slot] < 0
        return ~isnull if neg else isnull
    if op == "notnull_true":
        return env[node[1]] >= 0
    if op == "cmp":
        _, kind, slot, bound = node
        c = env[slot]
        notnull = c >= 0
        if kind == "eqcode":
            return c == bound
        if kind == "neqcode":
            return notnull & (c != bound)
        if kind == "lt":
            return notnull & (c < bound)
        if kind == "gte":
            return c >= bound
        raise ValueError(kind)  # pragma: no cover
    raise ValueError(op)  # pragma: no cover


# --------------------------------------------------------------- the program


@functools.lru_cache(maxsize=256)
def _build_program(ir: tuple):
    """One jitted executable per distinct (filter, group, aggs) shape.

    ir = (pred_ir, group_slots_sizes, agg_irs, n_env, valid_of_slot)
    Returns fn(env_chunk_tuple) -> flat tuple of i32/f32 arrays.
    """
    import jax
    import jax.numpy as jnp

    pred_ir, group, agg_irs, n_env = ir
    G = 1
    for _, size in group:
        G *= size + 1  # +1 slot per key for NULL

    def program(*env):
        n = None
        for a in env:
            n = a.shape[0]
            break
        keep = _eval_pred(pred_ir, env, n)
        gid = jnp.zeros((n,), jnp.int32)
        for slot, size in group:
            c = env[slot]
            c = jnp.where(c < 0, size, c)  # NULL -> last slot
            gid = gid * (size + 1) + c
        masks = [keep & (gid == k) for k in range(G)] if group \
            else [keep]

        def msum(x):
            return jnp.stack([jnp.sum(jnp.where(m, x, 0)) for m in masks])

        outs: List[Any] = []
        counts = jnp.stack([jnp.sum(m.astype(jnp.int32)) for m in masks])
        outs.append(counts)
        one = jnp.ones((n,), jnp.int32)
        for a in agg_irs:
            kind = a[0]
            if kind == "count_star":
                outs.append(counts)
            elif kind == "count":
                _, valid_slots = a
                v = one
                for s in valid_slots:
                    v = v * env[s].astype(jnp.int32)
                outs.append(msum(v))
            elif kind in ("sum", "avg"):
                _, val_ir, valid_slots = a
                limbs, scale = _eval_value(val_ir, env, n)
                limbs = _limb_renorm(limbs, LIMB_MAX)
                valid = None
                for s in valid_slots:
                    vs = env[s]
                    valid = vs if valid is None else (valid & vs)
                vcnt = one if valid is None else valid.astype(jnp.int32)
                outs.append(msum(vcnt))
                for l in limbs.limbs:
                    lz = l if valid is None else jnp.where(valid, l, 0)
                    outs.append(msum(lz))
            elif kind in ("min", "max"):
                _, slot = a
                c = env[slot]
                big = jnp.int32(1 << 30)
                if kind == "min":
                    cc = jnp.where(c < 0, big, c)
                    outs.append(jnp.stack(
                        [jnp.min(jnp.where(m, cc, big)) for m in masks]))
                else:
                    outs.append(jnp.stack(
                        [jnp.max(jnp.where(m, c, -big)) for m in masks]))
            else:  # pragma: no cover
                raise ValueError(kind)
        # ONE stacked [K, G] i32 result: a single host fetch (every
        # separate np.asarray costs a full tunnel RTT)
        return jnp.stack(outs)

    return jax.jit(program)


# ------------------------------------------------------------------ routing


def _settings():
    from ..utils.current import current_session
    s = current_session()
    if s is None:
        return None
    return s.settings


def _has_filter(plan) -> bool:
    from ..sql.plans import FilterPlan, Scan
    node = plan.child
    if isinstance(node, FilterPlan):
        return True
    return type(node) is Scan and node.pushdown.filters is not None


def _unwrap_scan(plan):
    """Aggregate child -> (Scan, filter_expr) or bail."""
    from ..sql.plans import FilterPlan, Scan
    node = plan.child
    filt = None
    if isinstance(node, FilterPlan):
        filt = node.expr
        node = node.child
    if type(node) is not Scan:
        raise _Bail("child is not a plain scan")
    pd = node.pushdown
    if node.internal_columns or getattr(node, "virtual_columns", None) \
            or pd.vector_index is not None \
            or pd.inverted_index is not None or pd.limit is not None:
        raise _Bail("scan carries index/limit/virtual pushdowns")
    if pd.filters is not None and filt is not None:
        filt = Func("and", [pd.filters, filt], filt.dtype)
    elif pd.filters is not None:
        filt = pd.filters
    return node, filt


def try_device_scan_agg(plan) -> Optional[DataBlock]:
    """Route an eligible Aggregate(Scan) onto the device; None = host."""
    import jax

    st = _settings()
    if st is None:
        return None
    try:
        if not bool(st.get("enable_device_local_execution")):
            return None
        min_rows = int(st.get("device_scan_agg_min_rows"))
        max_groups = int(st.get("device_scan_agg_max_groups"))
    except Exception:
        return None
    if getattr(plan, "agg_index", None):
        return None  # the aggregating-index scan is strictly cheaper
    try:
        scan, filt = _unwrap_scan(plan)
    except _Bail:
        return None
    table = scan.table
    try:
        snap = table.read_snapshot(scan.snapshot_id)
    except Exception:
        return None
    if snap is None or snap.row_count < min_rows:
        return None
    # work screen (measured, benchmarks/hits_ab): a bare single-aggregate
    # scan (COUNT(*) with a cheap filter, one AVG) finishes on the host
    # inside the ~30 ms dispatch RTT even at 1M rows — route only shapes
    # with real per-row work: a filter or grouping AND either several
    # aggregates or a computed aggregate argument
    has_computed = any(ae and not isinstance(ae[0], BoundColumn)
                       for _, _, ae in plan.aggs)
    has_shape = bool(plan.keys) or _has_filter(plan)
    if min_rows > 0 and not (
            has_shape and (len(plan.aggs) >= 2 or has_computed)):
        return None  # min_rows = 0 forces the route (tests/debug)
    for _, fn, arg_exprs in plan.aggs:
        if getattr(fn, "distinct", False) or getattr(fn, "multi_arg", False):
            return None
        if fn.name not in ("count", "sum", "avg", "min", "max"):
            return None
        if fn.name in ("min", "max") and (
                len(arg_exprs) != 1
                or not isinstance(arg_exprs[0], BoundColumn)):
            return None
    for _, e in plan.keys:
        if not isinstance(e, BoundColumn):
            return None

    try:
        return _execute(plan, scan, filt, snap, max_groups)
    except _Bail:
        return None
    except Exception:
        from ..utils.metrics import METRICS
        METRICS.inc("device_scan_agg_errors")
        return None


def _ndv_estimate(scan, dtc: DeviceTableColumns, name: str) -> int:
    """Distinct-count estimate for a base column: ANALYZE stats when
    available, else the first-block sample (a lower bound — the exact
    post-build grid check still applies)."""
    try:
        from ..statistics.table_stats import load_table_stats
        from ..utils.current import current_session
        s = current_session()
        ts = load_table_stats(s, scan.table.info.table_id) \
            if s is not None else None
        cs = ts.columns.get(name) if ts is not None else None
        if cs is not None and cs.ndv:
            return int(cs.ndv)
    except Exception:
        pass
    try:
        return dtc.sample_ndv(name)
    except Exception:
        return 1 << 30


def _freeze(x):
    if isinstance(x, (list, tuple)):
        return tuple(_freeze(i) for i in x)
    return x


def _value_limb_count(node) -> int:
    """Static limb count of a value IR — the same algebra as
    ``_eval_value`` run over magnitude bounds only (limbs=None)."""
    v, _ = _eval_value(node, env=None, n=0, symbolic=True)
    v = _limb_renorm(v, LIMB_MAX, symbolic=True)
    return len(v.maxabs)


def _execute(plan, scan, filt, snap, max_groups: int) -> DataBlock:
    from ..utils.metrics import METRICS

    dtc = get_table_columns(scan.table, snap.snapshot_id)
    comp = _Compiler(dtc)

    # cheap grid screen BEFORE any codes build: ANALYZE NDV when present,
    # else a first-block distinct sample — a high-cardinality GROUP BY
    # (e.g. group by l_orderkey) must bail in ~ms, not after a whole-
    # table column read + np.unique
    est_grid = 1
    for _, e in plan.keys:
        ent = dtc.cols.get(e.name, {})
        if "codes" in ent:
            size = len(ent["uniques"])
        else:
            size = _ndv_estimate(scan, dtc, e.name)
        est_grid *= size + 1
        if est_grid > max_groups:
            raise _Bail("group grid estimate exceeds"
                        " device_scan_agg_max_groups")

    pred_ir = comp.pred(filt)
    group: List[Tuple[int, int]] = []
    G = 1
    for _, e in plan.keys:
        slot = comp._slot(e.name, "codes")
        size = len(dtc.cols[e.name]["uniques"])
        group.append((slot, size))
        G *= size + 1
    if G > max_groups:
        raise _Bail(f"group grid {G} exceeds device_scan_agg_max_groups")

    agg_irs: List[tuple] = []
    for _, fn, arg_exprs in plan.aggs:
        if fn.name == "count" and not arg_exprs:
            agg_irs.append(("count_star",))
        elif fn.name == "count":
            comp.value(arg_exprs[0])  # validate compilability
            agg_irs.append(("count", comp.value_valid_slots(arg_exprs[0])))
        elif fn.name in ("sum", "avg"):
            val_ir = comp.value(arg_exprs[0])
            agg_irs.append((fn.name, val_ir,
                            comp.value_valid_slots(arg_exprs[0])))
        else:  # min / max over a bound column
            slot = comp._slot(arg_exprs[0].name, "codes")
            agg_irs.append((fn.name, slot))

    env_forms = list(comp.slots)
    ir = (_freeze(pred_ir), tuple(group), _freeze(agg_irs), len(env_forms))
    prog = _build_program(ir)

    # flat-output combine plan: counts first, then per agg
    combine = ["add"]
    for a in agg_irs:
        if a[0] in ("count_star", "count"):
            combine.append("add")
        elif a[0] in ("sum", "avg"):
            combine.append("add")  # valid count
            combine += ["add"] * _value_limb_count(a[1])
        elif a[0] == "min":
            combine.append("min")
        else:
            combine.append("max")

    n_chunks = max((dtc.n_rows + CHUNK_ROWS - 1) // CHUNK_ROWS, 1)
    acc: Optional[List[np.ndarray]] = None
    for ci in range(n_chunks):
        env = []
        for name, form in env_forms:
            ent = dtc.cols[name]
            if form == "codes":
                env.append(ent["codes"][ci])
            elif form == "planes":
                env.append(ent["planes"][ci])
            else:  # planes_valid
                env.append(ent["valid"][ci])
        stacked = np.asarray(prog(*env)).astype(np.int64)
        outs = list(stacked)
        if len(outs) != len(combine):  # pragma: no cover
            raise _Bail("internal: output layout mismatch")
        if acc is None:
            acc = outs
        else:
            for k, kind in enumerate(combine):
                if kind == "add":
                    acc[k] = acc[k] + outs[k]
                elif kind == "min":
                    acc[k] = np.minimum(acc[k], outs[k])
                else:
                    acc[k] = np.maximum(acc[k], outs[k])
    METRICS.inc("device_scan_agg_queries")
    plan.__dict__["_device_routed"] = True  # EXPLAIN ANALYZE marker
    return _finalize(plan, dtc, group, agg_irs, acc)


def _group_key_columns(plan, dtc, group, present: np.ndarray) -> List[Column]:
    """Grid slot ids -> per-key host value columns."""
    cols = []
    slots = present.astype(np.int64)
    # decompose slot id most-significant key first (build order)
    sizes = [size + 1 for _, size in group]
    codes_per_key = []
    rem = slots
    for s in reversed(sizes):
        codes_per_key.append(rem % s)
        rem = rem // s
    codes_per_key.reverse()
    for (kname, kexpr), codes, (_, size) in zip(plan.keys, codes_per_key,
                                                group):
        uniques = dtc.cols[kexpr.name]["uniques"]
        vals = [None if c == size else uniques[c] for c in codes.tolist()]
        dt = kexpr.dtype
        if any(v is None for v in vals):
            dt = dt.wrap_nullable()
        cols.append(Column.from_pylist(
            [v if v is None or not isinstance(v, np.generic) else v.item()
             for v in vals], dt))
    return cols


def _finalize(plan, dtc, group, agg_irs, flat: List[np.ndarray]) -> DataBlock:
    counts = flat[0]
    if group:
        present = np.nonzero(counts > 0)[0]
    else:
        present = np.array([0], np.int64)  # global agg: always one row
    gcnt = counts[present]
    cols = _group_key_columns(plan, dtc, group, present) if group else []
    names = [n for n, _ in plan.keys] + [n for n, _, _ in plan.aggs]

    k = 1
    for (aname, fn, arg_exprs), a in zip(plan.aggs, agg_irs):
        rt = fn.return_type()
        inner = rt.remove_nullable()
        if a[0] in ("count_star", "count"):
            vals = flat[k][present]
            k += 1
            cols.append(Column.from_pylist([int(v) for v in vals], rt))
        elif a[0] in ("sum", "avg"):
            vcnt = flat[k][present]
            k += 1
            nlimbs = _value_limb_count(a[1])
            total = np.zeros(len(present), dtype=object)
            for i in range(nlimbs):
                limb = flat[k][present]
                k += 1
                w = 1 << (8 * i)
                total = total + np.array([int(x) * w for x in limb],
                                         dtype=object)
            scale = _value_scale(a[1])
            out = []
            for t, c in zip(total, vcnt):
                if c == 0:
                    out.append(None)
                elif a[0] == "avg":
                    out.append((int(t) / scale) / int(c))
                elif inner.is_integer():
                    q, r = divmod(int(t), scale)
                    out.append(q if r == 0 else int(round(int(t) / scale)))
                else:
                    out.append(int(t) / scale)
            cols.append(Column.from_pylist(out, rt.wrap_nullable()))
        else:  # min / max
            codes = flat[k][present]
            k += 1
            uniques = dtc.cols[arg_exprs[0].name]["uniques"]
            big = 1 << 30
            out = []
            for c, cnt in zip(codes.tolist(), gcnt.tolist()):
                if cnt == 0 or c >= big or c <= -big or c < 0 \
                        or c >= len(uniques):
                    out.append(None)
                else:
                    v = uniques[c]
                    out.append(v.item() if isinstance(v, np.generic) else v)
            cols.append(Column.from_pylist(out, rt.wrap_nullable()))

    n_out = len(present)
    if not group and n_out == 1 and gcnt[0] == 0:
        # global aggregate over zero matching rows: counts 0, sums NULL —
        # matches _exec_global_aggregate semantics
        pass
    return DataBlock(names, cols, n_out)


def _value_scale(node) -> int:
    op = node[0]
    if op == "const":
        return node[2]
    if op == "col":
        return node[2]
    if op in ("add", "sub"):
        a, b = _value_scale(node[1]), _value_scale(node[2])
        if a % b == 0:
            return a
        if b % a == 0:
            return b
        return a * b
    if op == "mul":
        return _value_scale(node[1]) * _value_scale(node[2])
    if op == "rescale":
        return _value_scale(node[1]) * node[2]
    raise ValueError(op)
