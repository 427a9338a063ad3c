"""Prepared / parameterized statements + the batched KNN serving path.

The reference re-plans every SQL request (servers/http/v1/query/
execute_state.rs:401 — parse, bind, optimize, build pipelines per query);
its KNN path is then µs-per-block HNSW inside compiled Rust
(hnsw_index/hnsw.rs:97-118), so per-query planning overhead is tolerable.
In Python the plan/dispatch overhead dominates (measured 39-88 ms/query
at 1M rows through ``ctx.sql``), so the TPU-native answer is to **bind
once and serve many**:

- ``PREPARE p FROM 'SELECT id FROM t ORDER BY l2_distance(emb, ?) LIMIT 10'``
  parses once; ``EXECUTE p USING ([..])`` substitutes parameters into the
  cached AST (no re-parse; the 1-10 KB vector literal never exists as text).
- When the statement matches the canonical KNN shape (single table, no
  filter, ASC distance ORDER BY + LIMIT, a defined VECTOR INDEX with the
  metric — the same gate as the binder rewrite, sql/binder.py
  ``_try_rewrite_vector``), it compiles to a **KnnServer**: the whole
  corpus as ONE HBM-resident ``[N, d]`` array + a host projection block,
  and ``execute_batch(Q[B, d])`` runs ONE jitted MXU top-k dispatch for
  all B queries (exactly the kernel the headline bench measures) and
  gathers B result sets host-side. Recall is 1.0 by construction (exact
  scan), matching ``vector_search_mode=auto``'s measured-faster routing.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

import numpy as np

from ..errors import BadArguments, SemanticError
from ..expression import Column, DataBlock
from ..expression.schema import DataField
from ..types import Float32, VectorType
from ..sql import ast as A
from ..sql.binder import _DISTANCE_FNS
from ..sql.parser import Parser


# ---------------------------------------------------------------- substitution
def substitute_params(stmt: A.Statement, params: Sequence[Any]) -> A.Statement:
    """Deep-copy the AST with every ``Placeholder(i)`` replaced by
    ``Literal(params[i])``. Unbound placeholders raise."""
    stmt = copy.deepcopy(stmt)
    _subst_inplace(stmt, params)
    return stmt


def _to_literal(v: Any) -> A.Literal:
    if isinstance(v, np.ndarray):
        v = v.tolist()
    elif isinstance(v, (np.integer,)):
        v = int(v)
    elif isinstance(v, (np.floating,)):
        v = float(v)
    elif isinstance(v, tuple):
        v = list(v)
    return A.Literal(v)


def _subst_inplace(node: Any, params: Sequence[Any]) -> Any:
    """Returns the replacement for `node` (or `node` itself), mutating
    dataclass fields / list items in place."""
    if isinstance(node, A.Placeholder):
        if node.index >= len(params):
            raise BadArguments(
                f"prepared statement expects {node.index + 1} parameters, "
                f"got {len(params)}")
        return _to_literal(params[node.index])
    if isinstance(node, list):
        for i, x in enumerate(node):
            node[i] = _subst_inplace(x, params)
        return node
    if isinstance(node, tuple):
        return tuple(_subst_inplace(x, params) for x in node)
    if hasattr(node, "__dataclass_fields__"):
        for name in node.__dataclass_fields__:
            old = getattr(node, name)
            new = _subst_inplace(old, params)
            if new is not old:
                setattr(node, name, new)
        return node
    return node


def count_params(node: Any) -> int:
    """Highest placeholder index + 1 anywhere in the AST."""
    best = 0
    if isinstance(node, A.Placeholder):
        return node.index + 1
    if isinstance(node, (list, tuple)):
        for x in node:
            best = max(best, count_params(x))
        return best
    if hasattr(node, "__dataclass_fields__"):
        for name in node.__dataclass_fields__:
            best = max(best, count_params(getattr(node, name)))
    return best


# ------------------------------------------------------------- KNN fast path
@dataclass
class _KnnShape:
    database: Optional[str]
    table: str
    metric_fn: str      # l2_distance | cosine_distance | l1_distance
    column: str
    k: int
    # select items: ("col", name, out_name) | ("star", None, None)
    #             | ("score", None, out_name)
    items: List[tuple]
    param_index: int
    # every placeholder index bound to the query vector (order-by first);
    # all must receive equal values for the fast path to serve
    param_indices: List[int] = None


def _dist_call_matches(e: A.FunctionCall, ref: A.FunctionCall) -> bool:
    """Same distance fn over the same (column, placeholder) pair."""
    if e.name.lower() != ref.name.lower() or len(e.args) != 2:
        return False
    def norm(args):
        a0, a1 = args
        if isinstance(a0, A.Placeholder) and isinstance(a1, A.ColumnRef):
            a0, a1 = a1, a0
        return a0, a1
    a0, a1 = norm(e.args)
    r0, r1 = norm(ref.args)
    # NOTE: the placeholder indices may differ (`?` is positional);
    # the server checks value equality at execute time and falls back
    # to the generic path when the two parameters are not the same vector
    return (isinstance(a0, A.ColumnRef) and isinstance(r0, A.ColumnRef)
            and a0.name.lower() == r0.name.lower()
            and isinstance(a1, A.Placeholder) and isinstance(r1, A.Placeholder))


def match_knn_shape(stmt: A.Statement) -> Optional[_KnnShape]:
    """Recognize `SELECT <cols> FROM t ORDER BY dist(col, ?) [ASC] LIMIT k`
    — the canonical KNN serving statement (reference KNN rewrite gate,
    type_check/vector.rs:70-120)."""
    if not isinstance(stmt, A.QueryStmt):
        return None
    q = stmt.query
    if q.ctes or q.offset is not None or len(q.order_by) != 1:
        return None
    if not isinstance(q.limit, A.Literal) or not isinstance(q.limit.value, int):
        return None
    body = q.body
    if not isinstance(body, A.SelectStmt):
        return None
    if (body.where is not None or body.group_by or body.having
            or body.distinct or body.group_sets or body.qualify
            or body.group_all):
        return None
    if not isinstance(body.from_, A.TableName) or body.from_.at_snapshot:
        return None
    ob = q.order_by[0]
    if not ob.asc or ob.nulls_first:
        return None
    e = ob.expr
    if (not isinstance(e, A.FunctionCall)
            or e.name.lower() not in _DISTANCE_FNS or len(e.args) != 2):
        return None
    a0, a1 = e.args
    if isinstance(a0, A.Placeholder) and isinstance(a1, A.ColumnRef):
        a0, a1 = a1, a0
    if not (isinstance(a0, A.ColumnRef) and isinstance(a1, A.Placeholder)):
        return None
    items: List[tuple] = []
    indices = [a1.index]
    for it in body.items:
        ex = it.expr
        if isinstance(ex, A.Star):
            items.append(("star", None, None))
        elif isinstance(ex, A.ColumnRef):
            items.append(("col", ex.name, it.alias or ex.name))
        elif isinstance(ex, A.FunctionCall) and _dist_call_matches(ex, e):
            items.append(("score", None, it.alias or ex.name.lower()))
            ph = ex.args[1] if isinstance(ex.args[1], A.Placeholder) \
                else ex.args[0]
            indices.append(ph.index)
        else:
            return None
    return _KnnShape(body.from_.database, body.from_.name,
                     e.name.lower(), a0.name, int(q.limit.value),
                     items, a1.index, sorted(set(indices)))


import functools


@functools.lru_cache(maxsize=32)
def _scan_topk_program(k: int, metric: str, n_chunks: int, chunk: int,
                       exact: bool = True):
    """Whole-batch exact top-k as ONE device program: the query batch
    transfers once, a ``lax.scan`` walks the chunks (the [chunk, N]
    distance tile never exceeds one chunk's HBM footprint), and the l2
    re-score runs as ONE batched gather AFTER the loop — in-loop gathers
    measured 2x slower on this chip. One dispatch + one two-array fetch:
    every extra device_get over the transport costs a full round trip."""
    import jax
    import jax.numpy as jnp

    from ..ops.distance import pairwise_distance

    @jax.jit
    def run(Qp, x, n_valid):               # Qp [n_chunks*chunk, d]
        Qc = Qp.reshape(n_chunks, chunk, -1)

        def step(carry, qb):
            d = pairwise_distance(qb, x, "l2" if metric == "l2" else metric,
                                  x_normalized=(metric == "cosine"))
            d = jnp.where(jnp.arange(x.shape[0])[None, :] < n_valid,
                          d, jnp.inf)
            if exact:
                nv, ids = jax.lax.top_k(-d, k)
                return carry, (-nv, ids)
            # approx_min_k: the TPU PartialReduce k-selector — ~36x
            # cheaper than the full top_k sort over [chunk, N] (the
            # kernel bench.py uses it; measured recall@10 ~0.99)
            av, ids = jax.lax.approx_min_k(d, k, recall_target=0.99)
            return carry, (av, ids)

        _, (vals, ids) = jax.lax.scan(step, 0, Qc, length=n_chunks)
        vals = vals.reshape(-1, k)
        ids = ids.reshape(-1, k)
        if metric == "l2":
            # norm-expansion cancels catastrophically for tiny distances;
            # re-score winners diff-based (exact) — same fix as the
            # per-call program (storage/fuse/table.py)
            cand = jnp.take(x, ids.reshape(-1), axis=0)
            cand = cand.reshape(ids.shape[0], k, -1)
            diff = cand - Qp[:, None, :]
            vals = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))
        return vals, ids                   # [n_chunks*chunk, k]

    return run


class _KnnServer:
    """Bound KNN serving state: the stacked HBM corpus + host projection
    block for one table snapshot; ONE device dispatch per query batch."""

    def __init__(self, ctx, shape: _KnnShape):
        self.ctx = ctx
        self.shape = shape
        self._snap_id: Optional[str] = None
        self._x = None              # [N, d] device array
        self._proj: Optional[DataBlock] = None
        self._proj_names: List[tuple] = []  # (src_name, out_name) per col item
        self._dim = 0
        self._n = 0

    # Returns False when the fast path cannot serve (no index / view /
    # missing table state) — caller falls back to the generic path.
    def refresh(self) -> bool:
        sh = self.shape
        try:
            table = self.ctx.table(sh.table, sh.database)
        except Exception:
            return False
        info = getattr(table, "info", None)
        if info is None:
            return False
        self._table = table
        metric = _DISTANCE_FNS[sh.metric_fn]
        col_ok = False
        try:
            f = table.schema.field(sh.column)
        except Exception:
            return False
        vt = f.dtype.remove_nullable()
        if not isinstance(vt, VectorType):
            return False
        for idx in info.vector_indexes():
            distances = [m.strip() for m in
                         idx.options.get("distance", "cosine").split(",")]
            if idx.columns[0].lower() == sh.column.lower() \
                    and metric in distances:
                col_ok = True
                break
        if not col_ok:
            return False
        snap = table.read_snapshot()
        if snap is None:
            self._snap_id, self._n = None, 0
            return True
        if snap.snapshot_id == self._snap_id:
            return True
        metas = [m for seg in table.read_segments(snap) for m in seg.blocks]
        if not metas:
            self._snap_id, self._n = snap.snapshot_id, 0
            return True
        self._x, _ = table.stacked_device_vectors(
            metas, sh.column, normalized=(metric == "cosine"))
        self._dim = vt.dim
        self._n = sum(m.row_count for m in metas)
        # host projection block in corpus row order
        proj: List[tuple] = []
        for kind, name, out in sh.items:
            if kind == "star":
                for fname in table.schema.field_names():
                    proj.append((fname, fname))
            elif kind == "col":
                proj.append((table.schema.field(name).name, out))
        self._proj_names = proj
        src_names = list(dict.fromkeys(n for n, _ in proj))
        if src_names:
            self._proj = DataBlock.concat(
                [table.read_block(m, src_names) for m in metas])
        else:
            self._proj = None
        self._table = table
        self._snap_id = snap.snapshot_id
        return True

    def _empty_fields(self) -> List[DataField]:
        """Output schema for an empty table (no corpus loaded yet)."""
        out = []
        for kind, name, outn in self.shape.items:
            if kind == "star":
                for f in self._table.schema.fields:
                    out.append(DataField(f.name, f.dtype))
            elif kind == "col":
                f = self._table.schema.field(name)
                out.append(DataField(outn, f.dtype))
            else:
                out.append(DataField(outn, Float32))
        return out

    def _fields(self) -> List[DataField]:
        out = []
        by_src = {}
        if self._proj is not None:
            by_src = dict(self._proj.items())
        for kind, name, outn in self.shape.items:
            if kind == "star":
                for fname in self._table.schema.field_names():
                    out.append(DataField(fname, by_src[fname].dtype))
            elif kind == "col":
                src = self._table.schema.field(name).name
                out.append(DataField(outn, by_src[src].dtype))
            else:
                out.append(DataField(outn, Float32))
        return out

    def _check_queries(self, queries: np.ndarray) -> np.ndarray:
        Q = np.asarray(queries, np.float32)
        if Q.ndim == 1:
            Q = Q[None, :]
        if self._n and Q.shape[1] != self._dim:
            raise SemanticError(
                f"{self.shape.metric_fn}: vector dims differ "
                f"({self._dim} vs {Q.shape[1]})")
        return Q

    def _topk(self, Q: np.ndarray, exact: bool = True):
        """Pipelined device top-k for the whole batch + ONE bulk projection
        gather. Returns (vals [B,k], ids [B,k], taken_all [B*k rows], k).
        ``exact=False`` selects with ``lax.approx_min_k`` (recall_target
        0.99) instead of the full sort — the high-throughput mode."""
        from ..storage.fuse.table import _exact_topk_program
        import jax
        metric = _DISTANCE_FNS[self.shape.metric_fn]
        k = min(self.shape.k, self._n)
        B = Q.shape[0]
        # chunk to a stable program shape and PIPELINE: every chunk is
        # dispatched before any result is fetched (JAX async dispatch), so
        # device compute overlaps the tunnel round trip; ONE device_get
        # drains all chunks
        CHUNK = 256
        if B <= CHUNK:
            chunks = [Q]
        else:
            chunks = [Q[i:i + CHUNK] for i in range(0, B, CHUNK)]
            last = chunks[-1]
            if last.shape[0] != CHUNK:   # pad to reuse the compiled program
                pad = np.repeat(last[:1], CHUNK - last.shape[0], axis=0)
                chunks[-1] = np.concatenate([last, pad])
        if len(chunks) > 1:
            # whole batch as ONE program: chunk count pads to a power of
            # two so compiled variants stay logarithmic in batch size
            # (padded chunks cost bounded 2x compute at the tail; callers
            # chasing peak throughput use power-of-two batches)
            nd = len(chunks)
            nc = 1 << (nd - 1).bit_length()
            Qp = np.concatenate(chunks, axis=0)
            if nc > nd:
                Qp = np.concatenate(
                    [Qp, np.zeros(((nc - nd) * CHUNK, Qp.shape[1]),
                                  np.float32)], axis=0)
            vals, ids = jax.device_get(
                _scan_topk_program(k, metric, nc, CHUNK, exact)(
                    Qp, self._x, np.int32(self._n)))
            vals = vals[:B]
            ids = ids[:B]
        else:
            pend = [_exact_topk_program(ch, self._x, k, metric,
                                        n_valid=self._n) for ch in chunks]
            fetched = jax.device_get(pend)
            vals = np.concatenate([v for v, _ in fetched], axis=0)[:B]
            ids = np.concatenate([i for _, i in fetched], axis=0)[:B]
        # ONE bulk gather for all B result sets; per-query blocks are
        # zero-copy slices of it
        taken_all = (self._proj.take(ids.reshape(-1))
                     if self._proj is not None else None)
        return vals, ids, taken_all, k

    def _empty_result(self):
        from .session import QueryResult
        fields = self._empty_fields()
        return QueryResult(
            DataBlock([f.name for f in fields],
                      [Column.from_pylist([], f.dtype) for f in fields]),
            fields)

    def run_batch(self, queries: np.ndarray, exact: bool = True):
        from .session import QueryResult
        sh = self.shape
        Q = self._check_queries(queries)
        if self._n == 0:
            return [self._empty_result() for _ in range(Q.shape[0])]
        vals, ids, taken_all, k = self._topk(Q, exact)
        fields = self._fields()
        schema_names = self._table.schema.field_names()
        out = []
        for b in range(Q.shape[0]):
            taken = (taken_all.slice(b * k, (b + 1) * k)
                     if taken_all is not None else None)
            cols, names = [], []
            for kind, name, outn in sh.items:
                if kind == "star":
                    for fname in schema_names:
                        names.append(fname)
                        cols.append(taken.column(fname))
                elif kind == "col":
                    src = self._table.schema.field(name).name
                    names.append(outn)
                    cols.append(taken.column(src))
                else:
                    names.append(outn)
                    cols.append(Column(Float32, np.asarray(vals[b],
                                                           np.float32)))
            out.append(QueryResult(DataBlock(names, cols), fields))
        return out

    def run_batch_block(self, queries: np.ndarray, exact: bool = True):
        """Bulk-serving mode: ONE QueryResult for the whole batch with a
        leading ``query_index`` column (row b*k+j belongs to query b, rank
        j). No per-query object churn — pure bulk numpy construction, the
        batch analog of the FAISS-style [B, k] return shape."""
        from ..types import Int64
        from .session import QueryResult
        sh = self.shape
        Q = self._check_queries(queries)
        B = Q.shape[0]
        if self._n == 0:
            fields = [DataField("query_index", Int64)] + self._empty_fields()
            return QueryResult(
                DataBlock([f.name for f in fields],
                          [Column.from_pylist([], f.dtype) for f in fields]),
                fields)
        vals, ids, taken_all, k = self._topk(Q, exact)
        names = ["query_index"]
        cols = [Column(Int64, np.repeat(np.arange(B, dtype=np.int64), k))]
        fields = [DataField("query_index", Int64)] + self._fields()
        for kind, name, outn in sh.items:
            if kind == "star":
                for fname in self._table.schema.field_names():
                    names.append(fname)
                    cols.append(taken_all.column(fname))
            elif kind == "col":
                src = self._table.schema.field(name).name
                names.append(outn)
                cols.append(taken_all.column(src))
            else:
                names.append(outn)
                cols.append(Column(Float32,
                                   np.ascontiguousarray(
                                       vals.reshape(-1), np.float32)))
        return QueryResult(DataBlock(names, cols), fields)


# ------------------------------------------------------------------ statement
class PreparedStatement:
    """Parse-once / bind-once statement handle (``ctx.prepare(sql)``).

    ``execute(*params)`` substitutes into the cached AST — no re-parse.
    ``execute_batch`` serves B parameter sets; for the canonical KNN
    shape all B run as ONE device program (the product-path analog of
    the kernel benchmark batch)."""

    def __init__(self, ctx, sql: str):
        self.ctx = ctx
        self.sql = sql
        p = Parser(sql)
        self.stmt = p.parse()
        self.param_count = max(p.param_count, count_params(self.stmt))
        shape = match_knn_shape(self.stmt)
        self._knn = _KnnServer(ctx, shape) if shape is not None else None

    def execute(self, *params) -> "QueryResult":
        if len(params) != self.param_count:
            raise BadArguments(
                f"prepared statement expects {self.param_count} parameters,"
                f" got {len(params)}")
        if self._knn is not None and self._params_agree(params) \
                and self._knn.refresh():
            q = np.asarray(params[self._knn.shape.param_index], np.float32)
            return self._knn.run_batch(q[None, :] if q.ndim == 1 else q)[0]
        stmt = substitute_params(self.stmt, params)
        return self.ctx._execute_statement(stmt)

    def execute_batch(self, param_sets, exact: bool = True
                      ) -> List["QueryResult"]:
        """``param_sets``: a list of per-execution parameter tuples, or —
        for single-parameter KNN statements — a ``[B, d]`` array of query
        vectors. Returns one QueryResult per execution. ``exact=False``
        selects with the TPU approx k-selector (recall_target 0.99,
        ~an order of magnitude cheaper than the full sort)."""
        if self._knn is not None and self._knn.refresh():
            arr = self._as_query_matrix(param_sets)
            if arr is not None:
                return self._knn.run_batch(arr, exact)
        out = []
        for ps in param_sets:
            if not isinstance(ps, (list, tuple)):
                ps = (ps,)
            # a single vector parameter may be passed as the bare list
            if self.param_count == 1 and len(ps) != 1:
                ps = (list(ps),)
            out.append(self.execute(*ps))
        return out

    def _params_agree(self, params) -> bool:
        """All placeholders bound to the query vector hold equal values."""
        idxs = self._knn.shape.param_indices
        if len(idxs) <= 1:
            return True
        first = np.asarray(params[idxs[0]], np.float32)
        return all(np.array_equal(first,
                                  np.asarray(params[i], np.float32))
                   for i in idxs[1:])

    def execute_batch_block(self, param_sets, exact: bool = True
                            ) -> "QueryResult":
        """Bulk-serving variant of ``execute_batch``: ONE result block for
        the whole batch with a leading ``query_index`` column. Only the
        KNN fast path supports it (raises otherwise) — this is the shape
        high-throughput serving loops should use."""
        if self._knn is None or not self._knn.refresh():
            raise BadArguments(
                "execute_batch_block requires the batched KNN fast path "
                "(single indexed table, ORDER BY distance LIMIT k)")
        arr = self._as_query_matrix(param_sets)
        if arr is None:
            raise BadArguments(
                "execute_batch_block expects a [B, dim] batch of query "
                "vectors")
        return self._knn.run_batch_block(arr, exact)

    def _as_query_matrix(self, param_sets) -> Optional[np.ndarray]:
        """[B, d] f32 matrix when every param set is just one vector."""
        if self.param_count != len(self._knn.shape.param_indices):
            return None
        if self.param_count != 1:
            # same vector repeated across placeholders: accept tuples of
            # equal vectors, normalize to the single-vector form
            rows = []
            for ps in param_sets:
                if not isinstance(ps, (list, tuple)) \
                        or len(ps) != self.param_count:
                    return None
                vs = [np.asarray(p, np.float32) for p in ps]
                if any(not np.array_equal(vs[0], v) for v in vs[1:]):
                    return None
                rows.append(vs[0])
            if not rows or any(r.shape != rows[0].shape for r in rows):
                return None
            return np.stack(rows)
        if isinstance(param_sets, np.ndarray) and param_sets.ndim == 2:
            return np.asarray(param_sets, np.float32)
        rows = []
        for ps in param_sets:
            if isinstance(ps, (list, tuple)) and len(ps) == 1 \
                    and isinstance(ps[0], (list, tuple, np.ndarray)):
                ps = ps[0]
            if not isinstance(ps, (list, tuple, np.ndarray)):
                return None
            a = np.asarray(ps, dtype=np.float32)
            if a.ndim != 1:
                return None
            rows.append(a)
        if not rows or any(r.shape != rows[0].shape for r in rows):
            return None
        return np.stack(rows)
