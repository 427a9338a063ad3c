"""Correlated subquery decorrelation: EXISTS / IN -> SEMI / ANTI joins.

Reference: subquery decorrelation in the optimizer
(src/query/sql/src/planner/optimizer/optimizers/rule/ — subquery rewrite
rules lowering correlated EXISTS/IN/ANY into (anti) semi joins).

Here the rewrite runs on the AST before binding: a top-level [NOT]
EXISTS/IN conjunct in WHERE whose inner query references OUTER tables
through qualified columns becomes a LEFT SEMI/ANTI JOIN against the inner
query, with the correlated equality conjuncts hoisted into the join
condition. Unqualified inner columns resolve inside the subquery (standard
SQL scoping), so correlation is detected through qualifiers that don't
match any inner FROM alias — the form every standard correlated query
(TPC-H q4/q21/q22 class) uses.
"""

from __future__ import annotations

from typing import List, Optional, Set, Tuple

from . import ast as A


def split_conjuncts(e: Optional[A.Expr]) -> List[A.Expr]:
    if e is None:
        return []
    if isinstance(e, A.BinaryOp) and e.op.upper() == "AND":
        return split_conjuncts(e.left) + split_conjuncts(e.right)
    return [e]


def and_join(conjs: List[A.Expr]) -> Optional[A.Expr]:
    if not conjs:
        return None
    out = conjs[0]
    for c in conjs[1:]:
        out = A.BinaryOp("AND", out, c)
    return out


def _from_names(ref: Optional[A.TableRef]) -> Set[str]:
    """Alias/table names a FROM clause exposes."""
    out: Set[str] = set()
    if ref is None:
        return out
    if isinstance(ref, A.TableName):
        out.add((ref.alias or ref.name).lower())
    elif isinstance(ref, (A.SubqueryRef, A.TableFunctionRef, A.StageRef,
                          A.ValuesRef)):
        alias = getattr(ref, "alias", None) or getattr(ref, "name", None)
        if alias:
            out.add(str(alias).lower())
    elif isinstance(ref, A.Join):
        out |= _from_names(ref.left)
        out |= _from_names(ref.right)
    elif isinstance(ref, (A.PivotRef, A.UnpivotRef)):
        out |= _from_names(ref.inner)
    return out


def _refs_outside(e: A.Expr, inner_names: Set[str]) -> bool:
    """Any qualified ColumnRef whose qualifier is not an inner name?"""
    import dataclasses
    if isinstance(e, A.ColumnRef):
        return e.table is not None and e.table.lower() not in inner_names
    if not dataclasses.is_dataclass(e):
        return False
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        vals = v if isinstance(v, (list, tuple)) else [v]
        for x in vals:
            if isinstance(x, A.Expr) and _refs_outside(x, inner_names):
                return True
    return False


def _classify(conj: A.Expr, inner_names: Set[str]):
    """'inner' | ('corr', inner_side, outer_side) | None (unsupported)."""
    if not _refs_outside(conj, inner_names):
        return "inner"
    if isinstance(conj, A.BinaryOp) and conj.op == "=":
        l_out = _refs_outside(conj.left, inner_names)
        r_out = _refs_outside(conj.right, inner_names)
        if l_out != r_out:
            inner_side = conj.right if l_out else conj.left
            outer_side = conj.left if l_out else conj.right
            if not _refs_outside(inner_side, inner_names):
                return ("corr", inner_side, outer_side)
    return None


def decorrelate_where(sel: A.SelectStmt, counter: List[int]) -> None:
    """Rewrite sel.from_/sel.where in place; leaves unsupported shapes
    untouched (they follow the uncorrelated path or raise as before)."""
    if sel.where is None or sel.from_ is None:
        return
    keep: List[A.Expr] = []
    for conj in split_conjuncts(sel.where):
        target, negate = conj, False
        if isinstance(conj, A.UnaryOp) and conj.op == "NOT" \
                and isinstance(conj.operand, (A.Exists, A.InSubquery)):
            target, negate = conj.operand, True
        handled = False
        if isinstance(target, (A.Exists, A.InSubquery)):
            neg = negate != target.negated
            handled = _try_rewrite(sel, target, neg, counter)
        if not handled:
            keep.append(conj)
    sel.where = and_join(keep)


def _try_rewrite(sel: A.SelectStmt, target, negated: bool,
                 counter: List[int]) -> bool:
    q = target.query
    body = q.body
    if not isinstance(body, A.SelectStmt) or body.from_ is None:
        return False
    if q.limit is not None or body.group_by or body.group_sets \
            or body.having is not None:
        return False
    inner_names = _from_names(body.from_)
    inner_conjs: List[A.Expr] = []
    corr: List[Tuple[A.Expr, A.Expr]] = []
    for c in split_conjuncts(body.where):
        kind = _classify(c, inner_names)
        if kind == "inner":
            inner_conjs.append(c)
        elif isinstance(kind, tuple):
            corr.append((kind[1], kind[2]))
        else:
            return False  # non-equi correlation: leave untouched
    if not corr:
        return False  # uncorrelated: the constant-folding path handles it
    alias = f"__sq{counter[0]}"
    counter[0] += 1
    items = [A.SelectItem(ins, f"__c{i}") for i, (ins, _) in enumerate(corr)]
    on_parts = [A.BinaryOp("=", A.ColumnRef(f"__c{i}", alias), outer)
                for i, (_, outer) in enumerate(corr)]
    if isinstance(target, A.InSubquery):
        if len(body.items) != 1:
            return False
        items.append(A.SelectItem(body.items[0].expr, "__v"))
        v = A.ColumnRef("__v", alias)
        if negated:
            # NOT IN is three-valued: if the (correlated) subquery yields
            # any NULL, or the outer expr is NULL with a non-empty inner
            # set, the row must be filtered. A plain equality ANTI join
            # would keep it. Lower to a NULL-aware anti join instead:
            # pair on the correlation keys, and treat `v = x OR v IS NULL
            # OR x IS NULL` as the match condition (reference lowers NOT
            # IN via a null-aware mark join). The binder routes this
            # disjunction to the join residual, which the ANTI executor
            # evaluates per matched pair.
            on_parts.append(A.BinaryOp(
                "OR",
                A.BinaryOp("OR", A.BinaryOp("=", v, target.expr),
                           A.IsNull(v)),
                A.IsNull(target.expr)))
        else:
            on_parts.append(A.BinaryOp("=", v, target.expr))
    inner_sel = A.SelectStmt(items, body.from_, and_join(inner_conjs))
    sub = A.SubqueryRef(A.Query(inner_sel), alias)
    sel.from_ = A.Join("ANTI" if negated else "SEMI", sel.from_, sub,
                       and_join(on_parts))
    return True


# --------------------------------------------------------- ANY / ALL / SOME
# Reference: quantified-comparison subquery rewrite (the optimizer lowers
# `x <op> ANY/ALL (q)` into IN-subqueries or min/max scalar aggregates).

_ANYALL_UNSUPPORTED = "unsupported quantified comparison: {} {}"


def _scalar_agg(q: A.Query, agg: str) -> A.Query:
    """`(SELECT agg(__v) FROM (q renamed to __v) __aa)`."""
    import dataclasses
    body = q.body
    if not isinstance(body, A.SelectStmt) or len(body.items) != 1:
        raise ValueError("quantified subquery must select one column")
    new_body = dataclasses.replace(
        body, items=[A.SelectItem(body.items[0].expr, "__v")])
    inner = A.Query(new_body, order_by=q.order_by, limit=q.limit,
                    offset=q.offset, ctes=q.ctes)
    outer = A.SelectStmt(
        [A.SelectItem(A.FunctionCall(agg, [A.ColumnRef("__v", "__aa")]),
                      None)],
        A.SubqueryRef(inner, "__aa"))
    return A.Query(outer)


def _lower_any_all(op: str, lhs: A.Expr, rhs: "A.AnyAllSubquery") -> A.Expr:
    kind, q = rhs.kind, rhs.query
    if op == "=" and kind == "ANY":
        return A.InSubquery(lhs, q)
    if op in ("<>", "!=") and kind == "ALL":
        return A.InSubquery(lhs, q, negated=True)

    def mm(agg: str) -> A.Expr:
        return A.ScalarSubquery(_scalar_agg(q, agg))

    if op in ("<", "<="):
        return A.BinaryOp(op, lhs, mm("max" if kind == "ANY" else "min"))
    if op in (">", ">="):
        return A.BinaryOp(op, lhs, mm("min" if kind == "ANY" else "max"))
    if op == "=" and kind == "ALL":
        # every v equals x  <=>  min(v)=x AND max(v)=x (empty set caveat)
        return A.BinaryOp("AND", A.BinaryOp("=", lhs, mm("min")),
                          A.BinaryOp("=", lhs, mm("max")))
    if op in ("<>", "!=") and kind == "ANY":
        # exists v <> x  <=>  min(v)<>x OR max(v)<>x
        return A.BinaryOp("OR", A.BinaryOp("<>", lhs, mm("min")),
                          A.BinaryOp("<>", lhs, mm("max")))
    raise ValueError(_ANYALL_UNSUPPORTED.format(op, kind))


def rewrite_any_all(e: Optional[A.Expr]) -> Optional[A.Expr]:
    """Replace `x <op> ANY/ALL (subquery)` nodes; recurses through scalar
    expressions but not into subquery bodies (those rewrite when bound)."""
    import dataclasses
    if e is None or isinstance(e, A.Query) or not dataclasses.is_dataclass(e):
        return e
    if isinstance(e, A.BinaryOp):
        e.left = rewrite_any_all(e.left)
        if isinstance(e.right, A.AnyAllSubquery):
            return _lower_any_all(e.op, e.left, e.right)
        e.right = rewrite_any_all(e.right)
        return e
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, A.Expr):
            setattr(e, f.name, rewrite_any_all(v))
        elif isinstance(v, list):
            setattr(e, f.name,
                    [rewrite_any_all(x) if isinstance(x, A.Expr) else x
                     for x in v])
    return e
