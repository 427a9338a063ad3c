"""Aggregate functions (reference: src/query/functions/src/aggregates/, 37 files).

Vectorized grouped accumulation: every aggregate consumes
``(group_ids [N], num_groups, payload, validity)`` and updates a dense
per-group state — the segmented-reduction analog of the reference's
per-group hashtable states. Works for both hash aggregation (group_ids
from a group-by hash) and global aggregation (all zeros).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Type

import numpy as np

from ...errors import SemanticError, UnknownFunction
from ...types import (Boolean, DataType, Float64, Int64, NumberType, String,
                      UInt64)
from ..column import Column, StringData


class AggregateFunction:
    name: str = ""

    def __init__(self, arg_types: List[DataType], distinct: bool = False):
        self.arg_types = arg_types
        self.distinct = distinct

    def return_type(self) -> DataType:
        raise NotImplementedError

    def init_state(self, num_groups: int):
        raise NotImplementedError

    def update(self, state, group_ids: np.ndarray, payload, validity: Optional[np.ndarray]):
        raise NotImplementedError

    def merge(self, s1, s2):
        """Merge two equal-num_groups states (for parallel partials)."""
        raise NotImplementedError

    def finalize(self, state, num_groups: int) -> Column:
        raise NotImplementedError

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _mask(group_ids, payload, validity):
        if validity is None:
            return group_ids, payload
        keep = validity
        return group_ids[keep], payload[keep] if payload is not None else None


class CountAgg(AggregateFunction):
    name = "count"

    def return_type(self):
        return UInt64

    def init_state(self, num_groups):
        return np.zeros(num_groups, np.int64)

    def update(self, state, group_ids, payload, validity):
        gids = group_ids if validity is None else group_ids[validity]
        np.add.at(state, gids, 1)

    def merge(self, s1, s2):
        return s1 + s2

    def finalize(self, state, num_groups):
        return Column.from_numpy(state.astype(np.uint64))


class SumAgg(AggregateFunction):
    name = "sum"

    def _decimal_type(self):
        from ...types import DecimalType
        t = self.arg_types[0].remove_nullable() if self.arg_types else None
        return t if isinstance(t, DecimalType) else None

    def return_type(self):
        t = self.arg_types[0].remove_nullable()
        if not t.is_numeric() and t != Boolean:
            raise SemanticError(f"sum expects numeric, got {t}")
        dt = self._decimal_type()
        if dt is not None:
            return dt
        if isinstance(t, NumberType) and t.is_float():
            return Float64
        return Int64 if t != Boolean else UInt64

    def init_state(self, num_groups):
        if self._decimal_type() is not None:
            import decimal
            return [[decimal.Decimal(0)] * num_groups]
        return np.zeros(num_groups, np.float64)

    def update(self, state, group_ids, payload, validity):
        if self._decimal_type() is not None:
            acc = state[0]
            vals = payload.tolist()
            for i, g in enumerate(group_ids.tolist()):
                if validity is not None and not validity[i]:
                    continue
                acc[g] += vals[i]
            return
        gids, p = self._mask(group_ids, np.asarray(payload, np.float64), validity)
        state += np.bincount(gids, weights=p, minlength=len(state))

    def merge(self, s1, s2):
        return s1 + s2

    def finalize(self, state, num_groups):
        rt = self.return_type()
        if self._decimal_type() is not None:
            return Column.from_pylist(state[0], rt)
        return Column.from_numpy(state.astype(rt.numpy_dtype()), rt)


class AvgAgg(AggregateFunction):
    name = "avg"

    def return_type(self):
        return Float64

    def init_state(self, num_groups):
        return [np.zeros(num_groups, np.float64), np.zeros(num_groups, np.int64)]

    def update(self, state, group_ids, payload, validity):
        gids, p = self._mask(group_ids, np.asarray(payload, np.float64), validity)
        state[0] += np.bincount(gids, weights=p, minlength=len(state[0]))
        np.add.at(state[1], gids, 1)

    def merge(self, s1, s2):
        return [s1[0] + s2[0], s1[1] + s2[1]]

    def finalize(self, state, num_groups):
        sums, counts = state
        with np.errstate(invalid="ignore", divide="ignore"):
            out = sums / counts
        validity = counts > 0
        return Column(Float64.wrap_nullable(), np.where(validity, out, 0.0),
                      None if validity.all() else validity)


class _MinMaxAgg(AggregateFunction):
    _is_min = True

    def return_type(self):
        return self.arg_types[0].remove_nullable()

    def _py_path(self):
        from ...types import DecimalType
        t = self.arg_types[0].remove_nullable()
        return t == String or isinstance(t, DecimalType)

    def init_state(self, num_groups):
        if self._py_path():
            return [[None] * num_groups]
        fill = np.inf if self._is_min else -np.inf
        return [np.full(num_groups, fill, np.float64), np.zeros(num_groups, np.bool_)]

    def update(self, state, group_ids, payload, validity):
        if self._py_path():
            vals = payload.to_pylist() if isinstance(payload, StringData) else list(payload)
            best = state[0]
            for i, g in enumerate(group_ids.tolist()):
                if validity is not None and not validity[i]:
                    continue
                v = vals[i]
                if best[g] is None or (v < best[g] if self._is_min else v > best[g]):
                    best[g] = v
            return
        gids, p = self._mask(group_ids, np.asarray(payload, np.float64), validity)
        op = np.minimum if self._is_min else np.maximum
        op.at(state[0], gids, p)
        state[1][gids] = True

    def merge(self, s1, s2):
        if self._py_path():
            out = []
            for a, b in zip(s1[0], s2[0]):
                if a is None:
                    out.append(b)
                elif b is None:
                    out.append(a)
                else:
                    out.append(min(a, b) if self._is_min else max(a, b))
            return [out]
        op = np.minimum if self._is_min else np.maximum
        return [op(s1[0], s2[0]), s1[1] | s2[1]]

    def finalize(self, state, num_groups):
        t = self.arg_types[0].remove_nullable()
        if self._py_path():
            return Column.from_pylist(state[0], t.wrap_nullable())
        vals, seen = state
        col_vals = np.where(seen, vals, 0.0).astype(t.numpy_dtype())
        return Column(t.wrap_nullable(), col_vals, None if seen.all() else seen)


class MinAgg(_MinMaxAgg):
    name = "min"
    _is_min = True


class MaxAgg(_MinMaxAgg):
    name = "max"
    _is_min = False


class CountDistinctAgg(AggregateFunction):
    name = "count_distinct"

    def return_type(self):
        return UInt64

    def init_state(self, num_groups):
        return [set() for _ in range(num_groups)]

    def update(self, state, group_ids, payload, validity):
        vals = payload.to_pylist() if isinstance(payload, StringData) else payload.tolist()
        for i, g in enumerate(group_ids.tolist()):
            if validity is not None and not validity[i]:
                continue
            state[g].add(vals[i])

    def merge(self, s1, s2):
        return [a | b for a, b in zip(s1, s2)]

    def finalize(self, state, num_groups):
        return Column.from_numpy(np.array([len(s) for s in state], np.uint64))


class AnyAgg(AggregateFunction):
    name = "any"

    def return_type(self):
        return self.arg_types[0].remove_nullable()

    def init_state(self, num_groups):
        return [[None] * num_groups]

    def update(self, state, group_ids, payload, validity):
        vals = payload.to_pylist() if isinstance(payload, StringData) else payload.tolist()
        for i, g in enumerate(group_ids.tolist()):
            if validity is not None and not validity[i]:
                continue
            if state[0][g] is None:
                state[0][g] = vals[i]

    def merge(self, s1, s2):
        return [[a if a is not None else b for a, b in zip(s1[0], s2[0])]]

    def finalize(self, state, num_groups):
        return Column.from_pylist(state[0], self.return_type().wrap_nullable())


class _VarianceAgg(AggregateFunction):
    """Welford-free sum/sumsq variance (population or sample)."""

    _sample = False

    def return_type(self):
        return Float64

    def init_state(self, num_groups):
        return [np.zeros(num_groups, np.float64), np.zeros(num_groups, np.float64),
                np.zeros(num_groups, np.int64)]

    def update(self, state, group_ids, payload, validity):
        gids, p = self._mask(group_ids, np.asarray(payload, np.float64), validity)
        state[0] += np.bincount(gids, weights=p, minlength=len(state[0]))
        state[1] += np.bincount(gids, weights=p * p, minlength=len(state[1]))
        np.add.at(state[2], gids, 1)

    def merge(self, s1, s2):
        return [s1[0] + s2[0], s1[1] + s2[1], s1[2] + s2[2]]

    def _var(self, state):
        s, ss, n = state
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            var = np.maximum(ss / n - mean * mean, 0.0)
            if self._sample:
                var = var * n / np.maximum(n - 1, 1)
        return var, n

    def finalize(self, state, num_groups):
        var, n = self._var(state)
        valid = n > (1 if self._sample else 0)
        return Column(Float64.wrap_nullable(), np.where(valid, var, 0.0),
                      None if valid.all() else valid)


class VarPopAgg(_VarianceAgg):
    name = "var_pop"


class VarSampAgg(_VarianceAgg):
    name = "var_samp"
    _sample = True


class _StddevAgg(_VarianceAgg):
    def finalize(self, state, num_groups):
        var, n = self._var(state)
        valid = n > (1 if self._sample else 0)
        return Column(Float64.wrap_nullable(), np.where(valid, np.sqrt(var), 0.0),
                      None if valid.all() else valid)


class StddevPopAgg(_StddevAgg):
    name = "stddev_pop"


class StddevSampAgg(_StddevAgg):
    name = "stddev_samp"
    _sample = True


class StringAggAgg(AggregateFunction):
    name = "string_agg"

    def return_type(self):
        return String

    def init_state(self, num_groups):
        return [[[] for _ in range(num_groups)]]

    def update(self, state, group_ids, payload, validity):
        vals = payload.to_pylist() if isinstance(payload, StringData) else [str(v) for v in payload.tolist()]
        for i, g in enumerate(group_ids.tolist()):
            if validity is not None and not validity[i]:
                continue
            state[0][g].append(vals[i])

    def merge(self, s1, s2):
        return [[a + b for a, b in zip(s1[0], s2[0])]]

    def finalize(self, state, num_groups):
        sep = ","
        if len(self.arg_types) > 1:
            sep = getattr(self, "separator", ",")
        return Column.from_pylist([sep.join(v) for v in state[0]], String)


class MedianAgg(AggregateFunction):
    """median / quantile (exact, buffered per group — reference:
    aggregates/aggregate_quantile_*.rs family)."""
    name = "median"
    _q = 0.5

    def return_type(self):
        return Float64

    def init_state(self, num_groups):
        return [[[] for _ in range(num_groups)]]

    def update(self, state, group_ids, payload, validity):
        vals = np.asarray(payload, np.float64)
        for i, g in enumerate(group_ids.tolist()):
            if validity is not None and not validity[i]:
                continue
            state[0][g].append(vals[i])

    def finalize(self, state, num_groups):
        out = np.zeros(num_groups, np.float64)
        valid = np.ones(num_groups, np.bool_)
        for g, buf in enumerate(state[0]):
            if buf:
                out[g] = float(np.quantile(np.asarray(buf), self._q))
            else:
                valid[g] = False
        return Column(Float64.wrap_nullable(), out,
                      None if valid.all() else valid)


class Quantile25Agg(MedianAgg):
    name = "quantile_25"
    _q = 0.25


class Quantile75Agg(MedianAgg):
    name = "quantile_75"
    _q = 0.75


class Quantile90Agg(MedianAgg):
    name = "quantile_90"
    _q = 0.9


class Quantile99Agg(MedianAgg):
    name = "quantile_99"
    _q = 0.99


class ArrayAggAgg(AggregateFunction):
    name = "array_agg"

    def return_type(self):
        from ...types import ArrayType, Float64 as _F
        inner = self.arg_types[0].remove_nullable() if self.arg_types else _F
        from ...types import ArrayType
        return ArrayType(inner)

    def init_state(self, num_groups):
        return [[[] for _ in range(num_groups)]]

    def update(self, state, group_ids, payload, validity):
        vals = payload.to_pylist() if isinstance(payload, StringData) \
            else payload.tolist()
        for i, g in enumerate(group_ids.tolist()):
            if validity is not None and not validity[i]:
                continue
            state[0][g].append(vals[i])

    def finalize(self, state, num_groups):
        return Column.from_pylist(state[0], self.return_type())


AGGREGATE_FUNCTIONS: Dict[str, Type[AggregateFunction]] = {
    "median": MedianAgg,
    "quantile": MedianAgg,
    "quantile_25": Quantile25Agg,
    "quantile_75": Quantile75Agg,
    "quantile_90": Quantile90Agg,
    "quantile_99": Quantile99Agg,
    "array_agg": ArrayAggAgg,
    "list": ArrayAggAgg,
    "count": CountAgg,
    "sum": SumAgg,
    "avg": AvgAgg,
    "min": MinAgg,
    "max": MaxAgg,
    "any": AnyAgg,
    "count_distinct": CountDistinctAgg,
    "approx_count_distinct": CountDistinctAgg,
    "var_pop": VarPopAgg,
    "variance": VarPopAgg,
    "var_samp": VarSampAgg,
    "stddev_pop": StddevPopAgg,
    "stddev": StddevPopAgg,
    "std": StddevPopAgg,
    "stddev_samp": StddevSampAgg,
    "string_agg": StringAggAgg,
    "group_concat": StringAggAgg,
}


def is_aggregate_function(name: str) -> bool:
    return name.lower() in AGGREGATE_FUNCTIONS


def create_aggregate(name: str, arg_types: List[DataType],
                     distinct: bool = False) -> AggregateFunction:
    key = name.lower()
    if key == "count" and distinct:
        key = "count_distinct"
    if key not in AGGREGATE_FUNCTIONS:
        raise UnknownFunction(f"unknown aggregate function {name!r}")
    return AGGREGATE_FUNCTIONS[key](arg_types, distinct)
