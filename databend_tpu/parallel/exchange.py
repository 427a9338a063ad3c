"""General-plan distributed execution: the exchange operators.

The reference fragments arbitrary physical plans at exchange points and
ships Arrow Flight streams between nodes (reference:
schedulers/fragments/fragmenter.rs:238-266 — Shuffle | Merge | Expansive
(broadcast); servers/flight/v1/exchange/exchange_manager.rs:168). The
TPU-native design replaces every one of those data movements with an XLA
collective over the device mesh:

* Merge exchange      -> per-shard partials + ``psum``/``pmax``/``pmin``
                         (grouped aggregation), or per-shard top-n +
                         ``all_gather`` + final select (ordered merge)
* Broadcast exchange  -> replicated build side, per-shard lookup join
* Shuffle exchange    -> ``all_to_all`` repartition by key hash so equal
                         keys land on one shard (large-large joins,
                         shuffle aggregation)

Keys are turned into dense global int codes on the host (pipeline/keys
factorization — the exchange hash function analog); the device programs
are fixed-shape XLA with padding + validity masks where row counts vary.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import (DP_AXIS, SHARD_AXIS, corpus_sharding, make_mesh,
                   put_sharded, replicated)

# --------------------------------------------------------------- helpers


def pad_rows(arr: np.ndarray, multiple: int, fill=0):
    """Pad axis 0 to a multiple; returns (padded, n_valid)."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_shape = (rem,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)]), n


def shard_rows_padded(mesh, arr: np.ndarray, fill=0):
    """Row-shard a host array over the mesh's shard axis, padding to an
    even split. Returns (device_array, n_valid)."""
    s = mesh.shape[SHARD_AXIS]
    padded, n = pad_rows(arr, s, fill)
    spec = P(SHARD_AXIS) if padded.ndim == 1 else P(
        SHARD_AXIS, *([None] * (padded.ndim - 1)))
    return put_sharded(padded, mesh, spec), n


# ----------------------------------------------------- pipe width resize

@functools.lru_cache(maxsize=64)
def _resize_program(mesh, rows_in: int, rows_out: int, ndim: int, fill):
    spec = P(SHARD_AXIS) if ndim == 1 else P(SHARD_AXIS,
                                             *([None] * (ndim - 1)))
    sh = NamedSharding(mesh, spec)

    def f(x):
        if rows_out <= rows_in:
            y = x[:rows_out]
        else:
            pad = [(0, rows_out - rows_in)] + [(0, 0)] * (x.ndim - 1)
            y = jnp.pad(x, pad, constant_values=fill)
        return y

    return jax.jit(f, out_shardings=sh)


def resize_width(mesh, x, n_valid: int, width: int, fill=0):
    """``Pipeline::resize`` analog (reference src/query/pipeline/src/core/
    pipeline.rs resize pipes): change an operator chain's parallel width
    mid-pipeline. A row-sharded device array whose valid rows are a
    global prefix is re-packed so that prefix occupies exactly ``width``
    of the mesh's shard slots (the remaining shards hold only fill);
    widening re-spreads it back. The data never returns to host — XLA
    inserts the cross-device copy for the new layout.

    Returns ``(y, rows_per_shard)``: ``y`` keeps the ``P(shard)``
    sharding so downstream shard_map stages just run at the new width
    (slots >= width see only fill and must mask, exactly like the
    reference's dummy ports on a narrowed pipe).
    """
    s = mesh.shape[SHARD_AXIS]
    if not 1 <= width <= s:
        raise ValueError(f"width {width} not in [1, {s}]")
    if x.shape[0] % s:
        raise ValueError("input rows must already be mesh-divisible")
    cap = -(-max(int(n_valid), 1) // width)
    rows_out = s * cap
    prog = _resize_program(mesh, int(x.shape[0]), rows_out, x.ndim,
                           fill if not isinstance(fill, np.ndarray)
                           else float(fill))
    return prog(x), cap


def rebalance(mesh, x, n_valid: int, fill=0):
    """Full-width resize: even out per-shard load after an upstream stage
    changed the row count (the reference resizes after filters for the
    same reason)."""
    return resize_width(mesh, x, n_valid, mesh.shape[SHARD_AXIS],
                        fill=fill)


# ------------------------------------------------- grouped merge aggregate

@functools.lru_cache(maxsize=64)
def _grouped_agg_program(mesh, n_groups: int, ops: Tuple[str, ...]):
    """Per-shard segment aggregation + psum merge (the grouped Merge
    exchange). gids: [n_l] int32 global group codes (-1 = padding row);
    vals: [n_l, n_aggs] f64."""

    def local(gids, vals):
        valid = gids >= 0
        g = jnp.where(valid, gids, 0)
        outs = []
        for j, op in enumerate(ops):
            v = vals[:, j]
            if op == "count":
                part = jax.ops.segment_sum(
                    valid.astype(jnp.float64), g, num_segments=n_groups)
                outs.append(jax.lax.psum(part, SHARD_AXIS))
            elif op == "sum":
                part = jax.ops.segment_sum(
                    jnp.where(valid, v, 0.0), g, num_segments=n_groups)
                outs.append(jax.lax.psum(part, SHARD_AXIS))
            elif op == "min":
                part = jax.ops.segment_min(
                    jnp.where(valid, v, jnp.inf), g, num_segments=n_groups)
                outs.append(jax.lax.pmin(part, SHARD_AXIS))
            elif op == "max":
                part = jax.ops.segment_max(
                    jnp.where(valid, v, -jnp.inf), g, num_segments=n_groups)
                outs.append(jax.lax.pmax(part, SHARD_AXIS))
            else:
                raise ValueError(op)
        return jnp.stack(outs, axis=1)  # [n_groups, n_aggs]

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=P(), check_vma=False))


def sharded_grouped_agg(mesh, gids: np.ndarray, values: np.ndarray,
                        n_groups: int, ops: Sequence[str]) -> np.ndarray:
    """Distributed GROUP BY: rows (global group codes + agg inputs) are
    sharded over the mesh; each shard segment-aggregates its rows into a
    dense [G, n_aggs] state and the states merge with psum/pmin/pmax.

    ``ops[j]`` in sum|count|min|max applies to values[:, j].
    Returns the merged [n_groups, len(ops)] array. Accumulation runs at
    the device's native f32 (TPU-native width; callers needing exact f64
    sums run the host path).
    """
    gids_dev, _ = shard_rows_padded(mesh, gids.astype(np.int32), fill=-1)
    vals_dev, _ = shard_rows_padded(
        mesh, np.ascontiguousarray(values, np.float64))
    out = _grouped_agg_program(mesh, int(n_groups), tuple(ops))(
        gids_dev, vals_dev)
    return np.asarray(out)


# ------------------------------------------------------ ordered merge top-n

@functools.lru_cache(maxsize=64)
def _topn_program(mesh, n: int, asc: bool):
    def local(keys, ids):
        k = min(n, keys.shape[0])
        sel = -keys if asc else keys
        vals, pos = jax.lax.top_k(sel, k)
        local_ids = jnp.take(ids, pos)
        all_v = jax.lax.all_gather(vals, SHARD_AXIS).reshape(-1)
        all_i = jax.lax.all_gather(local_ids, SHARD_AXIS).reshape(-1)
        out_v, out_pos = jax.lax.top_k(all_v, min(n, all_v.shape[0]))
        return jnp.take(all_i, out_pos)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=P(), check_vma=False))


def sharded_topn(mesh, keys: np.ndarray, n: int, asc: bool = True
                 ) -> np.ndarray:
    """Distributed ORDER BY <key> LIMIT n over a row-sharded key column:
    per-shard top-n, all_gather of (key, global row id), final n-select —
    the reference's ordered merge exchange (exchange_sorting.rs).

    Returns the global row ids of the top n rows in sort order.
    NaN/NULL keys should be pre-filtered or mapped to +/-inf by the caller.
    """
    ids = np.arange(keys.shape[0], dtype=np.int32)
    fill = np.inf if asc else -np.inf
    keys_dev, _ = shard_rows_padded(mesh, keys.astype(np.float32), fill=fill)
    ids_dev, _ = shard_rows_padded(mesh, ids, fill=-1)
    out = np.asarray(_topn_program(mesh, int(n), bool(asc))(keys_dev, ids_dev))
    return out[out >= 0][:n]


# ------------------------------------------------------- broadcast join

@functools.lru_cache(maxsize=64)
def _broadcast_lookup_program(mesh):
    def local(probe_codes, build_sorted, build_perm):
        pos = jnp.searchsorted(build_sorted, probe_codes)
        pos = jnp.clip(pos, 0, build_sorted.shape[0] - 1)
        hit = build_sorted[pos] == probe_codes
        return jnp.where(hit & (probe_codes >= 0), build_perm[pos], -1)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(), P()),
        out_specs=P(SHARD_AXIS), check_vma=False))


def broadcast_lookup_join(mesh, probe_codes: np.ndarray,
                          build_codes: np.ndarray) -> np.ndarray:
    """Broadcast (Expansive) exchange join for unique-key build sides:
    the build side's key codes replicate to every shard; each shard binary-
    searches its probe rows. Returns per-probe-row build row index or -1.

    ``probe_codes``/``build_codes`` are dense global codes from a shared
    factorization (negative = NULL, never matches). Build keys must be
    unique (the PK/dimension-table case the reference broadcasts too).
    """
    order = np.argsort(build_codes, kind="stable").astype(np.int32)
    build_sorted = build_codes[order].astype(np.int64)
    probe_dev, n = shard_rows_padded(
        mesh, probe_codes.astype(np.int64), fill=-1)
    bs = put_sharded(build_sorted, mesh, P())
    bp = put_sharded(order, mesh, P())
    out = np.asarray(_broadcast_lookup_program(mesh)(probe_dev, bs, bp))
    return out[:n]


# ------------------------------------------------------- shuffle exchange

@functools.lru_cache(maxsize=64)
def _shuffle_program(mesh, capacity: int, n_cols: int):
    """all_to_all repartition: each shard sorts its rows into per-
    destination buckets of fixed ``capacity`` and exchanges bucket i with
    shard i. Rows beyond capacity are the caller's responsibility (the
    host picks capacity = global max bucket size)."""
    s = mesh.shape[SHARD_AXIS]

    def local(dest, vals):
        # stable sort rows by destination shard
        order = jnp.argsort(dest, stable=True)
        dest_s = dest[order]
        vals_s = vals[order]
        # position of each row within its destination run
        start = jnp.searchsorted(dest_s, jnp.arange(s))
        within = jnp.arange(dest_s.shape[0]) - start[jnp.clip(dest_s, 0, s - 1)]
        # scatter into [s, capacity, n_cols] send buffer (+validity);
        # invalid rows aim past the buffer and are dropped (mode="drop" —
        # writing them to a clamped slot would clobber a real row)
        buf = jnp.zeros((s, capacity, n_cols), vals.dtype)
        ok = (dest_s >= 0) & (within < capacity)
        d_idx = jnp.where(ok, dest_s, s)
        w_idx = jnp.where(ok, within, 0)
        buf = buf.at[d_idx, w_idx].set(vals_s, mode="drop")
        valid = jnp.zeros((s, capacity), jnp.bool_)
        valid = valid.at[d_idx, w_idx].set(True, mode="drop")
        # the shuffle: bucket i of every shard lands on shard i
        recv = jax.lax.all_to_all(buf, SHARD_AXIS, split_axis=0,
                                  concat_axis=0, tiled=True)
        recv_valid = jax.lax.all_to_all(valid, SHARD_AXIS, split_axis=0,
                                        concat_axis=0, tiled=True)
        # replicate outputs (trailing all_gather): on a multi-process
        # DCN mesh a sharded result is non-addressable from the host
        out = jax.lax.all_gather(recv.reshape(-1, n_cols), SHARD_AXIS,
                                 tiled=True)
        out_valid = jax.lax.all_gather(recv_valid.reshape(-1), SHARD_AXIS,
                                       tiled=True)
        return out, out_valid

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=(P(None, None), P(None)), check_vma=False))


def _shuffle_capacity(dest_padded: np.ndarray, s: int) -> int:
    """Worst-case rows one shard sends to one destination, vectorized
    over the whole padded dest array (no per-shard host loop)."""
    per_shard = dest_padded.shape[0] // s
    src = np.arange(dest_padded.shape[0]) // per_shard
    valid = dest_padded >= 0
    if not valid.any():
        return 1
    counts = np.bincount(src[valid] * s + dest_padded[valid],
                         minlength=s * s)
    return max(int(counts.max()), 1)


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def shuffle_by_key(mesh, key_codes: np.ndarray, values: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shuffle (Normal/hash) exchange: repartition rows so equal key codes
    land on the same shard — the prerequisite for large-large shuffle
    joins and shuffle aggregation (reference fragmenter.rs:209 hash
    shuffle, servers/flight .. exchange_transform_shuffle.rs).

    Returns (key_codes', values', shard_of_row') as host arrays — the
    co-partitioned rows gathered back with their owning shard id, so the
    caller can verify placement or run per-shard logic next.
    """
    s = mesh.shape[SHARD_AXIS]
    dest = np.where(key_codes >= 0, key_codes % s, -1).astype(np.int32)
    cols = np.column_stack([key_codes.astype(np.float64),
                            np.ascontiguousarray(values, np.float64)])
    dest_dev, n = shard_rows_padded(mesh, dest, fill=-1)
    vals_dev, _ = shard_rows_padded(mesh, cols)
    # capacity from the HOST padded copy: the device array spans
    # non-addressable shards on a multi-process (DCN) mesh
    capacity = _shuffle_capacity(pad_rows(dest, s, fill=-1)[0], s)
    recv, valid = _shuffle_program(mesh, capacity, cols.shape[1])(
        dest_dev, vals_dev)
    recv = np.asarray(recv)
    valid = np.asarray(valid)
    shard_of = np.repeat(np.arange(s), recv.shape[0] // s)
    keys_out = recv[valid, 0].astype(np.int64)
    vals_out = recv[valid, 1:]
    return keys_out, vals_out, shard_of[valid]


# ------------------------------------------- shuffle grouped aggregation

@functools.lru_cache(maxsize=64)
def _shuffle_agg_program(mesh, capacity: int, groups_per_shard: int,
                         ops: Tuple[str, ...]):
    """One device program = the whole shuffle-aggregate fragment: rows
    all_to_all-shuffled by ``gid % s`` so each group lands wholly on its
    owner shard, then a per-shard segment reduce over the owner-local
    group range. Unlike the psum merge (``_grouped_agg_program``) no
    shard ever materializes the dense global [G] state — communication
    is the row data, which wins when G is large (the reference's
    FragmentKind::Normal hash shuffle for high-cardinality GROUP BY,
    fragmenter.rs:209-266)."""
    s = mesh.shape[SHARD_AXIS]
    m = len(ops)

    def local(gids, vals):
        dest = jnp.where(gids >= 0, gids % s, s)
        order = jnp.argsort(dest, stable=True)
        dest_s = jnp.clip(dest[order], 0, s - 1)
        gid_s = gids[order]
        vals_s = vals[order]
        start = jnp.searchsorted(dest_s, jnp.arange(s))
        within = jnp.arange(dest_s.shape[0]) - start[dest_s]
        ok = (gid_s >= 0) & (within < capacity)
        d_idx = jnp.where(ok, dest_s, s)   # invalid rows: dropped OOB
        w_idx = jnp.where(ok, within, 0)
        gbuf = jnp.full((s, capacity), -1, jnp.int32)
        gbuf = gbuf.at[d_idx, w_idx].set(gid_s, mode="drop")
        vbuf = jnp.zeros((s, capacity, vals.shape[1]), vals.dtype)
        vbuf = vbuf.at[d_idx, w_idx].set(vals_s, mode="drop")
        rg = jax.lax.all_to_all(gbuf, SHARD_AXIS, split_axis=0,
                                concat_axis=0, tiled=True).reshape(-1)
        rv = jax.lax.all_to_all(vbuf, SHARD_AXIS, split_axis=0,
                                concat_axis=0, tiled=True).reshape(-1, vals.shape[1])
        valid = rg >= 0
        g_local = jnp.where(valid, rg // s, groups_per_shard)
        nseg = groups_per_shard + 1  # +1 = padding bucket, sliced off
        outs = []
        for j, op in enumerate(ops):
            v = rv[:, j]
            if op == "count":
                part = jax.ops.segment_sum(valid.astype(v.dtype), g_local,
                                           num_segments=nseg)
            elif op == "sum":
                part = jax.ops.segment_sum(jnp.where(valid, v, 0), g_local,
                                           num_segments=nseg)
            elif op == "min":
                part = jax.ops.segment_min(jnp.where(valid, v, jnp.inf),
                                           g_local, num_segments=nseg)
            elif op == "max":
                part = jax.ops.segment_max(jnp.where(valid, v, -jnp.inf),
                                           g_local, num_segments=nseg)
            else:
                raise ValueError(op)
            outs.append(part[:groups_per_shard])
        return jnp.stack(outs, axis=1)  # [groups_per_shard, m]

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=P(SHARD_AXIS, None), check_vma=False))


def sharded_shuffle_grouped_agg(mesh, gids: np.ndarray, values: np.ndarray,
                                n_groups: int, ops: Sequence[str]
                                ) -> Optional[np.ndarray]:
    """High-cardinality distributed GROUP BY via the shuffle exchange.

    Returns the merged [n_groups, len(ops)] array (group order = gid), or
    None under pathological skew (one destination would receive most of
    the data — the psum/host paths handle that better).
    """
    s = mesh.shape[SHARD_AXIS]
    gids32 = gids.astype(np.int32)
    gids_dev, _ = shard_rows_padded(mesh, gids32, fill=-1)
    vals_dev, _ = shard_rows_padded(
        mesh, np.ascontiguousarray(values, np.float32))
    padded = np.asarray(gids_dev)
    dest = np.where(padded >= 0, padded % s, -1).astype(np.int32)
    capacity = _next_pow2(_shuffle_capacity(dest, s))
    per_shard = padded.shape[0] // s
    if capacity > max(4 * per_shard // s, 1024):
        return None  # skew guard: send buffers would blow past ~4x input
    gps = _next_pow2((int(n_groups) + s - 1) // s)
    out = np.asarray(_shuffle_agg_program(mesh, capacity, gps, tuple(ops))(
        gids_dev, vals_dev))  # [s * gps, m]
    gid_range = np.arange(int(n_groups), dtype=np.int64)
    perm = (gid_range % s) * gps + gid_range // s
    return out[perm]


# ----------------------------------------------------- shuffle hash join

@functools.lru_cache(maxsize=64)
def _shuffle_probe_program(mesh, capacity: int, build_cap: int):
    """Probe side of the shuffle join: probe (code, id) rows are
    all_to_all-shuffled to their owner shard (code % s), which binary-
    searches its sorted build-code run for the match range. Generalizes
    the broadcast lookup past unique build keys: the output is a
    [lo, count) range per probe row into the owner shard's sorted build
    order (reference exchange_transform_shuffle.rs + hash join probe)."""
    s = mesh.shape[SHARD_AXIS]

    def local(codes, ids, build_sorted):
        dest = jnp.where(codes >= 0, codes % s, s)
        order = jnp.argsort(dest, stable=True)
        dest_s = jnp.clip(dest[order], 0, s - 1)
        code_s = codes[order]
        id_s = ids[order]
        start = jnp.searchsorted(dest_s, jnp.arange(s))
        within = jnp.arange(dest_s.shape[0]) - start[dest_s]
        ok = (code_s >= 0) & (within < capacity)
        d_idx = jnp.where(ok, dest_s, s)   # invalid rows: dropped OOB
        w_idx = jnp.where(ok, within, 0)
        cbuf = jnp.full((s, capacity), -1, jnp.int32)
        cbuf = cbuf.at[d_idx, w_idx].set(code_s, mode="drop")
        ibuf = jnp.full((s, capacity), -1, jnp.int32)
        ibuf = ibuf.at[d_idx, w_idx].set(id_s, mode="drop")
        rc = jax.lax.all_to_all(cbuf, SHARD_AXIS, split_axis=0,
                                concat_axis=0, tiled=True).reshape(-1)
        ri = jax.lax.all_to_all(ibuf, SHARD_AXIS, split_axis=0,
                                concat_axis=0, tiled=True).reshape(-1)
        lo = jnp.searchsorted(build_sorted, rc, side="left")
        hi = jnp.searchsorted(build_sorted, rc, side="right")
        valid = ri >= 0
        cnt = jnp.where(valid, hi - lo, 0).astype(jnp.int32)
        # replicate (DCN meshes: sharded results are non-addressable)
        return (jax.lax.all_gather(ri, SHARD_AXIS, tiled=True),
                jax.lax.all_gather(lo.astype(jnp.int32), SHARD_AXIS,
                                   tiled=True),
                jax.lax.all_gather(cnt, SHARD_AXIS, tiled=True))

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(None), P(None), P(None)),
        check_vma=False))


class ShuffleJoin:
    """Shuffle (Normal) exchange hash join for non-unique build keys.

    Build once: the build side's key codes are hash-partitioned by
    ``code % s`` and each shard's run is sorted on the host (a one-time
    C-speed lexsort); the sorted code runs live on the mesh as the
    device-resident build state. Probe per block: the device program
    shuffles probe rows to their owner shard and returns match ranges;
    the host expands ranges into (probe_row, build_row) pairs with one
    np.repeat (output materialization is host-side anyway).
    """

    def __init__(self, mesh, build_codes: np.ndarray):
        # codes must be DENSE int32-range factorization codes (negative =
        # NULL): with x64 disabled jax would silently truncate int64
        self.mesh = mesh
        s = mesh.shape[SHARD_AXIS]
        self.s = s
        build_codes = build_codes.astype(np.int32)
        dest = np.where(build_codes >= 0, build_codes % s, -1)
        order = np.lexsort((build_codes, dest))
        order = order[dest[order] >= 0]  # NULL keys never match
        codes_s = build_codes[order]
        dest_s = dest[order]
        counts = np.bincount(dest_s, minlength=s)
        self.build_cap = _next_pow2(max(int(counts.max()), 1))
        # per-shard sorted code runs, padded with int32 max (never matches)
        sentinel = np.iinfo(np.int32).max
        codes_pad = np.full((s, self.build_cap), sentinel, np.int32)
        ids_pad = np.full((s, self.build_cap), -1, np.int64)
        offs = np.concatenate([[0], np.cumsum(counts)])
        for sh in range(s):
            run = slice(offs[sh], offs[sh + 1])
            k = counts[sh]
            codes_pad[sh, :k] = codes_s[run]
            ids_pad[sh, :k] = order[run]
        self.build_ids = ids_pad            # host: for range expansion
        self.build_dev = put_sharded(
            codes_pad.reshape(-1), mesh, P(SHARD_AXIS))

    def probe(self, probe_codes: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (lidx, ridx) pairs sorted by (probe row, build row)."""
        s = self.s
        codes = probe_codes.astype(np.int32)
        ids = np.arange(len(codes), dtype=np.int32)
        codes_dev, _ = shard_rows_padded(self.mesh, codes, fill=-1)
        ids_dev, _ = shard_rows_padded(self.mesh, ids, fill=-1)
        # capacity from the HOST padded copy (DCN: device array spans
        # non-addressable shards)
        padded = pad_rows(codes, s, fill=-1)[0]
        dest = np.where(padded >= 0, padded % s, -1).astype(np.int32)
        capacity = _next_pow2(_shuffle_capacity(dest, s))
        ri, lo, cnt = _shuffle_probe_program(
            self.mesh, capacity, self.build_cap)(
                codes_dev, ids_dev, self.build_dev)
        ri = np.asarray(ri)
        lo = np.asarray(lo)
        cnt = np.asarray(cnt)
        rows_per_shard = ri.shape[0] // s
        shard_of = np.arange(ri.shape[0]) // rows_per_shard
        hit = cnt > 0
        if not hit.any():
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        h_ids = ri[hit]
        h_lo = lo[hit].astype(np.int64)
        h_cnt = cnt[hit].astype(np.int64)
        h_sh = shard_of[hit]
        # expand [lo, lo+cnt) ranges: repeat + intra-range offsets
        lidx = np.repeat(h_ids, h_cnt).astype(np.int64)
        base = np.repeat(h_lo + h_sh * self.build_cap, h_cnt)
        ends = np.cumsum(h_cnt)
        offsets = np.arange(ends[-1]) - np.repeat(ends - h_cnt, h_cnt)
        ridx = self.build_ids.reshape(-1)[base + offsets]
        order = np.lexsort((ridx, lidx))
        return lidx[order], ridx[order]


# ------------------------------------------- range-partition (sample) sort

@functools.lru_cache(maxsize=64)
def _range_sort_program(mesh, capacity: int):
    """Range-partition sort exchange (reference: distributed sort WITHOUT
    a limit — fragmenter.rs exchange on sort keys + per-node merge sort).
    Rows are routed to the shard owning their key range (all_to_all),
    then each shard sorts its received rows on device; because shard i's
    key range precedes shard i+1's, concatenating shard outputs in shard
    order IS the total order."""
    s = mesh.shape[SHARD_AXIS]

    def local(dest, vals):  # vals [rows, 2] = (key, row_id)
        order = jnp.argsort(dest, stable=True)
        dest_s = dest[order]
        vals_s = vals[order]
        start = jnp.searchsorted(dest_s, jnp.arange(s))
        within = jnp.arange(dest_s.shape[0]) - start[jnp.clip(dest_s, 0, s - 1)]
        buf = jnp.zeros((s, capacity, 2), vals.dtype)
        ok = (dest_s >= 0) & (within < capacity)
        d_idx = jnp.where(ok, dest_s, s)
        w_idx = jnp.where(ok, within, 0)
        buf = buf.at[d_idx, w_idx].set(vals_s, mode="drop")
        valid = jnp.zeros((s, capacity), jnp.bool_)
        valid = valid.at[d_idx, w_idx].set(True, mode="drop")
        recv = jax.lax.all_to_all(buf, SHARD_AXIS, split_axis=0,
                                  concat_axis=0, tiled=True).reshape(-1, 2)
        rvalid = jax.lax.all_to_all(valid, SHARD_AXIS, split_axis=0,
                                    concat_axis=0, tiled=True).reshape(-1)
        # local device sort; invalid (padding) rows sink to the tail
        key = jnp.where(rvalid, recv[:, 0], jnp.inf)
        o = jnp.argsort(key)
        # ordered concat across shards = total order; replicate it (DCN
        # meshes: sharded results are non-addressable from the host)
        return (jax.lax.all_gather(recv[o], SHARD_AXIS, tiled=True),
                jax.lax.all_gather(rvalid[o], SHARD_AXIS, tiled=True))

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=(P(None, None), P(None)), check_vma=False))


def range_partition_sort(mesh, keys: np.ndarray) -> np.ndarray:
    """Distributed full sort (no limit): sample ~4k keys for splitters,
    route every row to its key-range shard, per-shard device sort,
    ordered concat across shards. ``keys`` must be exact in f32 — callers
    rank-compress arbitrary sort keys first (same contract as
    sharded_topn). Returns row ids in global ascending-key order."""
    s = mesh.shape[SHARD_AXIS]
    n = keys.shape[0]
    k = np.ascontiguousarray(keys, np.float32)
    if n > 4096:
        rng = np.random.default_rng(0)
        sample = k[rng.integers(0, n, 4096)]
    else:
        sample = k
    splitters = np.quantile(sample, np.arange(1, s) / s).astype(np.float32)
    dest = np.searchsorted(splitters, k, side="right").astype(np.int32)
    cols = np.column_stack([k, np.arange(n, dtype=np.float32)])
    dest_dev, _ = shard_rows_padded(mesh, dest, fill=-1)
    vals_dev, _ = shard_rows_padded(mesh, cols.astype(np.float32))
    # host-side capacity (device array is non-addressable on DCN meshes)
    capacity = _next_pow2(_shuffle_capacity(pad_rows(dest, s, fill=-1)[0], s))
    recv, valid = _range_sort_program(mesh, capacity)(dest_dev, vals_dev)
    recv = np.asarray(recv)
    valid = np.asarray(valid)
    return recv[valid, 1].astype(np.int64)
