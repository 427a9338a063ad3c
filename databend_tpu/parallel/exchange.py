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

from .mesh import DP_AXIS, SHARD_AXIS, corpus_sharding, make_mesh, replicated

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
    return jax.device_put(padded, NamedSharding(mesh, spec)), n


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
    bs = jax.device_put(build_sorted, replicated(mesh))
    bp = jax.device_put(order, replicated(mesh))
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
        # scatter into [s, capacity, n_cols] send buffer (+validity)
        buf = jnp.zeros((s, capacity, n_cols), vals.dtype)
        ok = (dest_s >= 0) & (within < capacity)
        d_idx = jnp.where(ok, dest_s, 0)
        w_idx = jnp.where(ok, within, 0)
        buf = buf.at[d_idx, w_idx].set(
            jnp.where(ok[:, None], vals_s, 0.0))
        valid = jnp.zeros((s, capacity), jnp.bool_)
        valid = valid.at[d_idx, w_idx].set(ok)
        # the shuffle: bucket i of every shard lands on shard i
        recv = jax.lax.all_to_all(buf, SHARD_AXIS, split_axis=0,
                                  concat_axis=0, tiled=True)
        recv_valid = jax.lax.all_to_all(valid, SHARD_AXIS, split_axis=0,
                                        concat_axis=0, tiled=True)
        return recv.reshape(-1, n_cols), recv_valid.reshape(-1)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS, None)),
        out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS)), check_vma=False))


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
    # capacity: worst-case rows one shard sends to one destination
    per_shard = dest_dev.shape[0] // s
    counts = np.zeros((s, s), np.int64)
    dpad = np.asarray(dest_dev)
    for src in range(s):
        seg = dpad[src * per_shard:(src + 1) * per_shard]
        seg = seg[seg >= 0]
        if len(seg):
            counts[src] = np.bincount(seg, minlength=s)
    capacity = max(int(counts.max()), 1)
    recv, valid = _shuffle_program(mesh, capacity, cols.shape[1])(
        dest_dev, vals_dev)
    recv = np.asarray(recv)
    valid = np.asarray(valid)
    shard_of = np.repeat(np.arange(s), recv.shape[0] // s)
    keys_out = recv[valid, 0].astype(np.int64)
    vals_out = recv[valid, 1:]
    return keys_out, vals_out, shard_of[valid]
