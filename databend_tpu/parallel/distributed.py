"""Distributed query execution over a TPU mesh.

TPU-native equivalents of the reference's exchange kinds (reference:
schedulers/fragments/fragmenter.rs:238-266 — Normal/Merge/Expansive) and
distributed pruning (read_partitions.rs:263-290). Data-plane RPC (Arrow
Flight, exchange_manager.rs:168) is replaced by XLA collectives over ICI:

  * distributed top-k   = per-shard scan+score+select, then `all_gather`
    over the shard axis + one final k-select — the ordered MergeExchange +
    bounded-merge-sort of the reference (exchange_sorting.rs) as one
    collective program;
  * distributed aggregate = per-shard partial aggregate + `psum`;
  * k-means step        = per-shard assign + `psum` of (sum, count) — the
    training-style write-path step (transform_vector_cluster.rs) sharded.

All functions are `shard_map`-based and jit-compatible; corpus arrays are
row-sharded on mesh axis ``shard`` and query batches optionally on ``dp``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.distance import pairwise_distance
from ..ops.topk import chunked_topk_smallest, topk_smallest
from .mesh import DP_AXIS, SHARD_AXIS


@functools.lru_cache(maxsize=64)
def _sharded_topk_program(mesh, rows_per_shard: int, k: int, metric: str,
                          chunk_rows: int, bf16: bool):
    """Build + jit the shard_map program once per (mesh, config) — a fresh
    closure per call would re-trace/re-compile every invocation."""
    cd = jnp.bfloat16 if bf16 else jnp.float32

    def local(q_l, x_l, n_valid):
        shard_idx = jax.lax.axis_index(SHARD_AXIS)
        base = (shard_idx * rows_per_shard).astype(jnp.int32)
        # pad rows (global id >= n_valid) are masked to +inf BEFORE the
        # local selection — no pad value is +inf-safe for every metric
        vals, ids = chunked_topk_smallest(
            q_l, x_l, min(k, rows_per_shard), metric,
            chunk_rows=min(chunk_rows, rows_per_shard), compute_dtype=cd,
            base_id=base, n_valid=n_valid)
        all_v = jax.lax.all_gather(vals, SHARD_AXIS)   # [S, B, k]
        all_i = jax.lax.all_gather(ids, SHARD_AXIS)
        b = q_l.shape[0]
        cat_v = jnp.transpose(all_v, (1, 0, 2)).reshape(b, -1)
        cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, -1)
        out_v, pos = jax.lax.top_k(-cat_v, k)
        return -out_v, jnp.take_along_axis(cat_i, pos, axis=1)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(SHARD_AXIS, None), P()),
        out_specs=(P(DP_AXIS, None), P(DP_AXIS, None)),
        check_vma=False))


def sharded_brute_force_topk(mesh, q: jax.Array, x: jax.Array, k: int,
                             metric: str = "l2",
                             chunk_rows: int = 131072,
                             bf16: bool = False,
                             n_valid: Optional[int] = None
                             ) -> Tuple[jax.Array, jax.Array]:
    """Exact distributed top-k: `[B,d]` queries x row-sharded `[N,d]` corpus.

    Each shard scores its rows on its own MXU and selects a local `[B,k]`
    with global row ids; shards then `all_gather` the `(dist, id)` pairs
    over ICI and every shard reduces to the global `[B,k]`. This is the
    reference's per-node pruning + ordered merge exchange path (SURVEY
    §3.3 distributed variant) as a single XLA program.

    ``q`` is dp-sharded over the query batch, replicated over ``shard``;
    returns (dists [B,k], ids [B,k]) with the same dp sharding.
    """
    n_total = x.shape[0]
    s = mesh.shape[SHARD_AXIS]
    rows_per_shard = n_total // s
    fn = _sharded_topk_program(mesh, rows_per_shard, k, metric, chunk_rows,
                               bf16)
    nv = jnp.int32(n_total if n_valid is None else n_valid)
    return fn(q, x, nv)


@functools.lru_cache(maxsize=64)
def _sharded_agg_program(mesh, op: str):
    def local(x_l):
        if op == "sum":
            part = jnp.sum(x_l, axis=0)
            return jax.lax.psum(part, SHARD_AXIS)
        if op == "max":
            return jax.lax.pmax(jnp.max(x_l, axis=0), SHARD_AXIS)
        if op == "min":
            return jax.lax.pmin(jnp.min(x_l, axis=0), SHARD_AXIS)
        if op == "count":
            return jax.lax.psum(jnp.asarray(x_l.shape[0], jnp.int32), SHARD_AXIS)
        raise ValueError(op)

    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P(SHARD_AXIS),),
                                 out_specs=P(), check_vma=False))


def sharded_partial_agg(mesh, x: jax.Array, op: str = "sum") -> jax.Array:
    """Distributed aggregate over a row-sharded column: per-shard partial +
    `psum`/`pmax`/`pmin` (the Merge aggregate exchange)."""
    return _sharded_agg_program(mesh, op)(x)


def sharded_kmeans_step(mesh, x: jax.Array, centroids: jax.Array,
                        metric: str = "l2_sq") -> Tuple[jax.Array, jax.Array]:
    """One distributed Lloyd's iteration over a row-sharded corpus.

    Per shard: distance-matmul to centroids + argmin assignment + one-hot
    partial (sum, count); cross-shard: `psum`. This is the write-path
    k-means clustering of the reference (kmeans.rs:94-120,
    transform_vector_cluster.rs:29-141) recast as an MXU + psum program —
    the database's "training step".

    Returns (new_centroids [C,d], counts [C]); empty clusters keep their
    old centroid.
    """
    return _sharded_kmeans_program(mesh, centroids.shape[0], metric)(
        x, centroids)


@functools.lru_cache(maxsize=64)
def _sharded_kmeans_program(mesh, c: int, metric: str):
    def local(x_l, cent):
        d = pairwise_distance(x_l, cent, metric)          # [n_l, C]
        assign = jnp.argmin(d, axis=1)                    # [n_l]
        onehot = jax.nn.one_hot(assign, c, dtype=jnp.float32)  # [n_l, C]
        psums = jax.lax.dot_general(
            onehot, x_l.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())))   # [C, d]
        pcnt = jnp.sum(onehot, axis=0)                    # [C]
        gsums = jax.lax.psum(psums, SHARD_AXIS)
        gcnt = jax.lax.psum(pcnt, SHARD_AXIS)
        new = jnp.where(gcnt[:, None] > 0, gsums / jnp.maximum(gcnt[:, None], 1.0), cent)
        return new, gcnt

    return jax.jit(jax.shard_map(local, mesh=mesh,
                                 in_specs=(P(SHARD_AXIS, None), P()),
                                 out_specs=(P(), P()), check_vma=False))


def sharded_search_step(mesh, q: jax.Array, x: jax.Array, centroids: jax.Array,
                        k: int, metric: str = "l2", bf16: bool = True):
    """The flagship multi-chip step: distributed exact top-k search fused
    with a distributed k-means maintenance step (scan + score + k-select +
    merge over ICI, plus the write-path clustering update). Exercises
    dp x shard sharding, all_gather and psum — the full collective surface
    of the serving + ingest paths."""
    dists, ids = sharded_brute_force_topk(mesh, q, x, k, metric, bf16=bf16)
    new_cent, counts = sharded_kmeans_step(mesh, x, centroids)
    return dists, ids, new_cent, counts
