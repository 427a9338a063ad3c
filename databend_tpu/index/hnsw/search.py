"""Query-batched HNSW beam search as one jitted XLA program.

The reference searches one query at a time with a binary-heap candidate
queue and a reusable visited list (reference: graph_layers.rs:73-248,
search_context.rs:30-61, visited_pool.rs:26-60). On TPU that whole design
is re-expressed as fixed-shape tensor ops amortized over a query batch
(SURVEY §7 hard part (a)):

* the ef candidate queue  -> sorted [B, ef] (distance, id, expanded) arrays,
  merged with each expansion's neighbors via one top_k;
* the visited list        -> a [B, n] boolean mask updated with scatter-max;
* the best-first loop     -> lax.while_loop with a per-query done flag
  (classic termination: closest unexpanded candidate is worse than the
  worst retained candidate);
* upper-layer descent     -> greedy beam-1, also batched, also while_loop;
* distance evaluation     -> gather neighbors' vectors + batched dot/l2 on
  VPU/MXU (replaces the C u8 scorers, cpp/avx2.c:42).

ef defaults to 4*k like the reference (hnsw.rs:108).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.distance import normalize
from .graph import HnswGraph

INF = jnp.float32(jnp.inf)


def _batch_dist(q: jax.Array, vecs: jax.Array, metric: str) -> jax.Array:
    """q [B, d] x vecs [B, M, d] -> [B, M] distances (per-row)."""
    if metric == "ip":
        return -jnp.einsum("bd,bmd->bm", q, vecs, preferred_element_type=jnp.float32)
    if metric == "l1":
        return jnp.sum(jnp.abs(vecs.astype(jnp.float32) - q[:, None, :].astype(jnp.float32)), -1)
    diff = vecs.astype(jnp.float32) - q[:, None, :].astype(jnp.float32)
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))


@functools.partial(jax.jit, static_argnames=("metric", "max_steps"))
def _greedy_descent(x, links, level_pos, q, entry, metric, max_steps=64):
    """Beam-1 greedy walk on one upper level (reference search_entry,
    graph_layers.rs:132). links: [n_l, m] global ids; level_pos: [n]
    global->slot map (-1 if absent). Returns improved entry ids [B]."""
    b = q.shape[0]
    d0 = _batch_dist(q, x[entry][:, None, :], metric)[:, 0]

    def cond(state):
        cur, cur_d, improved, steps = state
        return jnp.logical_and(jnp.any(improved), steps < max_steps)

    def body(state):
        cur, cur_d, improved, steps = state
        slots = level_pos[cur]  # [B]
        nbrs = links[jnp.maximum(slots, 0)]  # [B, m]
        valid = (nbrs >= 0) & (slots >= 0)[:, None]
        vecs = x[jnp.maximum(nbrs, 0)]
        nd = jnp.where(valid, _batch_dist(q, vecs, metric), INF)
        best = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, best[:, None], axis=1)[:, 0]
        better = best_d < cur_d
        new_cur = jnp.where(better, jnp.take_along_axis(nbrs, best[:, None], axis=1)[:, 0], cur)
        new_d = jnp.where(better, best_d, cur_d)
        return new_cur, new_d, better, steps + 1

    cur, cur_d, _, _ = jax.lax.while_loop(
        cond, body, (entry, d0, jnp.ones(b, dtype=bool), jnp.int32(0)))
    return cur, cur_d


@functools.partial(jax.jit, static_argnames=("ef", "k", "metric", "max_steps"))
def _search_level0(x, links0, q, entry_ids, ef: int, k: int, metric: str,
                   max_steps: int):
    """ef-bounded best-first search on level 0 (reference _search_on_level,
    graph_layers.rs:73), batched over queries."""
    b = q.shape[0]
    n, m0 = links0.shape

    e = entry_ids.shape[1]  # seeded entries per query
    ef = max(ef, e)  # tiny blocks: never fewer candidate slots than seeds
    seed_d = _batch_dist(q, x[entry_ids], metric)  # [B, e]
    # dedupe identical seeds
    dup = (entry_ids[:, :, None] == entry_ids[:, None, :]) & (
        jnp.arange(e)[None, None, :] < jnp.arange(e)[None, :, None])
    seed_d = jnp.where(jnp.any(dup, axis=2), INF, seed_d)

    pad = ef - e
    cand_d = jnp.concatenate([seed_d, jnp.full((b, pad), INF)], axis=1)
    cand_i = jnp.concatenate([entry_ids, jnp.full((b, pad), -1, jnp.int32)], axis=1)
    order = jnp.argsort(cand_d, axis=1)
    cand_d = jnp.take_along_axis(cand_d, order, axis=1)
    cand_i = jnp.take_along_axis(cand_i, order, axis=1)
    expanded = cand_i < 0  # padding counts as expanded

    visited = jnp.zeros((b, n), dtype=bool)
    rows = jnp.arange(b, dtype=jnp.int32)
    visited = visited.at[rows[:, None], jnp.maximum(entry_ids, 0)].set(True)

    def cond(state):
        cand_d, cand_i, expanded, visited, steps = state
        frontier = jnp.where(expanded, INF, cand_d)
        best_unexp = jnp.min(frontier, axis=1)
        # stop when every query's closest unexpanded is worse than its
        # worst retained candidate (or queue exhausted)
        active = best_unexp <= cand_d[:, -1]
        return jnp.logical_and(jnp.any(active), steps < max_steps)

    def body(state):
        cand_d, cand_i, expanded, visited, steps = state
        frontier = jnp.where(expanded, INF, cand_d)
        idx = jnp.argmin(frontier, axis=1)  # [B] position of closest unexpanded
        has_work = jnp.take_along_axis(frontier, idx[:, None], axis=1)[:, 0] < INF
        expanded = expanded.at[rows, idx].set(True)

        cur = jnp.take_along_axis(cand_i, idx[:, None], axis=1)[:, 0]  # [B]
        nbrs = links0[jnp.maximum(cur, 0)]  # [B, m0]
        safe = jnp.maximum(nbrs, 0)
        seen = jnp.take_along_axis(visited, safe, axis=1)
        fresh = (nbrs >= 0) & (~seen) & has_work[:, None]
        visited = visited.at[rows[:, None], safe].max(fresh)

        nd = jnp.where(fresh, _batch_dist(q, x[safe], metric), INF)
        # fold new candidates into the queue: concat + k-smallest
        all_d = jnp.concatenate([cand_d, nd], axis=1)
        all_i = jnp.concatenate([cand_i, jnp.where(fresh, nbrs, -1)], axis=1)
        all_e = jnp.concatenate([expanded, jnp.ones_like(nd, dtype=bool) * (nd >= INF)], axis=1)
        vals, pos = jax.lax.top_k(-all_d, ef)
        cand_d = -vals
        cand_i = jnp.take_along_axis(all_i, pos, axis=1)
        expanded = jnp.take_along_axis(all_e, pos, axis=1)
        return cand_d, cand_i, expanded, visited, steps + 1

    cand_d, cand_i, expanded, visited, _ = jax.lax.while_loop(
        cond, body, (cand_d, cand_i, expanded, visited, jnp.int32(0)))
    return cand_d[:, :k], cand_i[:, :k]


def hnsw_search(graph: HnswGraph, x_dev, q: np.ndarray, k: int,
                ef: Optional[int] = None,
                max_steps: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Search a block's HNSW graph for a batch of queries.

    x_dev: the block's [n, d] vector column on device (pre-normalized by the
    caller when graph.metric == 'cosine'). Returns (distances [B, k],
    ids [B, k]) in the graph's *internal* ordering convention: cosine
    returns dot-ordering distances (negated dot) — callers postprocess via
    :func:`postprocess_scores` (reference hnsw.rs:317-339).
    """
    n = graph.num_points
    ef = ef or max(4 * k, k)  # reference: ef = limit * 4 (hnsw.rs:108)
    ef = min(max(ef, k), max(n, 1))
    metric = "ip" if graph.metric == "cosine" else graph.metric
    qd = jnp.asarray(np.ascontiguousarray(q, np.float32))
    if graph.metric == "cosine":
        qd = normalize(qd)

    b = qd.shape[0]
    entry = jnp.broadcast_to(jnp.asarray(graph.entry_points[:1], jnp.int32), (b,))
    # descend upper levels (top -> 1)
    for l in range(graph.num_levels - 1, 0, -1):
        level_pos = np.full(n, -1, np.int32)
        level_pos[graph.level_ids[l]] = np.arange(len(graph.level_ids[l]), dtype=np.int32)
        entry, _ = _greedy_descent(x_dev, jnp.asarray(graph.links[l]),
                                   jnp.asarray(level_pos), qd, entry, metric)

    # seed level-0 queue with the descended entry + global entry points
    seeds = [entry[:, None]]
    for epid in graph.entry_points[:2]:
        seeds.append(jnp.full((b, 1), int(epid), jnp.int32))
    entry_ids = jnp.concatenate(seeds, axis=1)

    steps = max_steps or (2 * ef + 16)
    dists, ids = _search_level0(x_dev, jnp.asarray(graph.links[0]), qd,
                                entry_ids, ef, min(k, ef), metric, steps)
    import jax
    return jax.device_get((dists, ids))  # one fetch: each get costs a full RTT


def postprocess_scores(dists: np.ndarray, metric: str) -> np.ndarray:
    """Map internal search distances to SQL distance-function values
    (reference hnsw.rs:317-339): cosine -> 1 + negated-dot, others identity."""
    if metric == "cosine":
        return 1.0 + dists  # internal = -dot(normalized)
    return dists
