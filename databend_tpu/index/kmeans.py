"""K-means vector clustering for CLUSTER BY (vector_col).

Reference semantics (src/query/storages/common/index/src/kmeans.rs:42-277 +
src/query/storages/fuse/src/operations/common/processors/
transform_vector_cluster.rs:29-211): deterministic seeding, batches capped
at 64 clusters / 262,144 rows, rows re-sorted by (cluster_id, distance to
own centroid) before block split so per-block centroid/radius stats are
tight and the vector stats pruner can drop most blocks.

TPU-native design: Lloyd's iteration IS a distance-matmul + argmin + a
one-hot matmul for the (sum, count) reduction — all MXU work, jitted once
with static (n, k, d). Determinism comes from an LCG-seeded initial
centroid choice, mirroring the reference's LCG sampling (kmeans.rs:94).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_CLUSTERS = 64          # reference: TransformVectorCluster batches
MAX_BATCH_ROWS = 262_144   # 64 clusters / <=262,144 rows


def _lcg_indices(n: int, k: int, seed: int = 0x2545F491) -> np.ndarray:
    """Deterministic distinct sample of k row indices (LCG like the
    reference's choose_initial_centroids, kmeans.rs:94-118)."""
    out = []
    seen = set()
    state = seed & 0xFFFFFFFF
    while len(out) < min(k, n):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        idx = state % n
        if idx not in seen:
            seen.add(idx)
            out.append(idx)
    return np.asarray(out, dtype=np.int64)


@functools.partial(jax.jit, static_argnames=("iters",))
def _lloyd(x: jax.Array, init: jax.Array, iters: int = 10):
    """iters rounds of Lloyd's on device. x [n,d] f32, init [k,d] f32.
    Returns (centroids [k,d], assignments [n], dist_to_own [n])."""
    n, d = x.shape
    k = init.shape[0]
    xx = jnp.sum(x * x, axis=1)  # [n]

    def dist2(cent):
        cc = jnp.sum(cent * cent, axis=1)
        xc = jax.lax.dot_general(x, cent, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return jnp.maximum(xx[:, None] - 2.0 * xc + cc[None, :], 0.0)  # [n,k]

    def body(cent, _):
        d2 = dist2(cent)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [n,k]
        sums = jax.lax.dot_general(onehot, x, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        cnt = jnp.sum(onehot, axis=0)
        new = jnp.where(cnt[:, None] > 0, sums / jnp.maximum(cnt[:, None], 1.0), cent)
        return new, None

    cent, _ = jax.lax.scan(body, init, None, length=iters)
    d2 = dist2(cent)
    assign = jnp.argmin(d2, axis=1)
    own = jnp.sqrt(jnp.take_along_axis(d2, assign[:, None], axis=1)[:, 0])
    return cent, assign, own


class KMeans:
    """Deterministic k-means (the reference's KMeans facade, kmeans.rs:42)."""

    def __init__(self, k: int, iters: int = 10):
        self.k = min(k, MAX_CLUSTERS)
        self.iters = iters

    def compute(self, vectors: np.ndarray):
        """Returns (centroids [k,d] f32, assignments [n] i64, dist [n] f32)."""
        x = np.ascontiguousarray(vectors, dtype=np.float32)
        n = x.shape[0]
        k = min(self.k, n)
        if n == 0:
            return (np.zeros((0, x.shape[1]), np.float32),
                    np.zeros(0, np.int64), np.zeros(0, np.float32))
        init = x[_lcg_indices(n, k)]
        cent, assign, own = _lloyd(jnp.asarray(x), jnp.asarray(init),
                                   iters=self.iters)
        cent, assign, own = jax.device_get((cent, assign, own))  # one RTT
        return cent, assign.astype(np.int64), own


def cluster_sort_order(vectors: np.ndarray, k: int = MAX_CLUSTERS,
                       iters: int = 10) -> np.ndarray:
    """Row permutation sorting by (cluster_id, distance-to-own-centroid) —
    the reference's pack_vector_cluster_sort_key ordering
    (transform_vector_cluster.rs:141-211). Batches of MAX_BATCH_ROWS are
    clustered independently, exactly like the streaming transform."""
    n = vectors.shape[0]
    order = np.empty(n, dtype=np.int64)
    pos = 0
    for start in range(0, n, MAX_BATCH_ROWS):
        end = min(start + MAX_BATCH_ROWS, n)
        batch = vectors[start:end]
        km = KMeans(min(k, max(1, len(batch))), iters)
        _, assign, own = km.compute(batch)
        perm = np.lexsort((own, assign)) + start
        order[pos:pos + len(perm)] = perm
        pos += len(perm)
    return order


def cluster_layout(vectors: np.ndarray, k: int = MAX_CLUSTERS,
                   iters: int = 10):
    """(row permutation, cluster run lengths) for cluster-ALIGNED block
    splitting: rows sort by (cluster, distance-to-centroid) with clusters
    ordered along their centroids' first principal axis, so adjacent
    clusters are spatially close and blocks packing several whole clusters
    keep tight centroid/radius stats (the routing prune's food —
    reference vector_stat_score_domain). Batched at MAX_BATCH_ROWS like
    the reference TransformVectorCluster."""
    n = vectors.shape[0]
    order = np.empty(n, dtype=np.int64)
    runs = []
    pos = 0
    for start in range(0, n, MAX_BATCH_ROWS):
        end = min(start + MAX_BATCH_ROWS, n)
        batch = np.ascontiguousarray(vectors[start:end], np.float32)
        km = KMeans(min(k, max(1, len(batch))), iters)
        cent, assign, own = km.compute(batch)
        kk = cent.shape[0]
        # order clusters by a nearest-neighbor centroid walk so adjacent
        # clusters are mutually CLOSE in the full space (a 1-D projection
        # scatters high-dim modes); packed blocks then union only nearby
        # cells and keep small radii
        if kk > 1:
            d2 = ((cent[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            np.fill_diagonal(d2, np.inf)
            visited = np.zeros(kk, np.bool_)
            walk = [0]
            visited[0] = True
            for _ in range(kk - 1):
                row = d2[walk[-1]].copy()
                row[visited] = np.inf
                nxt = int(np.argmin(row))
                walk.append(nxt)
                visited[nxt] = True
            rank = np.empty(kk, np.int64)
            rank[np.asarray(walk)] = np.arange(kk)
            cluster_key = rank[assign]
        else:
            cluster_key = assign
        perm = np.lexsort((own, cluster_key)) + start
        order[pos:pos + len(perm)] = perm
        pos += len(perm)
        counts = np.bincount(cluster_key, minlength=kk)
        runs.extend(int(c) for c in counts if c > 0)
    return order, runs
