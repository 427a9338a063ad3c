"""Batched vector distance kernels.

TPU-native replacement for the reference's three distance-kernel tiers —
naive ndarray math (src/common/vector/src/distance.rs:19-165), Rust SIMD
intrinsics (src/query/storages/common/index/src/vector.rs:45-135) and the
C AVX2/SSE/NEON scorers (src/query/storages/common/index/cpp/*.c). On TPU
all of them collapse into one design: distances are **batched matmuls on
the MXU** (`Q[b,d] @ X[n,d]^T`), with the L2 norm expansion turning
euclidean distance into a matmul too. L1 has no matmul form and runs on
the VPU in N-chunks to bound memory.

Conventions:
  * every kernel is `[B, d] x [N, d] -> [B, N]` (pairwise), jit-friendly,
    static shapes;
  * returned values are **distances** (smaller = closer). `inner_product`
    returns the raw dot product (matching the SQL function,
    src/query/functions/src/scalars/vector.rs); the search path uses
    metric "ip" = negated dot so one k-smallest selector serves all metrics;
  * `compute_dtype=bfloat16` runs the matmul in bf16 on the MXU (the fast
    path — pair with exact f32 re-ranking of the top candidates for
    recall parity), `float32` uses highest-precision f32 passes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

VALID_METRICS = ("cosine", "l2", "l2_sq", "l1", "ip")

_EPS = 1e-30


def _precision(compute_dtype):
    return jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2-normalize rows; zero vectors stay zero (cosine preprocessing —
    mirrors HNSWIndex's cosine->dot preprocessing, reference hnsw.rs:310)."""
    n = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=axis, keepdims=True))
    return (x / jnp.maximum(n, _EPS)).astype(x.dtype)


def _dot(q: jax.Array, x: jax.Array, compute_dtype) -> jax.Array:
    qc = q.astype(compute_dtype)
    xc = x.astype(compute_dtype)
    return jax.lax.dot_general(
        qc, xc,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(compute_dtype),
    )


def inner_product(q: jax.Array, x: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """Pairwise dot products `[B, N]` (SQL ``inner_product``)."""
    return _dot(q, x, compute_dtype)


def cosine_distance(q: jax.Array, x: jax.Array, compute_dtype=jnp.float32,
                    x_normalized: bool = False) -> jax.Array:
    """``1 - cos(q, x)`` pairwise (reference distance.rs:19-47)."""
    qn = normalize(q)
    xn = x if x_normalized else normalize(x)
    return 1.0 - _dot(qn, xn, compute_dtype)


def l2_distance_squared(q: jax.Array, x: jax.Array, compute_dtype=jnp.float32,
                        x_sq_norms: Optional[jax.Array] = None) -> jax.Array:
    """``||q - x||^2`` via the matmul expansion ``|q|^2 - 2 q.x + |x|^2``.

    ``x_sq_norms`` (precomputed ``[N]``) lets the scan path amortize the
    norm over queries. Clamped at 0 to absorb fp cancellation.
    """
    q32 = q.astype(jnp.float32)
    qq = jnp.sum(q32 * q32, axis=-1, keepdims=True)  # [B, 1]
    if x_sq_norms is None:
        x32 = x.astype(jnp.float32)
        x_sq_norms = jnp.sum(x32 * x32, axis=-1)  # [N]
    qx = _dot(q, x, compute_dtype)  # [B, N]
    return jnp.maximum(qq - 2.0 * qx + x_sq_norms[None, :], 0.0)


def l2_distance(q: jax.Array, x: jax.Array, compute_dtype=jnp.float32,
                x_sq_norms: Optional[jax.Array] = None) -> jax.Array:
    return jnp.sqrt(l2_distance_squared(q, x, compute_dtype, x_sq_norms))


def l1_distance(q: jax.Array, x: jax.Array, chunk: int = 1024) -> jax.Array:
    """Manhattan distance, VPU path (no matmul form).

    Scans X in chunks of ``chunk`` rows so peak memory is ``B*chunk*d``
    instead of ``B*N*d``. N must be divisible by chunk (callers pad);
    small N falls back to one broadcast.
    """
    b, d = q.shape
    n = x.shape[0]
    q32 = q.astype(jnp.float32)
    if n <= chunk or n % chunk != 0:
        return jnp.sum(jnp.abs(q32[:, None, :] - x.astype(jnp.float32)[None, :, :]), axis=-1)

    xc = x.reshape(n // chunk, chunk, d)

    def body(carry, xi):
        del carry
        di = jnp.sum(jnp.abs(q32[:, None, :] - xi.astype(jnp.float32)[None, :, :]), axis=-1)
        return None, di

    _, parts = jax.lax.scan(body, None, xc)  # [n/chunk, B, chunk]
    return jnp.transpose(parts, (1, 0, 2)).reshape(b, n)


def pairwise_distance(q: jax.Array, x: jax.Array, metric: str,
                      compute_dtype=jnp.float32,
                      x_sq_norms: Optional[jax.Array] = None,
                      x_normalized: bool = False) -> jax.Array:
    """Dispatch on metric name; returns `[B, N]` distances (smaller = closer)."""
    if metric == "cosine":
        return cosine_distance(q, x, compute_dtype, x_normalized=x_normalized)
    if metric == "l2":
        return l2_distance(q, x, compute_dtype, x_sq_norms)
    if metric == "l2_sq":
        return l2_distance_squared(q, x, compute_dtype, x_sq_norms)
    if metric == "l1":
        return l1_distance(q, x)
    if metric == "ip":
        return -_dot(q, x, compute_dtype)
    raise ValueError(f"unknown metric {metric!r}; expected one of {VALID_METRICS}")


# --------------------------------------------------------------------------
# Single-pair (row-wise) forms for the SQL scalar functions:
# cosine_distance(a, b) over two equal-length vector columns.
# --------------------------------------------------------------------------

def rowwise_distance(a: jax.Array, b: jax.Array, metric: str) -> jax.Array:
    """`[N, d] x [N, d] -> [N]` row-aligned distances (SQL scalar semantics,
    reference src/query/functions/src/scalars/vector.rs:57-455)."""
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    if metric == "cosine":
        num = jnp.sum(a32 * b32, axis=-1)
        den = jnp.sqrt(jnp.sum(a32 * a32, axis=-1) * jnp.sum(b32 * b32, axis=-1))
        return 1.0 - num / jnp.maximum(den, _EPS)
    if metric == "l2":
        return jnp.sqrt(jnp.sum((a32 - b32) ** 2, axis=-1))
    if metric == "l2_sq":
        return jnp.sum((a32 - b32) ** 2, axis=-1)
    if metric == "l1":
        return jnp.sum(jnp.abs(a32 - b32), axis=-1)
    if metric == "ip":
        return jnp.sum(a32 * b32, axis=-1)
    raise ValueError(f"unknown metric {metric!r}")
