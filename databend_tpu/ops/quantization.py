"""Scalar quantization (SQ-u8) scoring on the int8 MXU.

Reference: EncodedVectorsU8 (src/query/storages/common/index/src/hnsw_index/
quantization/encoded_vectors_u8.rs:33-427) — per-index (alpha, offset)
affine u8 encoding with optional quantile clipping, scored by C SIMD u8
dot kernels (cpp/avx2.c:42). TPU-native version: values are centered to
int8 (c = u8 - 128) so scoring is an int8 x int8 matmul accumulating in
int32 on the MXU, plus rank-1 correction terms from per-vector element
sums:

    x ~ alpha * u + offset,  u = c + 128
    dot(x, y) = alpha^2 * (c_x . c_y)
              + alpha * (alpha*128 + offset) * (s_x + s_y)
              + d * (alpha*128 + offset)^2
  with s = sum(c). Quantized corpora are 4x smaller than f32 (2x smaller
than bf16), halving the HBM scan bound again.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SQ8Meta(NamedTuple):
    alpha: float
    offset: float
    dim: int


class SQ8Corpus(NamedTuple):
    codes: jax.Array      # [N, d] int8 (centered)
    sums: jax.Array       # [N] f32: sum of centered codes per row
    sq_norms: jax.Array   # [N] f32: exact |x|^2 of the ORIGINAL vectors
    # [N] f32: sq_norms - 2*alpha*beta*sums, precomputed so the L2 ranking
    # key is ONE fused multiply-add over the int8 matmul output:
    #   rank = -2*alpha^2 * idot + rank_corr   (+ per-query constants that
    # don't affect per-row selection). Halves the [B, N] elementwise passes
    # on the scan's critical path.
    rank_corr: jax.Array
    meta: SQ8Meta


def encode(x: np.ndarray, quantile: float = 0.99) -> SQ8Corpus:
    """Fit (alpha, offset) on [lo, hi] quantiles (reference quantile.rs)
    and encode to centered int8."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if quantile >= 1.0:
        lo, hi = float(x.min()), float(x.max())
    else:
        lo = float(np.quantile(x, 1.0 - quantile))
        hi = float(np.quantile(x, quantile))
    if hi <= lo:
        hi = lo + 1e-6
    alpha = (hi - lo) / 255.0
    offset = lo
    u = np.clip(np.rint((x - offset) / alpha), 0, 255).astype(np.int32)
    c = (u - 128).astype(np.int8)
    sums = c.astype(np.float32).sum(axis=1)
    sq = (x.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
    beta = alpha * 128.0 + offset
    rank_corr = sq - 2.0 * alpha * beta * sums
    return SQ8Corpus(jnp.asarray(c), jnp.asarray(sums), jnp.asarray(sq),
                     jnp.asarray(rank_corr), SQ8Meta(alpha, offset, d))


def encode_query(q: np.ndarray, meta: SQ8Meta) -> Tuple[jax.Array, jax.Array]:
    """Encode queries once, then score against the whole corpus
    (reference encode_query / score_point split)."""
    q = np.asarray(q, np.float32)
    u = np.clip(np.rint((q - meta.offset) / meta.alpha), 0, 255).astype(np.int32)
    c = (u - 128).astype(np.int8)
    return jnp.asarray(c), jnp.asarray(c.astype(np.float32).sum(axis=1))


@functools.partial(jax.jit, static_argnames=("alpha", "offset", "dim"))
def _dot_scores(qc, qs, codes, sums, alpha: float, offset: float, dim: int):
    idot = jax.lax.dot_general(
        qc, codes, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [B, N] int32
    beta = alpha * 128.0 + offset
    return (alpha * alpha * idot.astype(jnp.float32)
            + alpha * beta * (qs[:, None] + sums[None, :])
            + dim * beta * beta)


def approx_dot(q_codes, q_sums, corpus: SQ8Corpus) -> jax.Array:
    """Pairwise approximate dot products `[B, N]` from int8 codes."""
    m = corpus.meta
    return _dot_scores(q_codes, q_sums, corpus.codes, corpus.sums,
                       m.alpha, m.offset, m.dim)


@functools.partial(jax.jit, static_argnames=("k", "s", "alpha", "offset",
                                              "dim", "rerank"))
def _topk_l2_device(qj, q_codes, codes, rank_corr, x_f32,
                    k: int, s: int, alpha: float, offset: float, dim: int,
                    rerank: bool):
    # selection phase: int8 x int8 MXU matmul (native s8 convolution,
    # s32 accumulate) + ONE fused multiply-add as the ranking key.
    # Per-query constants (|q|^2, the alpha*beta*q_sums term) shift every
    # row of a query equally, so they are dropped from the selection and
    # only the exact re-rank produces true distances.
    idot = jax.lax.dot_general(
        q_codes, codes, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [B, N]
    rank = (-2.0 * alpha * alpha) * idot.astype(jnp.float32) \
        + rank_corr[None, :]
    if not rerank:
        vals, ids = jax.lax.top_k(-rank, k)
        # restore true squared distances for the returned values
        qq = jnp.sum(qj * qj, axis=1, keepdims=True)
        beta = alpha * 128.0 + offset
        qs = jnp.sum(q_codes.astype(jnp.float32), axis=1, keepdims=True)
        return (-vals + qq - 2.0 * alpha * beta * qs
                - 2.0 * dim * beta * beta), ids
    _, cand = jax.lax.approx_min_k(rank, s)
    cand_vecs = x_f32[cand]
    diff = cand_vecs - qj[:, None, :]
    exact = jnp.sum(diff * diff, axis=-1)
    vals, pos = jax.lax.top_k(-exact, k)
    return -vals, jnp.take_along_axis(cand, pos, axis=1)


def topk_l2(q: np.ndarray, corpus: SQ8Corpus, k: int,
            x_f32: Optional[jax.Array] = None,
            shortlist_mult: int = 4) -> Tuple[jax.Array, jax.Array]:
    """Quantized exact-scan top-k: int8 matmul scores + (optional) exact
    f32 re-rank of a k*shortlist_mult shortlist (the quantized HNSW
    scoring path of the reference, generalized to full scans). The whole
    device program (int8 matmul + selection + gather + re-rank) is one jit."""
    qj = jnp.asarray(np.asarray(q, np.float32))
    q_codes, _ = encode_query(q, corpus.meta)
    m = corpus.meta
    s = min(k * shortlist_mult, corpus.codes.shape[0])
    return _topk_l2_device(
        qj, q_codes, corpus.codes, corpus.rank_corr,
        corpus.codes if x_f32 is None else x_f32,
        k, s, m.alpha, m.offset, m.dim, x_f32 is not None)
