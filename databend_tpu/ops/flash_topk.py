"""Flash top-k: fused distance-matmul + k-select Pallas kernel.

The XLA path (ops/topk.py) materializes the `[B, N]` score matrix in HBM
between the matmul and the selector — at SIFT1M scale that's ~1GB of HBM
round-trip per query batch, 4x the corpus read itself. This kernel fuses
scoring and selection the way flash attention fuses softmax: tile the
corpus over a 1-D grid, score each `[B, T]` tile on the MXU in VMEM, and
fold it into a bucketed running-minima structure that lives in VMEM
scratch across grid steps. HBM traffic drops to the bf16 corpus read.

Selection structure: L position-hashed buckets per query (column c lands
in bucket c mod L), each keeping its two smallest (value, index) pairs —
the same PartialReduce idea as `lax.approx_min_k`, with two slots so the
true top-k survives pairwise bucket collisions (loss only when 3+ of the
top-k collide in one bucket: <0.1% for k=10, L=128). The `[B, 2L]`
shortlist is then exactly re-ranked in f32 outside the kernel.

Replaces the C SIMD scorers of the reference
(src/query/storages/common/index/cpp/avx2.c:42) as the brute-force /
exact-scan hot kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LIMIT = 3.0e38  # python float: jnp scalars would be captured tracers


def _flash_kernel(q_ref, x_ref, norms_ref,
                  vals_out, idx_out,
                  run_v1, run_i1, run_v2, run_i2,
                  *, tile: int, buckets: int, metric: str):
    step = pl.program_id(0)
    b = q_ref.shape[0]
    l = buckets

    @pl.when(step == 0)
    def _init():
        run_v1[:] = jnp.full((b, l), NEG_LIMIT, jnp.float32)
        run_v2[:] = jnp.full((b, l), NEG_LIMIT, jnp.float32)
        run_i1[:] = jnp.full((b, l), -1, jnp.int32)
        run_i2[:] = jnp.full((b, l), -1, jnp.int32)

    # MXU: q [B, D] x tile [T, D] -> scores [B, T]
    dots = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if metric == "l2":
        # per-row constant |q|^2 dropped: it never changes per-row ordering
        scores = norms_ref[:] - 2.0 * dots
    else:  # ip / pre-normalized cosine: pass norms = 0 (real) / +inf (pad)
        scores = norms_ref[:] - dots

    base = step * tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, l), dimension=1)

    v1, i1 = run_v1[:], run_i1[:]
    v2, i2 = run_v2[:], run_i2[:]
    for s in range(tile // l):
        sub = scores[:, s * l:(s + 1) * l]
        sub_idx = base + s * l + lane
        m1 = sub < v1
        disp_v = jnp.where(m1, v1, sub)
        disp_i = jnp.where(m1, i1, sub_idx)
        v1 = jnp.where(m1, sub, v1)
        i1 = jnp.where(m1, sub_idx, i1)
        m2 = disp_v < v2
        v2 = jnp.where(m2, disp_v, v2)
        i2 = jnp.where(m2, disp_i, i2)
    run_v1[:], run_i1[:] = v1, i1
    run_v2[:], run_i2[:] = v2, i2

    @pl.when(step == pl.num_programs(0) - 1)
    def _finish():
        vals_out[:, :l] = run_v1[:]
        vals_out[:, l:] = run_v2[:]
        idx_out[:, :l] = run_i1[:]
        idx_out[:, l:] = run_i2[:]


def pad_for_flash(x: "np.ndarray", norms: "np.ndarray", tile: int = 4096):
    """Pad (corpus, norms) so N % tile == 0; pad rows get +inf norms (l2)
    and zero vectors (ip), so they never enter a shortlist."""
    import numpy as np
    n = x.shape[0]
    rem = (-n) % tile
    if rem == 0:
        return x, norms, n
    xp = np.concatenate([x, np.zeros((rem, x.shape[1]), x.dtype)], axis=0)
    np_ = np.concatenate([norms, np.full(rem, np.inf, np.float32)])
    return xp, np_, n


@functools.partial(jax.jit,
                   static_argnames=("metric", "tile", "buckets", "interpret"))
def flash_shortlist(q: jax.Array, x_bf16: jax.Array, norms: jax.Array,
                    metric: str = "l2", tile: int = 4096, buckets: int = 128,
                    interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused scan returning a `[B, 2*buckets]` candidate shortlist.

    q [B, D] f32; x_bf16 [N, D] bf16 (N % tile == 0 — pad with rows whose
    norms are +inf); norms [N] f32 (ignored for metric != l2). Returned
    l2 values omit the per-row |q|^2 term (ordering-preserving).
    """
    b, d = q.shape
    n = x_bf16.shape[0]
    assert n % tile == 0, f"corpus rows {n} not a multiple of tile {tile}"
    assert tile % buckets == 0
    grid = (n // tile,)

    kernel = functools.partial(_flash_kernel, tile=tile, buckets=buckets,
                               metric=metric)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 2 * buckets), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2 * buckets), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 2 * buckets), jnp.float32),
            jax.ShapeDtypeStruct((b, 2 * buckets), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, buckets), jnp.float32),
            pltpu.VMEM((b, buckets), jnp.int32),
            pltpu.VMEM((b, buckets), jnp.float32),
            pltpu.VMEM((b, buckets), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * n,
            bytes_accessed=n * d * 2 + n * 4 + b * d * 4,
            transcendentals=0),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), x_bf16, norms.reshape(1, n))
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile", "buckets",
                                             "interpret"))
def flash_topk(q: jax.Array, x_bf16: jax.Array, norms: jax.Array,
               x_f32: Optional[jax.Array], k: int, metric: str = "l2",
               tile: int = 4096, buckets: int = 128,
               interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused scan + exact top-k.

    With ``x_f32`` given, the `[B, 2*buckets]` shortlist is re-scored in
    exact f32 (recall@k ~= 1.0, value = true distance). Without it, the
    bf16 kernel scores are used directly (approx; l2 values are corrected
    by |q|^2 so they are true bf16-precision squared distances).
    """
    vals, cand = flash_shortlist(q, x_bf16, norms, metric, tile, buckets,
                                 interpret=interpret)
    cand = jnp.maximum(cand, 0)  # -1 slots only exist when n < 2L
    q32 = q.astype(jnp.float32)
    if x_f32 is not None:
        cand_vecs = x_f32[cand]                                  # [B, S, D]
        if metric == "l2":
            diff = cand_vecs - q32[:, None, :]
            exact = jnp.sum(diff * diff, axis=-1)
        else:
            exact = -jnp.einsum("bsd,bd->bs", cand_vecs, q32,
                                preferred_element_type=jnp.float32)
        scores = exact
    else:
        scores = vals
        if metric == "l2":
            scores = scores + jnp.sum(q32 * q32, axis=-1, keepdims=True)
    out_v, pos = jax.lax.top_k(-scores, k)
    return -out_v, jnp.take_along_axis(cand, pos, axis=1)
