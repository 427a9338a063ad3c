"""SQ-u8 quantized scoring (int8 MXU path)."""

import numpy as np

import jax.numpy as jnp

from databend_tpu.ops.quantization import (approx_dot, encode, encode_query,
                                           topk_l2)


def test_quantized_dot_accuracy(rng):
    x = rng.standard_normal((500, 64)).astype(np.float32)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    corpus = encode(x, quantile=1.0)
    qc, qs = encode_query(q, corpus.meta)
    approx = np.asarray(approx_dot(qc, qs, corpus))
    exact = q @ x.T
    # relative error of SQ-u8 dot on unit gaussians: well under 2% of scale
    scale = np.abs(exact).max()
    assert np.abs(approx - exact).max() < 0.02 * scale + 0.5


def test_quantized_topk_recall(rng):
    n, d, b, k = 4000, 32, 8, 10
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[rng.integers(0, n, size=b)] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    corpus = encode(x)
    dd = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    ref = np.argsort(dd, axis=1)[:, :k]

    # pure quantized scores
    _, ids = topk_l2(q, corpus, k)
    hits = sum(len(set(ref[j]) & set(np.asarray(ids)[j].tolist())) for j in range(b))
    assert hits / (b * k) >= 0.8

    # with exact f32 re-rank: near-perfect
    _, ids2 = topk_l2(q, corpus, k, x_f32=jnp.asarray(x))
    hits2 = sum(len(set(ref[j]) & set(np.asarray(ids2)[j].tolist())) for j in range(b))
    assert hits2 / (b * k) >= 0.97


def test_codes_are_int8(rng):
    x = rng.standard_normal((100, 16)).astype(np.float32)
    corpus = encode(x)
    assert corpus.codes.dtype == jnp.int8
    assert corpus.codes.shape == (100, 16)
