"""Flash top-k kernel (interpret mode on CPU; real TPU covered by bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from databend_tpu.ops.flash_topk import (flash_group_minima, flash_topk,
                                         pad_for_flash)


def _mk(rng, n=2048, d=64, b=8):
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[rng.integers(0, n, size=b)] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    norms = (x.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    return q, x, norms


def test_flash_topk_exact_l2(rng):
    q, x, norms = _mk(rng)
    k = 10
    d_out, i_out = flash_topk(q, jnp.asarray(x, jnp.bfloat16), norms, x, k,
                              "l2", tile=512, buckets=128, interpret=True)
    i_out = np.asarray(i_out)
    dd = ((x[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    ref = np.argsort(dd, axis=1)[:, :k]
    hits = sum(len(set(ref[j]) & set(i_out[j])) for j in range(q.shape[0]))
    assert hits / (q.shape[0] * k) >= 0.9
    # exact rerank -> true squared distances, ascending
    d_np = np.asarray(d_out)
    assert np.all(np.diff(d_np, axis=1) >= -1e-4)
    for j in range(q.shape[0]):
        assert abs(d_np[j, 0] - dd[j].min()) < 1e-2


def test_flash_group_minima_shape_and_values(rng):
    q, x, norms = _mk(rng, n=1024, d=32, b=4)
    m = flash_group_minima(q, jnp.asarray(x, jnp.bfloat16), norms, "l2",
                           tile=256, buckets=128, interpret=True)
    assert m.shape == (4, 4, 128)  # [ntiles, B, L]
    # global min over groups ~= global min of (|x|^2 - 2qx)
    dots = q @ x.T
    scores = norms[None, :] - 2 * dots
    assert np.allclose(np.asarray(m).min(axis=(0, 2)), scores.min(axis=1),
                       atol=np.abs(scores).max() * 0.02)


def test_flash_topk_ip(rng):
    q, x, _ = _mk(rng, n=1024)
    zeros = np.zeros(1024, np.float32)  # ip: norms = 0 real / +inf pad
    d_out, i_out = flash_topk(q, jnp.asarray(x, jnp.bfloat16), zeros, x, 5,
                              "ip", tile=256, buckets=128, interpret=True)
    dots = q @ x.T
    ref_top1 = dots.argmax(axis=1)
    assert (np.asarray(i_out)[:, 0] == ref_top1).mean() >= 0.9


def test_flash_topk_padding_masked(rng):
    # queries near the origin: zero pad rows would win without the mask
    q, x, norms = _mk(rng, n=1000)
    q = 0.01 * q
    xp, npad, n_valid = pad_for_flash(x, norms, 256)
    d_out, i_out = flash_topk(q, jnp.asarray(xp, jnp.bfloat16), npad, xp,
                              10, "l2", tile=256, buckets=128,
                              n_valid=jnp.int32(n_valid), interpret=True)
    assert np.asarray(i_out).max() < 1000
