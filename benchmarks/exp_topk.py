"""Experiment: candidate headline kernels for config-1 (SIFT1M top-10).

All corpus arrays are passed as jit ARGUMENTS (closure-captured device
arrays get serialized into remote-compile requests on the axon tunnel).
Iterations are chained through a data dependency like bench.py.
"""
import os, sys, time, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from databend_tpu.ops import quantization as sq

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

N, D, K = 1_000_000, 128, 10
rng = np.random.default_rng(7)
x = rng.standard_normal((N, D), dtype=np.float32)
dev = jax.devices()[0]

BPOOL = 64
qpool = x[rng.integers(0, N, size=BPOOL)] + 0.05 * rng.standard_normal((BPOOL, D), dtype=np.float32)
true = []
for j in range(BPOOL):
    diff = x - qpool[j]
    dd = np.einsum("nd,nd->n", diff, diff)
    true.append(set(np.argpartition(dd, K)[:K].tolist()))
print("ground truth done", flush=True)

x_bf16 = jax.device_put(x.astype(jnp.bfloat16), dev)
norms = jax.device_put((x.astype(np.float64) ** 2).sum(-1).astype(np.float32), dev)
cor = sq.encode(x)
codes = jax.device_put(np.asarray(cor.codes), dev)
rank_corr = jax.device_put(np.asarray(cor.rank_corr), dev)
m = cor.meta
x_f32 = jax.device_put(x, dev)
jax.block_until_ready((x_bf16, norms, codes, rank_corr, x_f32))
print("uploads done", flush=True)


def bench_chained(fn, q_dev, extra, iters=50, reps=3):
    """fn(qb, *extra) -> (vals, ids, q_next); chained through q_next."""
    v, i, qc = fn(q_dev, *extra)
    jax.block_until_ready(v)
    best = 1e9
    for _ in range(reps):
        qc = q_dev
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i, qc = fn(qc, *extra)
        jax.block_until_ready(v)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, (v, i)


def recall_of(ids_np):
    b = min(ids_np.shape[0], BPOOL)
    got = sum(len(true[j] & set(ids_np[j].tolist())) for j in range(b))
    return got / (b * K)


def make_q(B):
    reps = (B + BPOOL - 1) // BPOOL
    return jax.device_put(np.tile(qpool, (reps, 1))[:B], dev)


# --- A: current bf16 path (args)
@jax.jit
def step_a(qb, xb, nb):
    dots = jax.lax.dot_general(qb.astype(jnp.bfloat16), xb,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d2 = jnp.sum(qb * qb, -1, keepdims=True) - 2.0 * dots + nb[None, :]
    v, i = jax.lax.approx_min_k(d2, K)
    return v, i, qb + (v[0, 0] * 0.0)

for B in (256, 512, 1024):
    q = make_q(B)
    t, (v, i) = bench_chained(step_a, q, (x_bf16, norms))
    r = recall_of(np.asarray(i))
    print(f"A bf16+approx_min_k B={B}: {t*1e3:.3f} ms  {B/t:,.0f} QPS  recall {r:.4f}", flush=True)

# --- B: int8 select (+rerank) — query stays f32, encoded on device
ALPHA, OFFSET = float(m.alpha), float(m.offset)

def enc_q(qb):
    u = jnp.clip(jnp.round((qb - OFFSET) / ALPHA), 0, 255).astype(jnp.int32)
    return (u - 128).astype(jnp.int8)

def make_step_b(S):
    @jax.jit
    def step_b(qb, cds, rc, xf):
        qc = enc_q(qb)
        idot = jax.lax.dot_general(qc, cds,
                                   dimension_numbers=(((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        rank = (-2.0 * ALPHA * ALPHA) * idot.astype(jnp.float32) + rc[None, :]
        _, cand = jax.lax.approx_min_k(rank, S)
        cand_vecs = xf[cand]
        diff = cand_vecs - qb[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
        vals, pos = jax.lax.top_k(-exact, K)
        return -vals, jnp.take_along_axis(cand, pos, axis=1), qb + (vals[0, 0] * 0.0)
    return step_b

for B in (256, 512, 1024):
    q = make_q(B)
    stepb = make_step_b(40)
    t, (v, i) = bench_chained(stepb, q, (codes, rank_corr, x_f32))
    r = recall_of(np.asarray(i))
    print(f"B int8+rerank S=40 B={B}: {t*1e3:.3f} ms  {B/t:,.0f} QPS  recall {r:.4f}", flush=True)

# --- C: int8 select-only
@jax.jit
def step_c(qb, cds, rc):
    qc = enc_q(qb)
    idot = jax.lax.dot_general(qc, cds,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
    rank = (-2.0 * ALPHA * ALPHA) * idot.astype(jnp.float32) + rc[None, :]
    v, i = jax.lax.approx_min_k(rank, K)
    return v, i, qb + (v[0, 0] * 0.0)

for B in (1024,):
    q = make_q(B)
    t, (v, i) = bench_chained(step_c, q, (codes, rank_corr))
    r = recall_of(np.asarray(i))
    print(f"C int8 select-only B={B}: {t*1e3:.3f} ms  {B/t:,.0f} QPS  recall {r:.4f}", flush=True)

# --- D/E: matmul-only roofline probes
@jax.jit
def step_d(qb, cds):
    qc = enc_q(qb)
    idot = jax.lax.dot_general(qc, cds,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
    s = jnp.min(idot, axis=1)
    return s, s, qb + (s[0] * 0.0).astype(qb.dtype)

@jax.jit
def step_e(qb, xb):
    dots = jax.lax.dot_general(qb.astype(jnp.bfloat16), xb,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s = jnp.min(dots, axis=1)
    return s, s, qb + s[0] * 0.0

for B in (1024,):
    q = make_q(B)
    t, _ = bench_chained(step_d, q, (codes,))
    print(f"D int8 matmul+min B={B}: {t*1e3:.3f} ms  {B/t:,.0f} QPS", flush=True)
    t, _ = bench_chained(step_e, q, (x_bf16,))
    print(f"E bf16 matmul+min B={B}: {t*1e3:.3f} ms  {B/t:,.0f} QPS", flush=True)
