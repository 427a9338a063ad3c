"""Device BM25: HBM-resident postings + one segmented-sum program.

The reference scores BM25 inside tantivy on the host
(inverted_index_reader.rs:108-150). The TPU-native path keeps the block's
whole CSR postings (doc ids, term frequencies, doc lengths) resident in
HBM — uploaded once per block, like the vector columns — and each query
ships only tiny per-term scalars (posting start/length, idf, group id).
One jitted program gathers the query terms' posting slices on device,
computes per-posting BM25 contributions on the VPU, and ``segment_sum``s
them into the per-doc score vector, plus a per-group hit count for AND
semantics. Shapes are bucketed (term count and max posting length to
powers of two) so repeated queries hit the jit cache.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

K1 = 1.2
B = 0.75


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


@functools.lru_cache(maxsize=None)
def _bm25_program(t: int, l: int, g: int, n_docs: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(doc_ids_full, tfs_full, doc_len, starts, lens, idf, gid, avgdl):
        # gather each term's posting slice on device: [T, L]
        pos = starts[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(l, dtype=jnp.int32)[None, :] < lens[:, None]) \
            & (gid[:, None] >= 0)
        safe_pos = jnp.clip(pos, 0, doc_ids_full.shape[0] - 1)
        doc_ids = jnp.take(doc_ids_full, safe_pos)
        tfs = jnp.take(tfs_full, safe_pos)
        dl = jnp.take(doc_len, doc_ids)
        denom = tfs + K1 * (1.0 - B + B * dl / avgdl)
        elem = jnp.where(valid,
                         idf[:, None] * tfs * (K1 + 1.0)
                         / jnp.maximum(denom, 1e-9), 0.0)
        flat_ids = jnp.where(valid, doc_ids, n_docs)            # pad bucket
        scores = jax.ops.segment_sum(
            elem.reshape(-1), flat_ids.reshape(-1),
            num_segments=n_docs + 1)[:n_docs]
        # per-group distinct-match count (AND semantics)
        safe_gid = jnp.where(gid >= 0, gid, 0)
        cid = safe_gid[:, None] * (n_docs + 1) + flat_ids       # [T,L]
        ghit = jax.ops.segment_sum(
            valid.reshape(-1).astype(jnp.float32), cid.reshape(-1),
            num_segments=g * (n_docs + 1)).reshape(g, n_docs + 1)
        matched = jnp.sum(ghit[:, :n_docs] > 0, axis=0)
        return scores, matched

    return run


@functools.lru_cache(maxsize=None)
def _bm25_topk_program(t: int, l: int, g: int, n_docs: int, k: int):
    """Scatter-free top-k BM25: XLA scatters serialize on TPU, so instead
    of segment-summing into a dense [n_docs] vector this sorts the (doc,
    group, contribution) triples (each doc appears at most once per query
    term, so runs are <= T long) and reduces runs with a log2(T)-step
    segmented Hillis-Steele scan — sort + shifts + top_k, all
    TPU-friendly primitives."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(doc_ids_full, tfs_full, doc_len, starts, lens, idf, gid, avgdl,
            need):
        pos = starts[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(l, dtype=jnp.int32)[None, :] < lens[:, None]) \
            & (gid[:, None] >= 0)
        safe_pos = jnp.clip(pos, 0, doc_ids_full.shape[0] - 1)
        doc_ids = jnp.take(doc_ids_full, safe_pos)
        tfs = jnp.take(tfs_full, safe_pos)
        dl = jnp.take(doc_len, doc_ids)
        denom = tfs + K1 * (1.0 - B + B * dl / avgdl)
        elem = jnp.where(valid,
                         idf[:, None] * tfs * (K1 + 1.0)
                         / jnp.maximum(denom, 1e-9), 0.0)
        ids = jnp.where(valid, doc_ids, n_docs).reshape(-1)
        el = elem.reshape(-1)
        gg = jnp.broadcast_to(gid[:, None], (t, l)).reshape(-1)
        ids_s, gid_s, el_s = jax.lax.sort([ids, gg, el], num_keys=2)
        # run-local inclusive sums (runs of equal doc id are contiguous and
        # at most t long after the sort)
        total = el_s
        # distinct-group count per run: (id, gid) boundary flags
        newg = jnp.concatenate([
            jnp.ones(1, jnp.float32),
            ((ids_s[1:] != ids_s[:-1]) | (gid_s[1:] != gid_s[:-1]))
            .astype(jnp.float32)])
        cnt = newg
        shift = 1
        while shift < t:
            same = jnp.concatenate([
                jnp.zeros(shift, jnp.bool_),
                ids_s[shift:] == ids_s[:-shift]])
            total = total + jnp.where(
                same, jnp.concatenate([jnp.zeros(shift, total.dtype),
                                       total[:-shift]]), 0.0)
            cnt = cnt + jnp.where(
                same, jnp.concatenate([jnp.zeros(shift, cnt.dtype),
                                       cnt[:-shift]]), 0.0)
            shift <<= 1
        is_end = jnp.concatenate([ids_s[1:] != ids_s[:-1],
                                  jnp.ones(1, jnp.bool_)])
        ok = is_end & (ids_s < n_docs) & (cnt >= need.astype(jnp.float32))
        masked = jnp.where(ok, total, -jnp.inf)
        vals, sel = jax.lax.top_k(masked, k)
        return vals, jnp.take(ids_s, sel)

    return run


@functools.lru_cache(maxsize=None)
def _bm25_batch_topk_program(t: int, l: int, n_docs: int, k: int, b: int):
    """B queries per ONE sort (VERDICT r2 item 5): term posting slices
    stack across the query batch, the sort key becomes (query*doc),
    the segmented Hillis-Steele run-reduction is unchanged, and the
    unique (query, doc) run-end scores scatter into a dense [B, n_docs]
    for one batched top_k. The per-query sort that didn't amortize at
    B=1 (13.3 ms device vs 5.7 ms host at 262k docs) serves the whole
    batch here."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(doc_ids_full, tfs_full, doc_len, starts, lens, idf, qid, qgid,
            need, avgdl):
        pos = starts[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :]
        valid = (jnp.arange(l, dtype=jnp.int32)[None, :] < lens[:, None]) \
            & (qid[:, None] >= 0)
        safe_pos = jnp.clip(pos, 0, doc_ids_full.shape[0] - 1)
        doc_ids = jnp.take(doc_ids_full, safe_pos)
        tfs = jnp.take(tfs_full, safe_pos)
        dl = jnp.take(doc_len, doc_ids)
        denom = tfs + K1 * (1.0 - B + B * dl / avgdl)
        elem = jnp.where(valid,
                         idf[:, None] * tfs * (K1 + 1.0)
                         / jnp.maximum(denom, 1e-9), 0.0)
        span = n_docs + 1
        safe_qid = jnp.where(qid >= 0, qid, b)
        comp = jnp.where(valid,
                         safe_qid[:, None] * span + doc_ids,
                         b * span).reshape(-1)
        el = elem.reshape(-1)
        gg = jnp.broadcast_to(qgid[:, None], (t, l)).reshape(-1)
        comp_s, gid_s, el_s = jax.lax.sort([comp, gg, el], num_keys=2)
        total = el_s
        newg = jnp.concatenate([
            jnp.ones(1, jnp.float32),
            ((comp_s[1:] != comp_s[:-1]) | (gid_s[1:] != gid_s[:-1]))
            .astype(jnp.float32)])
        cnt = newg
        shift = 1
        while shift < t:
            same = jnp.concatenate([
                jnp.zeros(shift, jnp.bool_),
                comp_s[shift:] == comp_s[:-shift]])
            total = total + jnp.where(
                same, jnp.concatenate([jnp.zeros(shift, total.dtype),
                                       total[:-shift]]), 0.0)
            cnt = cnt + jnp.where(
                same, jnp.concatenate([jnp.zeros(shift, cnt.dtype),
                                       cnt[:-shift]]), 0.0)
            shift <<= 1
        is_end = jnp.concatenate([comp_s[1:] != comp_s[:-1],
                                  jnp.ones(1, jnp.bool_)])
        q_of = comp_s // span
        need_of = jnp.take(jnp.concatenate(
            [need, jnp.full(1, 1.0, jnp.float32)]),
            jnp.clip(q_of, 0, b))
        ok = is_end & (comp_s < b * span) \
            & ((comp_s % span) < n_docs) & (cnt >= need_of)
        # run-end (query, doc) pairs are unique -> conflict-free scatter
        seg = jnp.where(ok, comp_s, b * span)
        dense = jax.ops.segment_max(
            jnp.where(ok, total, -jnp.inf), seg,
            num_segments=b * span + 1)[:b * span]
        dense = dense.reshape(b, span)[:, :n_docs]
        vals, ids = jax.lax.top_k(dense, k)
        return vals, ids

    return run


class DeviceBM25:
    """Per-block device scorer; postings upload once, queries ship scalars."""

    def __init__(self, reader):
        import jax.numpy as jnp
        self.reader = reader
        self.n_docs = reader.n_docs
        self.avgdl = float(reader.doc_len.mean()) if reader.n_docs else 1.0
        self._doc_ids = jnp.asarray(reader.doc_ids.astype(np.int32))
        self._tfs = jnp.asarray(reader.tfs.astype(np.float32))
        self._doc_len = jnp.asarray(reader.doc_len.astype(np.float32))
        # coarse posting-length buckets (x16 steps): queries on rare terms
        # pay small sorts, and at most 4 programs compile per block
        max_df = int((reader.offsets[1:] - reader.offsets[:-1]).max(initial=1))
        self._l_max = max_df

    def score_async(self, term_groups: List[List[int]], operator: str = "OR"):
        """Dispatch without syncing; returns a thunk resolving to
        (rows, scores). Lets callers queue many queries and sync once."""
        r = self.reader
        terms = [(tid, gi) for gi, group in enumerate(term_groups)
                 for tid in group if tid >= 0]
        n_present = len({gi for _, gi in terms})
        if not terms:
            empty = (np.zeros(0, np.int64), np.zeros(0, np.float32))
            return lambda: empty
        t_b = _bucket(len(terms))
        g_b = _bucket(len(term_groups), lo=4)
        max_len = max(int(r.offsets[tid + 1] - r.offsets[tid])
                      for tid, _ in terms)
        l_b = 128
        while l_b < max_len:
            l_b <<= 4  # coarse x16 buckets
        l_b = min(l_b, _bucket(self._l_max, lo=128))
        starts = np.zeros(t_b, np.int32)
        lens = np.zeros(t_b, np.int32)
        idf = np.zeros(t_b, np.float32)
        gid = np.full(t_b, -1, np.int32)
        for i, (tid, gi) in enumerate(terms):
            s, e = int(r.offsets[tid]), int(r.offsets[tid + 1])
            starts[i], lens[i] = s, e - s
            df = e - s
            idf[i] = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            gid[i] = gi
        run = _bm25_program(t_b, l_b, g_b, self.n_docs)
        scores_dev, matched_dev = run(
            self._doc_ids, self._tfs, self._doc_len, starts, lens, idf, gid,
            np.float32(max(self.avgdl, 1e-9)))

        def resolve():
            import jax
            scores, matched = jax.device_get((scores_dev, matched_dev))
            if operator.upper() == "AND":
                if n_present < len(term_groups):
                    return (np.zeros(0, np.int64), np.zeros(0, np.float32))
                hit = matched >= n_present
            else:
                hit = matched > 0
            rows = np.nonzero(hit)[0]
            return rows, scores[rows].astype(np.float32)

        return resolve

    def score(self, term_groups: List[List[int]], operator: str = "OR"
              ) -> Tuple[np.ndarray, np.ndarray]:
        """(rows, scores) — same contract as the host bm25_scores."""
        return self.score_async(term_groups, operator)()

    def top_k(self, term_groups: List[List[int]], k: int,
              operator: str = "OR") -> Tuple[np.ndarray, np.ndarray]:
        """Serving path: top-k matching docs by BM25, selected ON DEVICE so
        only k (row, score) pairs leave HBM (the match() + ORDER BY
        score() LIMIT k pushdown; the reference's tantivy TopDocs
        collector, inverted_index_reader.rs:123 order_by_score)."""
        r = self.reader
        terms = [(tid, gi) for gi, group in enumerate(term_groups)
                 for tid in group if tid >= 0]
        n_present = len({gi for _, gi in terms})
        if not terms or (operator.upper() == "AND"
                         and n_present < len(term_groups)):
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        out = self._dispatch_topk(term_groups, k, operator)
        import jax
        vals, rows = jax.device_get((out[0], out[1]))  # one fetch, one RTT
        ok = vals > -np.inf
        return rows[ok].astype(np.int64), vals[ok].astype(np.float32)

    def top_k_batch(self, queries: List[List[List[int]]], k: int,
                    operator: str = "OR"
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Top-k for a BATCH of queries in one device program (one sort
        serves all of them). ``queries[b]`` is that query's term_groups.
        Returns [(rows, scores)] per query, same contract as top_k."""
        r = self.reader
        flat = []   # (term, query, global_group)
        need = []
        gbase = 0
        present = []
        for qi, tg in enumerate(queries):
            terms = [(tid, qi, gbase + gi) for gi, group in enumerate(tg)
                     for tid in group if tid >= 0]
            flat.extend(terms)
            n_present = len({g for _, _, g in terms})
            present.append(n_present)
            need.append(float(n_present) if operator.upper() == "AND"
                        else 1.0)
            gbase += len(tg)
        bq = len(queries)
        empty = (np.zeros(0, np.int64), np.zeros(0, np.float32))
        if not flat:
            return [empty] * bq
        t_b = _bucket(len(flat))
        b_b = _bucket(bq, lo=2)
        max_len = max(int(r.offsets[tid + 1] - r.offsets[tid])
                      for tid, _, _ in flat)
        l_b = 128
        while l_b < max_len:
            l_b <<= 4
        l_b = min(l_b, _bucket(self._l_max, lo=128))
        starts = np.zeros(t_b, np.int32)
        lens = np.zeros(t_b, np.int32)
        idf = np.zeros(t_b, np.float32)
        qid = np.full(t_b, -1, np.int32)
        qgid = np.zeros(t_b, np.int32)
        for i, (tid, qi, gg) in enumerate(flat):
            s, e = int(r.offsets[tid]), int(r.offsets[tid + 1])
            starts[i], lens[i] = s, e - s
            df = e - s
            idf[i] = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            qid[i] = qi
            qgid[i] = gg
        need_arr = np.ones(b_b, np.float32)
        need_arr[:bq] = need
        run = _bm25_batch_topk_program(t_b, l_b, self.n_docs,
                                       min(k, self.n_docs), b_b)
        vals_dev, ids_dev = run(self._doc_ids, self._tfs, self._doc_len,
                                starts, lens, idf, qid, qgid, need_arr,
                                np.float32(max(self.avgdl, 1e-9)))
        import jax
        vals, ids = jax.device_get((vals_dev, ids_dev))
        out = []
        for qi, tg in enumerate(queries):
            if operator.upper() == "AND" and present[qi] < len(tg):
                out.append(empty)
                continue
            ok = vals[qi] > -np.inf
            out.append((ids[qi][ok].astype(np.int64),
                        vals[qi][ok].astype(np.float32)))
        return out

    def _dispatch_topk(self, term_groups, k: int, operator: str = "OR"):
        """Queue the device top-k without syncing; returns the device
        (vals, rows) pair (callers block_until_ready in bulk)."""
        r = self.reader
        terms = [(tid, gi) for gi, group in enumerate(term_groups)
                 for tid in group if tid >= 0]
        n_present = len({gi for _, gi in terms})
        t_b = _bucket(len(terms))
        g_b = _bucket(len(term_groups), lo=4)
        max_len = max(int(r.offsets[tid + 1] - r.offsets[tid])
                      for tid, _ in terms)
        l_b = 128
        while l_b < max_len:
            l_b <<= 4  # coarse x16 buckets
        l_b = min(l_b, _bucket(self._l_max, lo=128))
        starts = np.zeros(t_b, np.int32)
        lens = np.zeros(t_b, np.int32)
        idf = np.zeros(t_b, np.float32)
        gid = np.full(t_b, -1, np.int32)
        for i, (tid, gi) in enumerate(terms):
            s, e = int(r.offsets[tid]), int(r.offsets[tid + 1])
            starts[i], lens[i] = s, e - s
            df = e - s
            idf[i] = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            gid[i] = gi
        need = n_present if operator.upper() == "AND" else 1
        run = _bm25_topk_program(t_b, l_b, g_b, self.n_docs,
                                 min(k, self.n_docs))
        return run(self._doc_ids, self._tfs, self._doc_len, starts, lens,
                   idf, gid, np.float32(max(self.avgdl, 1e-9)),
                   np.int32(need))


# ------------------------------------------------------------ impact layout
@functools.lru_cache(maxsize=None)
def _impact_topk_program(n_pad: int, L: int, m: int, b: int, g: int,
                         k: int, tile: int):
    """Dense doc-major BM25: scoring as pure compare-multiply-reduce.

    The CSR postings traversal (sort/scatter/gather) is a scalar-CPU idiom
    that measured SLOWER than host numpy even batched (sort cost scales
    with total posting length). The TPU-native layout is doc-major and
    DENSE: `term_ids [N, L]` (L = max terms per doc) and a precomputed
    per-(doc, slot) BM25 saturation `sat = tf*(k1+1)/(tf+k1*(1-b+b*len/
    avgdl))`. A query batch is then `eq = term_ids == qterms` broadcast —
    VPU compares + one reduction; no data-dependent memory access at all.
    Score(d, q) = sum_slots sum_terms eq * sat[d, slot] * idf[q, term].
    Docs scan in tiles (lax.scan) so the [tile, L, b, m] intermediate
    stays small; padded docs/slots/terms never match (-2 vs -1 ids)."""
    import jax
    import jax.numpy as jnp

    n_tiles = n_pad // tile

    @jax.jit
    def run(term_ids, sat, qterms, idf, gmat, need):
        tid3 = term_ids.reshape(n_tiles, tile, L)
        sat3 = sat.reshape(n_tiles, tile, L)

        def step(carry, inp):
            t_ids, t_sat = inp                                # [tile, L]
            eq = t_ids[:, :, None, None] == qterms[None, None, :, :]
            contrib = jnp.where(eq, t_sat[:, :, None, None], 0.0)
            per_term = contrib.sum(axis=1)                    # [tile, b, m]
            scores = jnp.einsum(
                "tbm,bm->bt", per_term, idf,
                precision=jax.lax.Precision.HIGHEST)  # [b, tile]
            hit = eq.any(axis=1).astype(jnp.float32)          # [tile, b, m]
            ghit = jnp.einsum("tbm,bmg->tbg", hit, gmat)      # [tile, b, g]
            matched = jnp.sum(ghit > 0, -1).astype(jnp.float32).T
            ok = matched >= need[:, None]                     # [b, tile]
            return carry, jnp.where(ok, scores, -jnp.inf)

        _, all_scores = jax.lax.scan(step, 0, (tid3, sat3))
        dense = jnp.moveaxis(all_scores, 0, 1).reshape(b, n_pad)
        vals, ids = jax.lax.top_k(dense, k)
        return vals, ids

    return run


@functools.lru_cache(maxsize=None)
def _impact_fused_topk_program(n_pad: int, L: int, m: int, b: int, g: int,
                               k: int, tile: int, d: int, metric: str):
    """Text+vector fusion as ONE device program (BASELINE config 4's fused
    shape): per tile the dense BM25 compare-multiply-reduce runs as in
    _impact_topk_program, the distance term rides the MXU
    (``emb_tile @ Q.T``), and the combined ``w_s*score + w_d*dist`` is
    masked to the text-matched candidate set before one batched top_k —
    the device analog of `match(..) ORDER BY a*score() - b*dist(..)`."""
    import jax
    import jax.numpy as jnp

    n_tiles = n_pad // tile

    @jax.jit
    def run(term_ids, sat, qterms, idf, gmat, need, emb, Q, w_s, w_d):
        tid3 = term_ids.reshape(n_tiles, tile, L)
        sat3 = sat.reshape(n_tiles, tile, L)
        emb3 = emb.reshape(n_tiles, tile, d)
        if metric == "cosine":
            Qe = Q / jnp.maximum(
                jnp.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        else:
            Qe = Q
        q_sq = jnp.sum(Qe * Qe, axis=1)                       # [b]

        def step(carry, inp):
            t_ids, t_sat, t_emb = inp
            eq = t_ids[:, :, None, None] == qterms[None, None, :, :]
            contrib = jnp.where(eq, t_sat[:, :, None, None], 0.0)
            per_term = contrib.sum(axis=1)                    # [tile, b, m]
            scores = jnp.einsum(
                "tbm,bm->bt", per_term, idf,
                precision=jax.lax.Precision.HIGHEST)  # [b, tile]
            hit = eq.any(axis=1).astype(jnp.float32)
            ghit = jnp.einsum("tbm,bmg->tbg", hit, gmat)
            matched = jnp.sum(ghit > 0, -1).astype(jnp.float32).T
            ok = matched >= need[:, None]                     # [b, tile]
            dot = jnp.einsum(
                "td,bd->bt", t_emb, Qe,
                precision=jax.lax.Precision.HIGHEST)  # MXU f32 (rank
            # stability vs the host oracle: bf16 default flips near-ties)
            if metric == "cosine":
                dist = 1.0 - dot          # emb rows pre-normalized
            elif metric == "l2":
                e_sq = jnp.sum(t_emb * t_emb, axis=1)[None, :]
                dist = jnp.sqrt(jnp.maximum(
                    e_sq - 2.0 * dot + q_sq[:, None], 0.0))
            else:                          # inner product distance
                dist = -dot
            combined = w_s * scores + w_d * dist
            return carry, jnp.where(ok, combined, -jnp.inf)

        _, all_c = jax.lax.scan(step, 0, (tid3, sat3, emb3))
        dense = jnp.moveaxis(all_c, 0, 1).reshape(b, n_pad)
        vals, ids = jax.lax.top_k(dense, k)
        return vals, ids

    return run


class ImpactBM25:
    """Dense doc-major scorer for batched serving (see _impact_topk_program).

    Memory is N x L_pad x 8 bytes; blocks whose longest doc exceeds
    ``MAX_L`` slots keep the CSR paths (factory returns None)."""

    MAX_L = 512
    TILE = 2048

    @staticmethod
    def try_create(reader) -> "Optional[ImpactBM25]":
        counts = np.bincount(reader.doc_ids.astype(np.int64),
                             minlength=reader.n_docs) if reader.n_docs \
            else np.zeros(0, np.int64)
        if reader.n_docs == 0 or counts.max(initial=0) > ImpactBM25.MAX_L:
            return None
        return ImpactBM25(reader, counts)

    def __init__(self, reader, counts):
        import jax.numpy as jnp
        r = reader
        self.reader = r
        self.n_docs = r.n_docs
        avgdl = float(r.doc_len.mean()) if r.n_docs else 1.0
        vocab = len(r.offsets) - 1
        df = (r.offsets[1:] - r.offsets[:-1]).astype(np.int64)
        self._df = df
        term_of = np.repeat(np.arange(vocab, dtype=np.int32), df)
        doc_of = r.doc_ids.astype(np.int64)
        order = np.argsort(doc_of, kind="stable")
        d_s, t_s = doc_of[order], term_of[order]
        tf_s = r.tfs[order].astype(np.float32)
        L = _bucket(int(counts.max(initial=1)), lo=8)
        n_pad = -(-r.n_docs // self.TILE) * self.TILE
        first = np.concatenate([[0], np.cumsum(counts)])
        slot = np.arange(len(d_s), dtype=np.int64) - first[d_s]
        term_ids = np.full((n_pad, L), -2, np.int32)
        term_ids[d_s, slot] = t_s
        dl = r.doc_len.astype(np.float32)[d_s]
        sat = np.zeros((n_pad, L), np.float32)
        sat[d_s, slot] = tf_s * (K1 + 1.0) / (
            tf_s + K1 * (1.0 - B + B * dl / max(avgdl, 1e-9)))
        self.n_pad, self.L = n_pad, L
        self._term_ids = jnp.asarray(term_ids)   # HBM-resident, once
        self._sat = jnp.asarray(sat)

    def _idf(self, tid: int) -> float:
        df = float(self._df[tid])
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def _pack_queries(self, queries: "List[List[List[int]]]",
                      operator: str):
        """Pad the batch's term groups to bucketed [b, m] device operands."""
        terms_per_q = [[(tid, gi) for gi, grp in enumerate(q)
                        for tid in grp if tid >= 0] for q in queries]
        m = _bucket(max((len(t) for t in terms_per_q), default=1), lo=4)
        g = _bucket(max((len(q) for q in queries), default=1), lo=4)
        b = _bucket(len(queries), lo=1)
        qterms = np.full((b, m), -1, np.int32)
        idf = np.zeros((b, m), np.float32)
        gmat = np.zeros((b, m, g), np.float32)
        need = np.ones(b, np.float32)
        drop = np.zeros(b, np.bool_)
        for qi, (q, terms) in enumerate(zip(queries, terms_per_q)):
            for i, (tid, gi) in enumerate(terms):
                qterms[qi, i] = tid
                idf[qi, i] = self._idf(tid)
                gmat[qi, i, gi] = 1.0
            present = len({gi for _, gi in terms})
            if operator.upper() == "AND":
                need[qi] = float(len(q))
                drop[qi] = present < len(q)  # a group had no known terms
            else:
                need[qi] = 1.0
        return qterms, idf, gmat, need, drop, b, m, g

    def dispatch_top_k_batch(self, queries: "List[List[List[int]]]",
                             k: int, operator: str = "OR"):
        """Queue the dense batch program WITHOUT syncing; returns an
        opaque handle for :meth:`collect`. Callers serving multiple
        blocks dispatch them all, then collect — one host sync instead
        of one per block (the tunnel RTT dominates small batches)."""
        qterms, idf, gmat, need, drop, b, m, g = \
            self._pack_queries(queries, operator)
        run = _impact_topk_program(self.n_pad, self.L, m, b, g,
                                   min(k, max(self.n_docs, 1)), self.TILE)
        dev = run(self._term_ids, self._sat, qterms, idf, gmat, need)
        return (dev, drop, len(queries))

    def collect(self, handle) -> "List[Tuple[np.ndarray, np.ndarray]]":
        import jax
        dev, drop, b_real = handle
        vals, ids = jax.device_get(dev)
        out = []
        for qi in range(b_real):
            if drop[qi]:
                out.append((np.zeros(0, np.int64), np.zeros(0, np.float32)))
                continue
            ok = (vals[qi] > -np.inf) & (ids[qi] < self.n_docs)
            out.append((ids[qi][ok].astype(np.int64),
                        vals[qi][ok].astype(np.float32)))
        return out

    def top_k_batch(self, queries: "List[List[List[int]]]", k: int,
                    operator: str = "OR"
                    ) -> "List[Tuple[np.ndarray, np.ndarray]]":
        """One dense program for B queries -> [(rows, scores)] per query."""
        if len(queries) == 0:
            return []
        return self.collect(self.dispatch_top_k_batch(queries, k, operator))

    def dispatch_fused_top_k_batch(self, queries: "List[List[List[int]]]",
                                   k: int, operator: str, emb,
                                   Q: np.ndarray, w_score: float,
                                   w_dist: float, metric: str):
        """Queue the fused text+vector program without syncing (see
        :meth:`dispatch_top_k_batch`)."""
        b_real = len(queries)
        qterms, idf, gmat, need, drop, b, m, g = \
            self._pack_queries(queries, operator)
        Qp = np.zeros((b, Q.shape[1]), np.float32)
        Qp[:b_real] = Q
        run = _impact_fused_topk_program(
            self.n_pad, self.L, m, b, g, min(k, max(self.n_docs, 1)),
            self.TILE, int(emb.shape[1]), metric)
        dev = run(self._term_ids, self._sat, qterms, idf, gmat, need,
                  emb, Qp, np.float32(w_score), np.float32(w_dist))
        return (dev, drop, b_real)

    def fused_top_k_batch(self, queries: "List[List[List[int]]]", k: int,
                          operator: str, emb, Q: np.ndarray,
                          w_score: float, w_dist: float, metric: str
                          ) -> "List[Tuple[np.ndarray, np.ndarray]]":
        """Fused text+vector ranking over the text-matched candidate set:
        returns per query the top-k rows by ``w_score*bm25 + w_dist*dist``
        (callers encode ASC orders by negating both weights). ``emb`` is
        this block's [n_pad, d] device-resident embedding slice (cosine:
        pre-normalized rows)."""
        if len(queries) == 0:
            return []
        return self.collect(self.dispatch_fused_top_k_batch(
            queries, k, operator, emb, Q, w_score, w_dist, metric))
