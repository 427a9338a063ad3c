"""Inverted index reader + BM25 search.

Reference behavior (reference: inverted_index_reader.rs:108-300 +
type_check/search.rs): ``match(col, 'q', 'fuzziness=1;operator=AND')``
scores with BM25 (k1=1.2, b=0.75, Lucene idf), ``query('col:a AND b')``
supports boolean syntax. Scoring is a segmented sparse accumulation over
the CSR postings (numpy today; the layout is device-ready for a Pallas
segmented-dot later).
"""

from __future__ import annotations

import bisect
import io
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .tokenizer import tokenize_text

K1 = 1.2
B = 0.75


@dataclass
class InvertedBlockReader:
    terms: List[str]
    offsets: np.ndarray
    doc_ids: np.ndarray
    tfs: np.ndarray
    doc_len: np.ndarray
    n_docs: int
    tokenizer: str
    filters: List[str]

    @property
    def nbytes(self) -> int:
        return self.doc_ids.nbytes + self.tfs.nbytes + self.doc_len.nbytes

    @staticmethod
    def load(path: str) -> "InvertedBlockReader":
        from ...storage.operator import OPERATOR
        z = np.load(OPERATOR.open_read(path))
        terms = z["terms"].tobytes().decode("utf-8")
        terms = terms.split("\n") if terms else []
        filters = z["filters"].tobytes().decode()
        return InvertedBlockReader(
            terms, z["offsets"], z["doc_ids"], z["tfs"], z["doc_len"],
            int(z["meta"][0]), z["tokenizer"].tobytes().decode(),
            [f for f in filters.split(",") if f])

    # ------------------------------------------------------------------ terms
    def term_id(self, term: str) -> int:
        i = bisect.bisect_left(self.terms, term)
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return -1

    def fuzzy_term_ids(self, term: str, fuzziness: int) -> List[int]:
        """Terms within the given edit distance (reference supports
        fuzziness<=2 via tantivy's Levenshtein automata)."""
        out = []
        for i, t in enumerate(self.terms):
            if abs(len(t) - len(term)) > fuzziness:
                continue
            if _edit_distance_leq(term, t, fuzziness):
                out.append(i)
        return out

    def postings(self, tid: int) -> Tuple[np.ndarray, np.ndarray]:
        s, e = int(self.offsets[tid]), int(self.offsets[tid + 1])
        return self.doc_ids[s:e], self.tfs[s:e]

    # ----------------------------------------------------------------- search
    def bm25_scores(self, term_groups: List[List[int]], operator: str = "OR"):
        """BM25 over groups of term ids (a group = one query token and its
        fuzzy expansions). AND requires every group to match.
        Returns (rows, scores)."""
        if not term_groups:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        avgdl = float(self.doc_len.mean()) if self.n_docs else 1.0
        scores = np.zeros(self.n_docs, np.float64)
        matched_groups = np.zeros(self.n_docs, np.int32)
        n_present = 0
        for group in term_groups:
            group = [t for t in group if t >= 0]
            if not group:
                continue
            n_present += 1
            group_hit = np.zeros(self.n_docs, bool)
            for tid in group:
                docs, tfs = self.postings(tid)
                df = len(docs)
                idf = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
                dl = self.doc_len[docs]
                denom = tfs + K1 * (1 - B + B * dl / max(avgdl, 1e-9))
                scores[docs] += idf * (tfs * (K1 + 1)) / np.maximum(denom, 1e-9)
                group_hit[docs] = True
            matched_groups += group_hit
        if operator.upper() == "AND":
            need = len([g for g in term_groups if any(t >= 0 for t in g)])
            if need < len(term_groups):
                return np.zeros(0, np.int64), np.zeros(0, np.float32)  # missing term
            hit = matched_groups >= need
        else:
            hit = matched_groups > 0
        rows = np.nonzero(hit)[0]
        return rows, scores[rows].astype(np.float32)


def _edit_distance_leq(a: str, b: str, k: int) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = lb + 1
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
            lo = min(lo, cur[j])
        if lo > k:
            return False
        prev = cur
    return prev[lb] <= k


def search_block(reader: InvertedBlockReader, info) -> Tuple[list, Optional[list]]:
    """Run a match()/query() search against one block's index.
    Returns (rows, scores)."""
    if info.is_match:
        tokens = tokenize_text(info.query_text, reader.tokenizer, reader.filters)
        groups = []
        for tok in tokens:
            if info.fuzziness:
                groups.append(reader.fuzzy_term_ids(tok, int(info.fuzziness)))
            else:
                groups.append([reader.term_id(tok)])
        rows, scores = reader.bm25_scores(groups, info.operator)
    else:
        rows, scores = _eval_query_syntax(reader, info.query_text)
    return rows.tolist(), scores.tolist()


def _eval_query_syntax(reader: InvertedBlockReader, q: str):
    """Minimal tantivy-style boolean query: `a AND b`, `col:a OR b`, NOT.
    Field prefixes are accepted and ignored (per-block postings span all
    indexed columns)."""
    tokens = q.split()
    # shunting-less left-fold: term [op term]*
    result_rows: Optional[np.ndarray] = None
    result_scores: Optional[np.ndarray] = None
    pending_op = "OR"
    negate_next = False
    for raw in tokens:
        up = raw.upper()
        if up in ("AND", "OR"):
            pending_op = up
            continue
        if up == "NOT" or up == "-":
            negate_next = True
            continue
        term = raw.split(":", 1)[-1].strip('"').lower()
        toks = tokenize_text(term, reader.tokenizer, reader.filters)
        rows, scores = reader.bm25_scores([[reader.term_id(t)] for t in toks], "AND")
        if negate_next:
            all_rows = np.arange(reader.n_docs)
            mask = np.ones(reader.n_docs, bool)
            mask[rows] = False
            rows = all_rows[mask]
            scores = np.zeros(len(rows), np.float32)
            negate_next = False
        if result_rows is None:
            result_rows, result_scores = rows, scores
        elif pending_op == "AND":
            common, ia, ib = np.intersect1d(result_rows, rows, return_indices=True)
            result_rows = common
            result_scores = result_scores[ia] + scores[ib]
        else:
            merged = {}
            for r, s in zip(result_rows.tolist(), result_scores.tolist()):
                merged[r] = merged.get(r, 0.0) + s
            for r, s in zip(rows.tolist(), scores.tolist()):
                merged[r] = merged.get(r, 0.0) + s
            result_rows = np.array(sorted(merged), np.int64)
            result_scores = np.array([merged[r] for r in sorted(merged)], np.float32)
    if result_rows is None:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    return result_rows, result_scores
