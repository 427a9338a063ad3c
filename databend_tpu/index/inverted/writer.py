"""Inverted (BM25) index writer: per-block CSR postings + positions.

The reference embeds a single-segment tantivy index per block
(reference: inverted_index_writer.rs:189-273) with term positions stored
for phrase queries (inverted_index_reader.rs:154-239). Here the per-block
index is flat CSR arrays — term dictionary, postings offsets, doc ids,
term frequencies, doc lengths, and a second-level CSR of within-doc token
positions — the layout a segmented-sparse BM25 kernel consumes directly
(device or host).
"""

from __future__ import annotations

import io
from typing import Dict, List

import numpy as np

from .tokenizer import parse_filters, tokenize_text


def build_inverted_index(path: str, columns, options: Dict[str, str]) -> int:
    """Build and save one block's inverted index over text columns.
    Documents are the row-wise concatenation of the indexed columns
    (per-column fields share one posting space like the reference's
    multi-field schema). Returns file size."""
    tokenizer = options.get("tokenizer", "english")
    filters = parse_filters(options)

    vocab: Dict[str, int] = {}
    term_docs: List[List[int]] = []   # per term: doc ids
    term_tfs: List[List[int]] = []    # per term: tf per doc
    term_pos: List[List[List[int]]] = []  # per term, per doc: positions
    n_docs = len(columns[0]) if columns else 0
    doc_len = np.zeros(n_docs, np.int32)

    col_lists = [c.to_pylist() for c in columns]
    for doc_id in range(n_docs):
        counts: Dict[str, int] = {}
        positions: Dict[str, List[int]] = {}
        total = 0
        for col in col_lists:
            text = col[doc_id]
            if text is None:
                continue
            for tok in tokenize_text(str(text), tokenizer, filters):
                counts[tok] = counts.get(tok, 0) + 1
                positions.setdefault(tok, []).append(total)
                total += 1
        doc_len[doc_id] = total
        for tok, tf in counts.items():
            tid = vocab.get(tok)
            if tid is None:
                tid = len(vocab)
                vocab[tok] = tid
                term_docs.append([])
                term_tfs.append([])
                term_pos.append([])
            term_docs[tid].append(doc_id)
            term_tfs[tid].append(tf)
            term_pos[tid].append(positions[tok])

    # sort terms for binary search; build CSR
    terms = sorted(vocab)
    order = [vocab[t] for t in terms]
    offsets = np.zeros(len(terms) + 1, np.int64)
    for i, tid in enumerate(order):
        offsets[i + 1] = offsets[i] + len(term_docs[tid])
    nnz = int(offsets[-1])
    doc_ids = np.zeros(nnz, np.int32)
    tfs = np.zeros(nnz, np.int32)
    pos_counts = np.zeros(nnz, np.int64)
    flat_pos: List[int] = []
    j = 0
    for i, tid in enumerate(order):
        doc_ids[offsets[i]: offsets[i + 1]] = term_docs[tid]
        tfs[offsets[i]: offsets[i + 1]] = term_tfs[tid]
        for plist in term_pos[tid]:
            pos_counts[j] = len(plist)
            flat_pos.extend(plist)
            j += 1
    pos_offsets = np.zeros(nnz + 1, np.int64)
    np.cumsum(pos_counts, out=pos_offsets[1:])
    positions_arr = np.asarray(flat_pos, np.int32)

    term_blob = "\n".join(terms).encode("utf-8")
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        terms=np.frombuffer(term_blob, np.uint8),
        offsets=offsets, doc_ids=doc_ids, tfs=tfs, doc_len=doc_len,
        pos_offsets=pos_offsets, positions=positions_arr,
        meta=np.array([n_docs], np.int64),
        tokenizer=np.frombuffer(tokenizer.encode(), np.uint8),
        filters=np.frombuffer(",".join(filters).encode(), np.uint8))
    data = buf.getvalue()
    from ...storage.operator import OPERATOR
    OPERATOR.write_bytes(path, data)
    return len(data)
