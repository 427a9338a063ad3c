"""Device BM25 + phrase query tests.

Reference spec: tantivy BM25 scoring (inverted_index_reader.rs:108-150)
and positions-based phrase queries (:154-239). The device path must score
identically to the host path.
"""

import numpy as np
import pytest

from databend_tpu.expression import Column, DataBlock
from databend_tpu.index.inverted.device import DeviceBM25
from databend_tpu.index.inverted.reader import InvertedBlockReader
from databend_tpu.index.inverted.writer import build_inverted_index
from databend_tpu.types import String

WORDS = ["red", "fox", "jumps", "over", "lazy", "dog", "whale", "blue",
         "crab", "runs", "fast", "slow", "green", "hill", "sea"]


def _build(tmp_path, n_docs, seed=5):
    rng = np.random.default_rng(seed)
    docs = [" ".join(WORDS[i] for i in rng.integers(0, len(WORDS),
                                                    rng.integers(3, 12)))
            for _ in range(n_docs)]
    path = str(tmp_path / "ii.npz")
    build_inverted_index(path, [Column.from_pylist(docs, String)],
                         {"tokenizer": "english", "filters": ""})
    return InvertedBlockReader.load(path), docs


def test_device_matches_host_scoring(tmp_path):
    reader, _ = _build(tmp_path, 3000)
    dev = DeviceBM25(reader)
    for q, op in [(["red"], "OR"), (["red", "fox"], "OR"),
                  (["red", "fox"], "AND"), (["whale", "crab", "dog"], "AND")]:
        groups = [[reader.term_id(t)] for t in q]
        h_rows, h_scores = reader.bm25_scores(groups, op)
        d_rows, d_scores = dev.score(groups, op)
        np.testing.assert_array_equal(h_rows, d_rows)
        np.testing.assert_allclose(h_scores, d_scores, rtol=1e-4)


def test_device_topk_matches_host(tmp_path):
    reader, _ = _build(tmp_path, 3000)
    dev = DeviceBM25(reader)
    for q, op in [(["red", "fox"], "OR"), (["red", "fox"], "AND")]:
        groups = [[reader.term_id(t)] for t in q]
        h_rows, h_scores = reader.bm25_scores(groups, op)
        order = np.argsort(-h_scores, kind="stable")
        d_rows, d_scores = dev.top_k(groups, 10, op)
        assert len(d_rows) == min(10, len(h_rows))
        np.testing.assert_allclose(np.sort(h_scores)[::-1][:len(d_scores)],
                                   np.sort(d_scores)[::-1], rtol=1e-4)
        # every returned row is a true match with its true score
        smap = dict(zip(h_rows.tolist(), h_scores.tolist()))
        for r_, s_ in zip(d_rows.tolist(), d_scores.tolist()):
            assert r_ in smap and abs(smap[r_] - s_) < 1e-3


def test_phrase_match_positions(tmp_path):
    docs = ["the red fox jumps", "fox red jumps", "a red fox", "red and fox",
            "big red fox jumps high", "red fox red fox"]
    path = str(tmp_path / "p.npz")
    build_inverted_index(path, [Column.from_pylist(docs, String)],
                         {"tokenizer": "english", "filters": ""})
    r = InvertedBlockReader.load(path)
    rows, scores = r.phrase_match(["red", "fox"])
    assert rows.tolist() == [0, 2, 4, 5]  # consecutive "red fox" only
    rows, _ = r.phrase_match(["red", "fox", "jumps"])
    assert rows.tolist() == [0, 4]
    rows, _ = r.phrase_match(["fox", "jumps", "high"])
    assert rows.tolist() == [4]
    rows, _ = r.phrase_match(["red", "whale"])
    assert rows.tolist() == []


def test_phrase_through_sql(tmp_catalog):
    c = tmp_catalog
    c.sql("CREATE TABLE pd (id INT, body VARCHAR)")
    c.sql("CREATE INVERTED INDEX idx1 ON pd(body)")
    c.sql("INSERT INTO pd VALUES (1, 'the quick brown fox'), "
          "(2, 'brown the quick fox'), (3, 'quick brown shoes'), "
          "(4, 'a quick brown fox runs')")
    rows = c.sql("SELECT id FROM pd WHERE match(body, '\"quick brown fox\"') "
                 "ORDER BY id").rows()
    assert rows == [(1,), (4,)]
    # query() syntax phrase
    rows = c.sql("SELECT id FROM pd WHERE query('body:\"quick brown\"') "
                 "ORDER BY id").rows()
    assert rows == [(1,), (3,), (4,)]


def test_device_batch_topk_matches_host(tmp_path):
    """VERDICT r2 item 5: B queries per one device sort."""
    reader, _ = _build(tmp_path, 3000)
    dev = DeviceBM25(reader)
    queries = [["red"], ["red", "fox"], ["whale", "crab"],
               ["green", "hill", "sea"], ["dog"], ["slow", "runs"],
               ["blue", "whale"], ["lazy", "dog", "fox"]]
    for op in ("OR", "AND"):
        batch_groups = [[[reader.term_id(t)] for t in q] for q in queries]
        outs = dev.top_k_batch(batch_groups, 10, op)
        assert len(outs) == len(queries)
        for q, (d_rows, d_scores) in zip(queries, outs):
            groups = [[reader.term_id(t)] for t in q]
            h_rows, h_scores = reader.bm25_scores(groups, op)
            assert len(d_rows) == min(10, len(h_rows)), (q, op)
            np.testing.assert_allclose(
                np.sort(h_scores)[::-1][:len(d_scores)],
                np.sort(d_scores)[::-1], rtol=1e-4)
            smap = dict(zip(h_rows.tolist(), h_scores.tolist()))
            for r_, s_ in zip(d_rows.tolist(), d_scores.tolist()):
                assert r_ in smap and abs(smap[r_] - s_) < 1e-3


def test_impact_layout_matches_host(tmp_path):
    """Dense doc-major impact scorer (VERDICT r3 item 2a redesign):
    same top-k rows/scores as the host CSR path, both operators."""
    from databend_tpu.index.inverted.device import ImpactBM25
    reader, _ = _build(tmp_path, 3000)
    imp = ImpactBM25.try_create(reader)
    assert imp is not None
    queries = [["red"], ["red", "fox"], ["whale", "crab"],
               ["green", "hill", "sea"], ["lazy", "dog", "fox"]]
    for op in ("OR", "AND"):
        batch_groups = [[[reader.term_id(t)] for t in q] for q in queries]
        outs = imp.top_k_batch(batch_groups, 10, op)
        for q, (d_rows, d_scores) in zip(queries, outs):
            groups = [[reader.term_id(t)] for t in q]
            h_rows, h_scores = reader.bm25_scores(groups, op)
            assert len(d_rows) == min(10, len(h_rows)), (q, op)
            smap = dict(zip(h_rows.tolist(), h_scores.tolist()))
            for r_, s_ in zip(d_rows.tolist(), d_scores.tolist()):
                assert r_ in smap and abs(smap[r_] - s_) < 1e-3


def test_impact_layout_unknown_group_and_empty(tmp_path):
    from databend_tpu.index.inverted.device import ImpactBM25
    reader, _ = _build(tmp_path, 500)
    imp = ImpactBM25.try_create(reader)
    # AND with a group that has no known terms -> no rows
    rows, scores = imp.top_k_batch(
        [[[reader.term_id("red")], [-1]]], 5, "AND")[0]
    assert len(rows) == 0
    # OR ignores the unknown group
    rows, _ = imp.top_k_batch([[[reader.term_id("red")], [-1]]], 5, "OR")[0]
    assert len(rows) > 0
