"""Batched serving fast paths: filtered KNN and match() top-k.

VERDICT r4 item 2: BASELINE configs 3 (predicate + KNN) and 4 (full-text
BM25) as *product* numbers — prepared statements must serve WHERE-filtered
KNN and ``match() ... ORDER BY score() DESC LIMIT k`` in ONE batched
device program, matching the generic pipeline's results. Reference:
pushdown.rs:167-207 (filter+index pushdown), inverted_index_reader.rs:
108-150 (order_by_score).
"""

import numpy as np
import pytest

from databend_tpu.expression import Column, DataBlock
from databend_tpu.service.session import SessionContext
from databend_tpu.types import VectorType


@pytest.fixture
def ctx(tmp_path):
    c = SessionContext(str(tmp_path))
    yield c
    c.close()


def _vec(v):
    return "[" + ",".join(f"{f:.6f}" for f in v) + "]"


def _mk_filtered_table(c, n=3000, d=8, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    cats = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    price = rng.integers(0, 100, n).astype(np.int64)
    c.sql(f"CREATE TABLE ft (id BIGINT, cat VARCHAR, price BIGINT, "
          f"emb VECTOR({d}))")
    c.sql("CREATE VECTOR INDEX ft_v ON ft(emb) ASYNC distance='l2,cosine'")
    c.insert_block("ft", DataBlock(
        ["id", "cat", "price", "emb"],
        [Column.from_numpy(np.arange(n, dtype=np.int64)),
         Column.from_pylist(cats.tolist(), __import__(
             "databend_tpu.types", fromlist=["String"]).String),
         Column.from_numpy(price),
         Column.from_numpy(x, VectorType(d))]))
    return x, cats, price


# ------------------------------------------------------------- filtered KNN
def test_static_filter_matches_generic(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    q = x[7]
    ps = ctx.prepare("SELECT id FROM ft WHERE cat = 'a' "
                     "ORDER BY l2_distance(emb, ?) LIMIT 5")
    assert ps._knn is not None and ps._knn.has_filters
    got = ps.execute(list(map(float, q))).rows()
    want = ctx.sql(f"SELECT id FROM ft WHERE cat = 'a' "
                   f"ORDER BY l2_distance(emb, {_vec(q)}) LIMIT 5").rows()
    assert got == want
    # fast path actually engaged (static mask resident)
    assert ps._knn._static_mask is not None


def test_param_filter_string_eq(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    q = x[11]
    ps = ctx.prepare("SELECT id FROM ft WHERE cat = ? "
                     "ORDER BY l2_distance(emb, ?) LIMIT 5")
    for cat in ("a", "b", "c"):
        got = ps.execute(cat, list(map(float, q))).rows()
        want = ctx.sql(
            f"SELECT id FROM ft WHERE cat = '{cat}' "
            f"ORDER BY l2_distance(emb, {_vec(q)}) LIMIT 5").rows()
        assert got == want, cat


def test_param_filter_numeric_range_batch(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    qs = x[[5, 17, 42]]
    ps = ctx.prepare("SELECT id FROM ft WHERE price < ? "
                     "ORDER BY l2_distance(emb, ?) LIMIT 4")
    sets = [(int(t), list(map(float, q))) for t, q in zip((10, 50, 90), qs)]
    got = ps.execute_batch(sets)
    for (t, _), res, q in zip(sets, got, qs):
        want = ctx.sql(
            f"SELECT id FROM ft WHERE price < {t} "
            f"ORDER BY l2_distance(emb, {_vec(q)}) LIMIT 4").rows()
        assert res.rows() == want


def test_filter_fewer_than_k_rows(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    q = x[0]
    # price < 1 matches only price == 0 rows (few); LIMIT is larger
    ps = ctx.prepare("SELECT id FROM ft WHERE price < ? "
                     "ORDER BY l2_distance(emb, ?) LIMIT 50")
    got = ps.execute(1, list(map(float, q))).rows()
    want = ctx.sql(
        f"SELECT id FROM ft WHERE price < 1 "
        f"ORDER BY l2_distance(emb, {_vec(q)}) LIMIT 50").rows()
    assert got == want
    assert 0 < len(got) < 50


def test_filter_no_match_returns_empty(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    q = x[0]
    ps = ctx.prepare("SELECT id FROM ft WHERE cat = ? "
                     "ORDER BY l2_distance(emb, ?) LIMIT 5")
    assert ps.execute("zzz", list(map(float, q))).rows() == []


def test_combined_static_and_param_filters(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    q = x[23]
    ps = ctx.prepare(
        "SELECT id, l2_distance(emb, ?) FROM ft "
        "WHERE cat = 'b' AND price >= ? "
        "ORDER BY l2_distance(emb, ?) LIMIT 6")
    got = ps.execute(list(map(float, q)), 40, list(map(float, q)))
    want = ctx.sql(
        f"SELECT id, l2_distance(emb, {_vec(q)}) FROM ft "
        f"WHERE cat = 'b' AND price >= 40 "
        f"ORDER BY l2_distance(emb, {_vec(q)}) LIMIT 6")
    gr, wr = got.rows(), want.rows()
    assert [r[0] for r in gr] == [r[0] for r in wr]
    np.testing.assert_allclose([r[1] for r in gr], [r[1] for r in wr],
                               rtol=1e-4)


def test_filtered_batch_block_mode(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    qs = x[[3, 9]]
    ps = ctx.prepare("SELECT id FROM ft WHERE cat = ? "
                     "ORDER BY l2_distance(emb, ?) LIMIT 3")
    blk = ps.execute_batch_block(
        [("a", list(map(float, qs[0]))), ("b", list(map(float, qs[1])))])
    rows = blk.rows()
    assert rows and rows[0][0] == 0           # query_index column leads
    per_q = ps.execute_batch(
        [("a", list(map(float, qs[0]))), ("b", list(map(float, qs[1])))])
    flat = [(qi, r[0]) for qi, res in enumerate(per_q)
            for r in res.rows()]
    assert [(r[0], r[1]) for r in rows] == flat


def test_unsupported_filter_falls_back(ctx):
    x, cats, price = _mk_filtered_table(ctx)
    q = x[1]
    # OR of a parameterized conjunct is outside the fast-path grammar
    ps = ctx.prepare("SELECT id FROM ft WHERE cat = ? OR price < 5 "
                     "ORDER BY l2_distance(emb, ?) LIMIT 5")
    assert ps._knn is None    # shape rejected at prepare
    got = ps.execute("a", list(map(float, q))).rows()
    want = ctx.sql(
        f"SELECT id FROM ft WHERE cat = 'a' OR price < 5 "
        f"ORDER BY l2_distance(emb, {_vec(q)}) LIMIT 5").rows()
    assert got == want


# ------------------------------------------------------------- match() path
def _mk_text_table(c, n=600, seed=5):
    words = ["weather", "news", "google", "maps", "cat", "videos",
             "python", "flights", "hotels", "music"]
    rng = np.random.default_rng(seed)
    texts = [" ".join(np.array(words)[rng.integers(0, len(words),
                                                   rng.integers(2, 6))])
             for _ in range(n)]
    c.sql("CREATE TABLE mt (id BIGINT, body VARCHAR)")
    c.sql("CREATE INVERTED INDEX mt_i ON mt(body)")
    from databend_tpu.types import String
    c.insert_block("mt", DataBlock(
        ["id", "body"],
        [Column.from_numpy(np.arange(n, dtype=np.int64)),
         Column.from_pylist(texts, String)]))
    return texts


def test_match_server_matches_generic(ctx, monkeypatch):
    from databend_tpu.service.prepared import _MatchServer
    monkeypatch.setattr(_MatchServer, "DEVICE_MIN_DOCS", 0)
    _mk_text_table(ctx)
    ps = ctx.prepare("SELECT id, score() FROM mt WHERE match(body, ?) "
                     "ORDER BY score() DESC LIMIT 7")
    assert ps._match is not None
    for qtext in ("weather news", "python", "cat videos maps"):
        got = ps.execute(qtext)
        want = ctx.sql(
            f"SELECT id, score() FROM mt WHERE match(body, '{qtext}') "
            f"ORDER BY score() DESC LIMIT 7")
        gr, wr = got.rows(), want.rows()
        assert [r[0] for r in gr] == [r[0] for r in wr], qtext
        np.testing.assert_allclose([r[1] for r in gr],
                                   [r[1] for r in wr], rtol=1e-4)


def test_match_server_batch(ctx, monkeypatch):
    from databend_tpu.service.prepared import _MatchServer
    monkeypatch.setattr(_MatchServer, "DEVICE_MIN_DOCS", 0)
    _mk_text_table(ctx)
    ps = ctx.prepare("SELECT id FROM mt WHERE match(body, ?) "
                     "ORDER BY score() DESC LIMIT 5")
    texts = ["weather", "news google", "hotels flights music"]
    got = ps.execute_batch(texts)
    for t, res in zip(texts, got):
        want = ctx.sql(
            f"SELECT id FROM mt WHERE match(body, '{t}') "
            f"ORDER BY score() DESC LIMIT 5").rows()
        assert res.rows() == want, t


def test_match_operator_and(ctx, monkeypatch):
    from databend_tpu.service.prepared import _MatchServer
    monkeypatch.setattr(_MatchServer, "DEVICE_MIN_DOCS", 0)
    _mk_text_table(ctx)
    ps = ctx.prepare(
        "SELECT id FROM mt WHERE match(body, ?, 'operator=AND') "
        "ORDER BY score() DESC LIMIT 5")
    t = "weather news"
    got = ps.execute(t).rows()
    want = ctx.sql(
        f"SELECT id FROM mt WHERE match(body, '{t}', 'operator=AND') "
        f"ORDER BY score() DESC LIMIT 5").rows()
    assert got == want


def test_match_phrase_falls_back(ctx, monkeypatch):
    from databend_tpu.service.prepared import _MatchServer
    monkeypatch.setattr(_MatchServer, "DEVICE_MIN_DOCS", 0)
    _mk_text_table(ctx)
    ps = ctx.prepare("SELECT id FROM mt WHERE match(body, ?) "
                     "ORDER BY score() DESC LIMIT 5")
    t = '"weather news"'
    got = ps.execute(t).rows()
    want = ctx.sql(
        f"SELECT id FROM mt WHERE match(body, '{t}') "
        f"ORDER BY score() DESC LIMIT 5".replace(f"'{t}'",
                                                 "'\"weather news\"'")).rows()
    assert got == want


def test_match_below_device_threshold_uses_generic(ctx):
    _mk_text_table(ctx, n=50)
    ps = ctx.prepare("SELECT id FROM mt WHERE match(body, ?) "
                     "ORDER BY score() DESC LIMIT 3")
    got = ps.execute("weather").rows()
    want = ctx.sql("SELECT id FROM mt WHERE match(body, 'weather') "
                   "ORDER BY score() DESC LIMIT 3").rows()
    assert got == want


# ------------------------------------------------------------- fused path
def _mk_fused_table(c, n=800, d=8, seed=9):
    words = ["weather", "news", "google", "maps", "cat", "videos",
             "python", "flights"]
    rng = np.random.default_rng(seed)
    texts = [" ".join(np.array(words)[rng.integers(0, len(words),
                                                   rng.integers(2, 5))])
             for _ in range(n)]
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    c.sql(f"CREATE TABLE fu (id BIGINT, body VARCHAR, emb VECTOR({d}))")
    c.sql("CREATE INVERTED INDEX fu_i ON fu(body)")
    from databend_tpu.types import String
    c.insert_block("fu", DataBlock(
        ["id", "body", "emb"],
        [Column.from_numpy(np.arange(n, dtype=np.int64)),
         Column.from_pylist(texts, String),
         Column.from_numpy(emb, VectorType(d))]))
    return texts, emb


def test_fused_matches_generic(ctx, monkeypatch):
    from databend_tpu.service.prepared import _MatchServer
    monkeypatch.setattr(_MatchServer, "DEVICE_MIN_DOCS", 0)
    texts, emb = _mk_fused_table(ctx)
    ps = ctx.prepare(
        "SELECT id FROM fu WHERE match(body, ?) "
        "ORDER BY 0.04 * score() - cosine_distance(emb, ?) DESC LIMIT 6")
    assert ps._match is not None and ps._match.shape.fused
    rng = np.random.default_rng(1)
    for qtext in ("weather news", "cat", "python maps"):
        qv = emb[rng.integers(0, len(emb))]
        got = ps.execute(qtext, list(map(float, qv))).rows()
        want = ctx.sql(
            f"SELECT id FROM fu WHERE match(body, '{qtext}') "
            f"ORDER BY 0.04 * score() - cosine_distance(emb, {_vec(qv)}) "
            f"DESC LIMIT 6").rows()
        assert got == want, qtext


def test_fused_batch_asc_order(ctx, monkeypatch):
    from databend_tpu.service.prepared import _MatchServer
    monkeypatch.setattr(_MatchServer, "DEVICE_MIN_DOCS", 0)
    texts, emb = _mk_fused_table(ctx)
    # ASC over cos - w*score() is the same ranking, exercised as a batch
    ps = ctx.prepare(
        "SELECT id FROM fu WHERE match(body, ?) "
        "ORDER BY cosine_distance(emb, ?) - 0.04 * score() ASC LIMIT 5")
    assert ps._match is not None and ps._match.shape.fused
    rng = np.random.default_rng(2)
    qs = [("weather", emb[rng.integers(0, len(emb))]),
          ("news google", emb[rng.integers(0, len(emb))])]
    out = ps.execute_batch([(t, list(map(float, v))) for t, v in qs])
    for (t, v), res in zip(qs, out):
        want = ctx.sql(
            f"SELECT id FROM fu WHERE match(body, '{t}') "
            f"ORDER BY cosine_distance(emb, {_vec(v)}) - 0.04 * score() "
            f"ASC LIMIT 5").rows()
        assert res.rows() == want, t
