"""Prepared/parameterized statements + batched KNN serving.

Reference contrast: the reference re-plans every request
(servers/http/v1/query/execute_state.rs:401); here PREPARE binds once and
EXECUTE substitutes parameters, and the canonical KNN shape serves a whole
batch of query vectors as ONE device program (service/prepared.py).
"""

import numpy as np
import pytest

from databend_tpu.errors import BadArguments
from databend_tpu.expression import Column, DataBlock
from databend_tpu.service.session import SessionContext
from databend_tpu.sql import ast as A
from databend_tpu.sql.parser import Parser, parse_sql
from databend_tpu.types import VectorType


@pytest.fixture
def ctx(tmp_path):
    c = SessionContext(str(tmp_path))
    yield c
    c.close()


def _vec_table(c, n=2000, d=8, seed=0, name="vt"):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    c.sql(f"CREATE TABLE {name} (id BIGINT, emb VECTOR({d}))")
    c.sql(f"CREATE VECTOR INDEX {name}_v ON {name}(emb) ASYNC "
          f"distance='l2,cosine'")
    c.insert_block(name, DataBlock(
        ["id", "emb"],
        [Column.from_numpy(np.arange(n, dtype=np.int64)),
         Column.from_numpy(x, VectorType(d))]))
    return x


def _lit(v):
    return "[" + ",".join(f"{f:.6f}" for f in v) + "]"


# ------------------------------------------------------------------- parser
def test_parse_prepare_execute_deallocate():
    st = parse_sql("PREPARE p FROM 'SELECT ?'")
    assert isinstance(st, A.PrepareStmt) and st.sql == "SELECT ?"
    st = parse_sql("EXECUTE p USING (1, 'a')")
    assert isinstance(st, A.ExecutePrepared) and len(st.params) == 2
    st = parse_sql("EXECUTE p USING 1, 2")
    assert len(st.params) == 2
    st = parse_sql("EXECUTE p")
    assert st.params == []
    st = parse_sql("DEALLOCATE PREPARE p")
    assert isinstance(st, A.DeallocateStmt) and st.name == "p"
    st = parse_sql("DEALLOCATE p")
    assert st.name == "p"


def test_placeholder_indices_are_positional():
    p = Parser("SELECT * FROM t WHERE a = ? AND b > ?")
    p.parse()
    assert p.param_count == 2


# ----------------------------------------------------------- generic params
def test_generic_prepared_matches_literal(ctx):
    ctx.sql("CREATE TABLE g (a INT, b VARCHAR)")
    ctx.sql("INSERT INTO g VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    ps = ctx.prepare("SELECT b FROM g WHERE a >= ? ORDER BY a")
    assert ps.param_count == 1
    assert ps.execute(2).rows() == ctx.sql(
        "SELECT b FROM g WHERE a >= 2 ORDER BY a").rows()
    # re-execution with different params (no re-parse)
    assert ps.execute(3).rows() == [("z",)]
    with pytest.raises(BadArguments):
        ps.execute(1, 2)


def test_sql_level_prepare_execute(ctx):
    ctx.sql("CREATE TABLE s (a INT)")
    ctx.sql("INSERT INTO s VALUES (10), (20), (30)")
    ctx.sql("PREPARE q FROM 'SELECT count(*) FROM s WHERE a > ?'")
    assert ctx.sql("EXECUTE q USING (15)").rows() == [(2,)]
    assert ctx.sql("EXECUTE q USING (-5)").rows() == [(3,)]
    ctx.sql("DEALLOCATE PREPARE q")
    with pytest.raises(BadArguments):
        ctx.sql("EXECUTE q USING (15)")
    with pytest.raises(BadArguments):
        ctx.sql("EXECUTE nope")


def test_negative_constant_param(ctx):
    ctx.sql("CREATE TABLE neg (a INT)")
    ctx.sql("INSERT INTO neg VALUES (-3), (4)")
    ctx.sql("PREPARE n FROM 'SELECT count(*) FROM neg WHERE a < ?'")
    assert ctx.sql("EXECUTE n USING (-1)").rows() == [(1,)]


# ------------------------------------------------------------- KNN fast path
def test_knn_fast_path_matches_literal_sql(ctx):
    x = _vec_table(ctx)
    rng = np.random.default_rng(7)
    q = rng.standard_normal(8).astype(np.float32)
    ps = ctx.prepare("SELECT id FROM vt ORDER BY l2_distance(emb, ?) LIMIT 5")
    assert ps._knn is not None  # shape recognized
    ref = ctx.sql(
        f"SELECT id FROM vt ORDER BY l2_distance(emb, {_lit(q)}) LIMIT 5")
    got = ps.execute(q.tolist())
    assert [r[0] for r in got.rows()] == [r[0] for r in ref.rows()]


def test_knn_cosine_and_score_item(ctx):
    _vec_table(ctx)
    rng = np.random.default_rng(3)
    q = rng.standard_normal(8).astype(np.float32)
    ps = ctx.prepare("SELECT id, cosine_distance(emb, ?) AS d FROM vt "
                     "ORDER BY cosine_distance(emb, ?) LIMIT 4")
    got = ps.execute(q.tolist(), q.tolist())
    ref = ctx.sql(f"SELECT id, cosine_distance(emb, {_lit(q)}) AS d FROM vt "
                  f"ORDER BY cosine_distance(emb, {_lit(q)}) LIMIT 4")
    assert [r[0] for r in got.rows()] == [r[0] for r in ref.rows()]
    for (_, a), (_, b) in zip(got.rows(), ref.rows()):
        assert abs(a - b) < 1e-4


def test_knn_batch_one_dispatch_matches_per_query(ctx):
    _vec_table(ctx)
    rng = np.random.default_rng(11)
    Q = rng.standard_normal((16, 8)).astype(np.float32)
    ps = ctx.prepare("SELECT id FROM vt ORDER BY l2_distance(emb, ?) LIMIT 3")
    outs = ps.execute_batch(Q)
    assert len(outs) == 16
    for b in (0, 7, 15):
        ref = ctx.sql(f"SELECT id FROM vt ORDER BY "
                      f"l2_distance(emb, {_lit(Q[b])}) LIMIT 3")
        assert [r[0] for r in outs[b].rows()] == [r[0] for r in ref.rows()]


def test_knn_snapshot_invalidation(ctx):
    _vec_table(ctx, n=500)
    ps = ctx.prepare("SELECT id FROM vt ORDER BY l2_distance(emb, ?) LIMIT 1")
    target = np.full(8, 9.0, np.float32)
    before = ps.execute(target.tolist()).rows()
    # insert an exact-match row; the prepared server must see the new
    # snapshot on the next execute
    ctx.insert_block("vt", DataBlock(
        ["id", "emb"],
        [Column.from_numpy(np.asarray([777], np.int64)),
         Column.from_numpy(target[None, :], VectorType(8))]))
    after = ps.execute(target.tolist()).rows()
    assert after[0][0] == 777 and before[0][0] != 777


def test_knn_fallback_without_index(ctx):
    # no vector index -> generic substitute-and-execute path; results
    # still correct
    rng = np.random.default_rng(5)
    x = rng.standard_normal((200, 4)).astype(np.float32)
    ctx.sql("CREATE TABLE ni (id BIGINT, emb VECTOR(4))")
    ctx.insert_block("ni", DataBlock(
        ["id", "emb"],
        [Column.from_numpy(np.arange(200, dtype=np.int64)),
         Column.from_numpy(x, VectorType(4))]))
    q = rng.standard_normal(4).astype(np.float32)
    ps = ctx.prepare("SELECT id FROM ni ORDER BY l2_distance(emb, ?) LIMIT 3")
    got = [r[0] for r in ps.execute(q.tolist()).rows()]
    d = np.linalg.norm(x - q, axis=1)
    assert got == np.argsort(d)[:3].tolist()


def test_knn_dim_mismatch_raises(ctx):
    _vec_table(ctx)
    ps = ctx.prepare("SELECT id FROM vt ORDER BY l2_distance(emb, ?) LIMIT 3")
    from databend_tpu.errors import DatabendError
    with pytest.raises(DatabendError):
        ps.execute([1.0, 2.0])  # dim 2 vs 8


def test_knn_star_projection(ctx):
    _vec_table(ctx, n=100)
    rng = np.random.default_rng(2)
    q = rng.standard_normal(8).astype(np.float32)
    ps = ctx.prepare("SELECT * FROM vt ORDER BY l2_distance(emb, ?) LIMIT 2")
    got = ps.execute(q.tolist())
    ref = ctx.sql(
        f"SELECT * FROM vt ORDER BY l2_distance(emb, {_lit(q)}) LIMIT 2")
    assert [r[0] for r in got.rows()] == [r[0] for r in ref.rows()]
    assert got.column_names == ref.column_names


def test_knn_batch_block_mode(ctx):
    """Bulk-serving mode: one result block with query_index, rows ordered
    (query b, rank asc), identical ids to per-result-set mode."""
    _vec_table(ctx)
    rng = np.random.default_rng(21)
    Q = rng.standard_normal((8, 8)).astype(np.float32)
    ps = ctx.prepare("SELECT id FROM vt ORDER BY l2_distance(emb, ?) LIMIT 3")
    blk = ps.execute_batch_block(Q)
    assert blk.column_names == ["query_index", "id"]
    assert blk.block.num_rows == 8 * 3
    per = ps.execute_batch(Q)
    rows = blk.rows()
    for b in range(8):
        ids_block = [rows[b * 3 + j][1] for j in range(3)]
        ids_per = [r[0] for r in per[b].rows()]
        assert ids_block == ids_per
        assert all(rows[b * 3 + j][0] == b for j in range(3))


def test_batch_block_requires_knn_shape(ctx):
    ctx.sql("CREATE TABLE nb (a INT)")
    ps = ctx.prepare("SELECT a FROM nb WHERE a = ?")
    with pytest.raises(BadArguments):
        ps.execute_batch_block([[1.0, 2.0]])
