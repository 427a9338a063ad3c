"""SQL-level vector + full-text search (the reference's
09_vector_index / 04_inverted_index sqllogictest behaviors)."""

import numpy as np
import pytest

from databend_tpu.errors import SemanticError


@pytest.fixture
def ctx(tmp_path):
    from databend_tpu.service.session import SessionContext
    return SessionContext(data_root=str(tmp_path))


@pytest.fixture
def vec_ctx(ctx):
    ctx.sql("CREATE TABLE docs (id BIGINT, body VARCHAR, emb VECTOR(8)) row_per_block='40'")
    ctx.sql("CREATE VECTOR INDEX iv ON docs(emb) m=8 ef_construct=32 distance='cosine,l2'")
    ctx.sql("CREATE INVERTED INDEX it ON docs(body) tokenizer='english'")
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(120, 8)).astype(np.float32)
    words = ["blue whale swimming", "red fox jumping", "green turtle diving",
             "blue bird flying", "red crab walking"]
    rows = ", ".join(
        f"({i}, '{words[i % 5]}', [{', '.join(str(float(v)) for v in emb[i])}])"
        for i in range(120))
    ctx.sql(f"INSERT INTO docs VALUES {rows}")
    return ctx, emb


def knn_ids(emb, q, k, metric):
    if metric == "cosine":
        qn = q / np.linalg.norm(q)
        xn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        d = 1 - xn @ qn
    else:
        d = np.linalg.norm(emb - q, axis=1)
    return np.argsort(d)[:k]


class TestVectorSQL:
    def test_knn_cosine(self, vec_ctx):
        ctx, emb = vec_ctx
        q = emb[7] + 0.001
        qs = "[" + ", ".join(str(float(v)) for v in q) + "]"
        r = ctx.sql(f"SELECT id FROM docs ORDER BY cosine_distance(emb, {qs}) ASC LIMIT 5")
        got = [x[0] for x in r.rows()]
        want = knn_ids(emb, q, 5, "cosine").tolist()
        assert got[0] == 7
        assert len(set(got) & set(want)) >= 4  # hnsw recall on tiny blocks

    def test_knn_l2_with_score_column(self, vec_ctx):
        ctx, emb = vec_ctx
        q = emb[13] + 0.001
        qs = "[" + ", ".join(str(float(v)) for v in q) + "]"
        r = ctx.sql(f"""SELECT id, l2_distance(emb, {qs}) AS d
                        FROM docs ORDER BY d ASC LIMIT 3""")
        rows = r.rows()
        assert rows[0][0] == 13
        want = float(np.linalg.norm(emb[13] - q))
        assert rows[0][1] == pytest.approx(want, rel=1e-3, abs=1e-4)
        assert rows[0][1] <= rows[1][1] <= rows[2][1]

    def test_knn_explain_shows_hnsw(self, vec_ctx):
        ctx, emb = vec_ctx
        qs = "[" + ", ".join(["0.1"] * 8) + "]"
        text = "\n".join(r[0] for r in ctx.sql(
            f"EXPLAIN SELECT id FROM docs ORDER BY cosine_distance(emb, {qs}) LIMIT 5").rows())
        assert "vector_index=iv" in text and "hnsw=on" in text

    def test_knn_with_filter_uses_brute_force(self, vec_ctx):
        ctx, emb = vec_ctx
        q = emb[3] + 0.001
        qs = "[" + ", ".join(str(float(v)) for v in q) + "]"
        r = ctx.sql(f"""SELECT id FROM docs WHERE id < 50
                        ORDER BY l2_distance(emb, {qs}) LIMIT 3""")
        got = [x[0] for x in r.rows()]
        assert got[0] == 3
        assert all(i < 50 for i in got)
        # exact semantics under filter: compare to numpy over the filtered set
        d = np.linalg.norm(emb[:50] - q, axis=1)
        assert got == np.argsort(d)[:3].tolist()

    def test_distance_desc_brute_force(self, vec_ctx):
        ctx, emb = vec_ctx
        qs = "[" + ", ".join(["0.0"] * 8) + "]"
        r = ctx.sql(f"SELECT id FROM docs ORDER BY l2_distance(emb, {qs}) DESC LIMIT 2")
        d = np.linalg.norm(emb, axis=1)
        assert [x[0] for x in r.rows()] == np.argsort(-d)[:2].tolist()

    def test_no_index_still_works(self, ctx):
        ctx.sql("CREATE TABLE nv (id INT, emb VECTOR(4))")
        ctx.sql("INSERT INTO nv VALUES (1, [1.0,0,0,0]), (2, [0,1.0,0,0]), (3, [0.9,0.1,0,0])")
        r = ctx.sql("SELECT id FROM nv ORDER BY cosine_distance(emb, [1.0,0,0,0]) LIMIT 2")
        assert [x[0] for x in r.rows()] == [1, 3]

    def test_dim_mismatch_error(self, vec_ctx):
        ctx, _ = vec_ctx
        with pytest.raises(SemanticError):
            ctx.sql("SELECT id FROM docs ORDER BY cosine_distance(emb, [1.0, 2.0]) LIMIT 1")

    def test_fuse_blocks_report_index_size(self, vec_ctx):
        ctx, _ = vec_ctx
        r = ctx.sql("SELECT sum(vector_index_size) FROM fuse_block('default', 'docs')")
        assert r.scalar() > 0


class TestSearchSQL:
    def test_match_filters(self, vec_ctx):
        ctx, _ = vec_ctx
        r = ctx.sql("SELECT count(*) FROM docs WHERE match(body, 'whale')")
        assert r.scalar() == 24  # 120 / 5
        r = ctx.sql("SELECT id FROM docs WHERE match(body, 'whale') ORDER BY id LIMIT 2")
        assert [x[0] for x in r.rows()] == [0, 5]

    def test_match_with_score(self, vec_ctx):
        ctx, _ = vec_ctx
        r = ctx.sql("""SELECT id, score() AS s FROM docs WHERE match(body, 'red fox')
                       ORDER BY s DESC, id LIMIT 3""")
        rows = r.rows()
        assert len(rows) == 3
        # 'red fox jumping' rows (i%5==1) outscore 'red crab' rows (one term)
        assert rows[0][0] % 5 == 1 and rows[0][1] > 0

    def test_match_and_operator(self, vec_ctx):
        ctx, _ = vec_ctx
        r = ctx.sql("SELECT count(*) FROM docs WHERE match(body, 'red crab', 'operator=AND')")
        assert r.scalar() == 24
        r = ctx.sql("SELECT count(*) FROM docs WHERE match(body, 'red crab')")
        assert r.scalar() == 48  # OR: fox rows + crab rows

    def test_query_syntax(self, vec_ctx):
        ctx, _ = vec_ctx
        r = ctx.sql("SELECT count(*) FROM docs WHERE query('body:blue AND whale')")
        assert r.scalar() == 24

    def test_fuzzy_match(self, vec_ctx):
        ctx, _ = vec_ctx
        r = ctx.sql("SELECT count(*) FROM docs WHERE match(body, 'whal', 'fuzziness=1')")
        assert r.scalar() == 24

    def test_hybrid_vector_and_text(self, vec_ctx):
        ctx, emb = vec_ctx
        q = emb[10] + 0.001  # id 10: 'blue whale swimming' (10%5==0)
        qs = "[" + ", ".join(str(float(v)) for v in q) + "]"
        r = ctx.sql(f"""SELECT id FROM docs WHERE match(body, 'whale')
                        ORDER BY l2_distance(emb, {qs}) LIMIT 3""")
        got = [x[0] for x in r.rows()]
        assert got[0] == 10
        assert all(i % 5 == 0 for i in got)


def test_links_format_compressed_through_sql(ctx):
    """links_format='compressed' stores bitpacked graph links; search
    results are unchanged (reference GraphLinksFormat::Compressed)."""
    import numpy as np
    ctx.sql("CREATE TABLE clf (id BIGINT, emb VECTOR(8))")
    ctx.sql("CREATE VECTOR INDEX cli ON clf(emb) m=8 ef_construct=32"
            " distance='l2' graphs='always' links_format='compressed'")
    rng = np.random.default_rng(11)
    emb = rng.normal(size=(60, 8)).astype(np.float32)
    rows = ", ".join(
        f"({i}, [{', '.join(str(float(v)) for v in emb[i])}])"
        for i in range(60))
    ctx.sql(f"INSERT INTO clf VALUES {rows}")
    q = emb[13] + 0.001
    qs = "[" + ", ".join(str(float(v)) for v in q) + "]"
    out = ctx.sql(f"SELECT id FROM clf ORDER BY l2_distance(emb, {qs})"
                  " LIMIT 3").rows()
    assert out[0][0] == 13
