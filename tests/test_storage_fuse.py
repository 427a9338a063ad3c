import numpy as np
import pytest

from databend_tpu.catalog import Catalog, PushDownInfo, TableInfo, VectorIndexInfo
from databend_tpu.catalog.catalog import TableIndexDef
from databend_tpu.catalog.pushdown import InvertedIndexInfo, Range
from databend_tpu.errors import TableVersionMismatched, UnknownTable
from databend_tpu.expression import Column, DataBlock, DataField, TableSchema
from databend_tpu.expression.expr import BoundColumn, Constant, Func
from databend_tpu.meta import MetaStore
from databend_tpu.storage.fuse import FuseTable
from databend_tpu.types import Boolean, Float64, Int64, String, VectorType


@pytest.fixture
def catalog(tmp_path):
    return Catalog(MetaStore(str(tmp_path / "meta.db")))


def make_table(catalog, tmp_path, with_indexes=True, rpb=100):
    schema = TableSchema([
        DataField("id", Int64),
        DataField("title", String),
        DataField("price", Float64),
        DataField("emb", VectorType(8)),
    ])
    info = TableInfo(0, "default", "t1", schema, options={"row_per_block": str(rpb)})
    if with_indexes:
        info.indexes["iv"] = TableIndexDef("iv", "VECTOR", ["emb"],
                                           {"distance": "l2,cosine", "m": "8",
                                            "ef_construct": "32"})
        info.indexes["it"] = TableIndexDef("it", "INVERTED", ["title"],
                                           {"tokenizer": "english"})
    info = catalog.create_table(info)
    return FuseTable(info, catalog, str(tmp_path / "data"))


def sample_block(n=250, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, 8)).astype(np.float32)
    words = ["red apple pie", "green pear tart", "yellow banana bread",
             "fresh apple juice", "stale old crust"]
    return DataBlock(
        ["id", "title", "price", "emb"],
        [Column.from_pylist(list(range(n)), Int64),
         Column.from_pylist([words[i % 5] for i in range(n)], String),
         Column.from_pylist([float(i) for i in range(n)], Float64),
         Column.from_numpy(emb, VectorType(8))]), emb


class TestWriteRead:
    def test_append_and_snapshot(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path)
        block, _ = sample_block()
        snap = t.append(block)
        assert snap.row_count == 250
        assert snap.block_count == 3  # 100+100+50
        assert snap.index_size > 0
        # append again: snapshot chains
        snap2 = t.append(sample_block(seed=1)[0])
        assert snap2.row_count == 500
        assert snap2.prev_snapshot == snap.snapshot_id
        # time travel: old snapshot still readable
        old = t.read_snapshot(snap.snapshot_id)
        assert old.row_count == 250

    def test_block_roundtrip(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path, with_indexes=False)
        block, emb = sample_block(50)
        t.append(block)
        parts, _ = t.read_partitions()
        assert len(parts) == 1
        got = t.read_block(parts[0].meta)
        assert got.column("id").to_pylist() == list(range(50))
        assert got.column("title").get(0) == "red apple pie"
        np.testing.assert_allclose(got.column("emb").numpy(), emb, rtol=1e-6)

    def test_truncate_and_overwrite(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path, with_indexes=False)
        t.append(sample_block(30)[0])
        t.truncate()
        assert t.read_snapshot().row_count == 0
        t.append(sample_block(10)[0], overwrite=True)
        assert t.read_snapshot().row_count == 10


class TestPruning:
    def _expr_gt(self, col, val):
        return Func("gt", [BoundColumn(col, Float64), Constant(val, Float64)], Boolean)

    def test_range_prune(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path, with_indexes=False)
        t.append(sample_block(250)[0])  # 3 blocks: price 0-99, 100-199, 200-249
        parts, stats = t.read_partitions(PushDownInfo(filters=self._expr_gt("price", 150.0)))
        assert stats.blocks_before == 3
        assert len(parts) == 2

    def test_bloom_prune(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path, with_indexes=False)
        t.append(sample_block(250)[0])
        eq = Func("eq", [BoundColumn("id", Int64), Constant(1000000, Int64)], Boolean)
        parts, stats = t.read_partitions(PushDownInfo(filters=eq))
        # id=1000000 is outside every range: range prune already kills all
        assert len(parts) == 0
        # in-range but absent value: 150 exists; check bloom keeps real values
        eq2 = Func("eq", [BoundColumn("id", Int64), Constant(150, Int64)], Boolean)
        parts, _ = t.read_partitions(PushDownInfo(filters=eq2))
        assert len(parts) == 1

    def test_limit_prune(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path, with_indexes=False)
        t.append(sample_block(250)[0])
        parts, _ = t.read_partitions(PushDownInfo(limit=120))
        assert len(parts) == 2

    def test_topn_prune(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path, with_indexes=False)
        t.append(sample_block(250)[0])
        pd = PushDownInfo(limit=10, order_by=[Range("price", asc=True)])
        parts, _ = t.read_partitions(pd)
        assert len(parts) == 1  # first block covers smallest 10 prices
        pd = PushDownInfo(limit=10, order_by=[Range("price", asc=False)])
        parts, _ = t.read_partitions(pd)
        assert len(parts) == 1


class TestVectorSearch:
    def test_hnsw_prune_topk(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path)
        block, emb = sample_block(250)
        t.append(block)
        q = emb[42] + 0.001
        pd = PushDownInfo(
            limit=5,
            vector_index=VectorIndexInfo("iv", "emb", "l2_distance", q.tolist()),
            order_by=[Range("_vector_score", asc=True)])
        parts, stats = t.read_partitions(pd)
        assert stats.blocks_before == 3
        rows = [(p.meta, r, s) for p in parts for (r, s) in p.vector_scores]
        assert len(rows) == 5
        best = min(rows, key=lambda x: x[2])
        # global row 42 lives in block 0 at local row 42
        got_block = t.read_block(best[0])
        assert got_block.column("id").get(best[1]) == 42
        # exact: score == l2 distance
        want = float(np.linalg.norm(emb[42] - q))
        np.testing.assert_allclose(best[2], want, rtol=1e-3, atol=1e-4)

    def test_cosine_index_and_stats_prune(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path)
        rng = np.random.default_rng(5)
        # two well-separated clusters in different blocks
        a = rng.normal(size=(100, 8)).astype(np.float32) + 20
        b = rng.normal(size=(100, 8)).astype(np.float32) - 20
        emb = np.concatenate([a, b])
        blk = DataBlock(
            ["id", "title", "price", "emb"],
            [Column.from_pylist(list(range(200)), Int64),
             Column.from_pylist(["x"] * 200, String),
             Column.from_pylist([0.0] * 200, Float64),
             Column.from_numpy(emb, VectorType(8))])
        t.append(blk)
        q = (a[0] + 0.01).tolist()
        pd = PushDownInfo(limit=3, vector_index=VectorIndexInfo("iv", "emb", "l2_distance", q))
        parts, stats = t.read_partitions(pd)
        # stats prune should drop the far cluster's block
        assert stats.blocks_vector_stats_after == 1
        assert len(parts) == 1


class TestInverted:
    def test_match_prune_and_scores(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path)
        t.append(sample_block(250)[0])
        info = InvertedIndexInfo("it", ["title"], "banana", has_score=True)
        parts, _ = t.read_partitions(PushDownInfo(inverted_index=info))
        # every block contains banana rows (i%5==2)
        assert len(parts) == 3
        rows = parts[0].matched_rows
        assert all(r % 5 == 2 for r in rows)
        assert all(s > 0 for s in parts[0].matched_scores)

    def test_match_no_hit_prunes_blocks(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path)
        t.append(sample_block(250)[0])
        info = InvertedIndexInfo("it", ["title"], "zebra")
        parts, _ = t.read_partitions(PushDownInfo(inverted_index=info))
        assert len(parts) == 0

    def test_query_syntax_and(self, catalog, tmp_path):
        t = make_table(catalog, tmp_path)
        t.append(sample_block(250)[0])
        info = InvertedIndexInfo("it", ["title"], "apple AND juice", is_match=False)
        parts, _ = t.read_partitions(PushDownInfo(inverted_index=info))
        rows = [r for p in parts for r in p.matched_rows]
        assert rows and all(r % 5 == 3 for r in rows)


class TestCommitOCC:
    def test_version_mismatch_retry(self, catalog, tmp_path):
        t1 = make_table(catalog, tmp_path, with_indexes=False)
        t2 = FuseTable(t1.info, catalog, str(tmp_path / "data"))
        t1.append(sample_block(10)[0])
        t2.append(sample_block(10, seed=2)[0])  # re-bases, no exception
        assert t1.read_snapshot().row_count == 20
