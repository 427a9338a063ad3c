"""Distributed (mesh-sharded) exact vector search through the SQL path."""

import numpy as np

import jax


def test_distributed_exact_scan_matches_single(tmp_catalog, rng, monkeypatch):
    assert jax.device_count() == 8  # virtual CPU mesh from conftest
    c = tmp_catalog
    c.sql("CREATE TABLE dv (id BIGINT, emb VECTOR(16)) ROW_PER_BLOCK='64'")
    x = rng.standard_normal((512, 16)).astype(np.float32)
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import VectorType
    c.insert_block("dv", DataBlock(
        ["id", "emb"],
        [Column.from_numpy(np.arange(512, dtype=np.int64)),
         Column.from_numpy(x, VectorType(16))]))
    # index created AFTER the writes -> blocks have no HNSW graphs, the
    # KNN rewrite still fires and the scan goes down the exact-scan path
    c.sql("CREATE VECTOR INDEX dvi ON dv(emb) ASYNC distance='l2,cosine'")

    q = x[7] + 0.001
    qlit = "[" + ",".join(f"{v:.6f}" for v in q) + "]"

    # spy: the distributed path must actually run
    from databend_tpu.storage.fuse.pruning import pruner as prmod
    calls = {"n": 0}
    orig = prmod.FusePruner._vector_prune_distributed

    def spy(self, blocks, info, qq, limit):
        r = orig(self, blocks, info, qq, limit)
        if r is not None:
            calls["n"] += 1
        return r

    monkeypatch.setattr(prmod.FusePruner, "_vector_prune_distributed", spy)

    # small corpora route to the host scan by default; force the mesh path
    c.sql("SET vector_host_scan_max_rows = 0")
    rows = c.sql(f"SELECT id FROM dv ORDER BY l2_distance(emb, {qlit}) LIMIT 5").rows()
    assert calls["n"] == 1
    assert rows[0][0] == 7

    # exact reference for the full top-5
    dd = np.linalg.norm(x - q, axis=1)
    ref = np.argsort(dd)[:5].tolist()
    assert [r[0] for r in rows] == ref

    # cosine goes through normalize + ip on the mesh
    rows = c.sql(f"SELECT id FROM dv ORDER BY cosine_distance(emb, {qlit}) LIMIT 3").rows()
    assert calls["n"] == 2
    xs = x / np.linalg.norm(x, axis=1, keepdims=True)
    qs = q / np.linalg.norm(q)
    ref = np.argsort(1 - xs @ qs)[:3].tolist()
    assert [r[0] for r in rows] == ref


def test_distributed_disabled_by_setting(tmp_catalog, rng, monkeypatch):
    c = tmp_catalog
    c.sql("SET enable_distributed_pruning = 0")
    c.sql("CREATE TABLE dv2 (id BIGINT, emb VECTOR(8))")
    x = rng.standard_normal((64, 8)).astype(np.float32)
    from databend_tpu.expression import Column, DataBlock
    from databend_tpu.types import VectorType
    c.insert_block("dv2", DataBlock(
        ["id", "emb"], [Column.from_numpy(np.arange(64, dtype=np.int64)),
                        Column.from_numpy(x, VectorType(8))]))
    c.sql("CREATE VECTOR INDEX dv2i ON dv2(emb) ASYNC distance='l2'")

    from databend_tpu.storage.fuse.pruning import pruner as prmod
    def boom(self, blocks, info, qq, limit):
        raise AssertionError("distributed path must not run")
    monkeypatch.setattr(prmod.FusePruner, "_vector_prune_distributed", boom)
    qlit = "[" + ",".join(f"{v:.6f}" for v in x[3]) + "]"
    rows = c.sql(f"SELECT id FROM dv2 ORDER BY l2_distance(emb, {qlit}) LIMIT 1").rows()
    assert rows[0][0] == 3
