import jax.numpy as jnp
import numpy as np
import pytest

from databend_tpu.index.hnsw import HnswGraph, build_hnsw, hnsw_search
from databend_tpu.index.hnsw.search import postprocess_scores
from databend_tpu.ops.distance import normalize


def brute_knn(q, x, k, metric):
    if metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        d = 1 - qn @ xn.T
    elif metric == "l2":
        d = np.sqrt(((q[:, None] - x[None]) ** 2).sum(-1))
    else:
        raise ValueError(metric)
    ids = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, ids, 1), ids


@pytest.fixture(scope="module")
def corpus(  ):
    rng = np.random.default_rng(7)
    # clustered data: harder for graphs than uniform
    centers = rng.normal(size=(20, 32)).astype(np.float32) * 3
    x = np.concatenate([
        c + rng.normal(size=(100, 32)).astype(np.float32) for c in centers])
    return x  # 2000 x 32


class TestBuild:
    def test_graph_shape_and_levels(self, corpus):
        g = build_hnsw(corpus, m=8, ef_construct=32, metric="l2", seed=1)
        assert g.num_points == 2000
        assert g.m0 == 16
        assert g.links[0].shape == (2000, 16)
        # every point has at least one link
        assert (g.links[0][:, 0] >= 0).all()
        # no self links
        own = np.arange(2000)[:, None]
        assert not (g.links[0] == own).any()
        # upper levels shrink geometrically-ish
        for l in range(1, g.num_levels):
            assert g.links[l].shape[0] == len(g.level_ids[l])
            assert g.links[l].shape[1] == 8
        assert len(g.entry_points) >= 1

    def test_serialization_roundtrip(self, corpus, tmp_path):
        g = build_hnsw(corpus[:500], m=8, ef_construct=32, metric="cosine", seed=2)
        p = str(tmp_path / "g.hnsw")
        size = g.save(p)
        assert size > 0
        g2 = HnswGraph.load(p)
        assert g2.metric == "cosine" and g2.m == 8
        np.testing.assert_array_equal(g2.links[0], g.links[0])
        np.testing.assert_array_equal(g2.entry_points, g.entry_points)
        for l in range(1, g.num_levels):
            np.testing.assert_array_equal(g2.level_ids[l], g.level_ids[l])

    def test_tiny_block(self):
        x = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
        g = build_hnsw(x, m=4, metric="l2")
        assert g.num_points == 5
        d, ids = hnsw_search(g, jnp.asarray(x), x[:2], k=3)
        assert ids[0, 0] == 0 and ids[1, 0] == 1  # self is nearest


class TestSearchRecall:
    @pytest.mark.parametrize("metric", ["l2", "cosine"])
    def test_recall_at_10(self, corpus, metric):
        g = build_hnsw(corpus, m=16, ef_construct=64, metric=metric, seed=3)
        rng = np.random.default_rng(11)
        q = corpus[rng.choice(2000, 50, replace=False)] + \
            0.05 * rng.normal(size=(50, 32)).astype(np.float32)
        x_dev = jnp.asarray(corpus if metric != "cosine"
                            else np.asarray(normalize(jnp.asarray(corpus))))
        d, ids = hnsw_search(g, x_dev, q, k=10)  # ef = 4k = 40
        _, want = brute_knn(q, corpus, 10, metric)
        recall = np.mean([
            len(set(ids[i].tolist()) & set(want[i].tolist())) / 10
            for i in range(len(q))])
        assert recall >= 0.95, f"recall@10 = {recall}"

    def test_scores_match_metric(self, corpus):
        g = build_hnsw(corpus, m=16, ef_construct=64, metric="l2", seed=3)
        q = corpus[:4]
        d, ids = hnsw_search(g, jnp.asarray(corpus), q, k=5)
        # distance of a point to itself must be ~0 and ranked first
        assert (ids[:, 0] == np.arange(4)).all()
        np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-3)
        # returned distances are real l2 distances
        for i in range(4):
            true_d = np.linalg.norm(corpus[ids[i, 1]] - q[i])
            np.testing.assert_allclose(d[i, 1], true_d, rtol=1e-3)

    def test_cosine_postprocess(self, corpus):
        g = build_hnsw(corpus, m=16, ef_construct=64, metric="cosine", seed=4)
        xn = np.asarray(normalize(jnp.asarray(corpus)))
        q = corpus[:3]
        d, ids = hnsw_search(g, jnp.asarray(xn), q, k=5)
        scores = postprocess_scores(d, "cosine")
        # self match: cosine distance ~ 0
        np.testing.assert_allclose(scores[:, 0], 0.0, atol=1e-3)
        assert (scores >= -1e-3).all() and (scores <= 2.001).all()


class TestCompressedLinks:
    """Bitpacked delta link serialization (reference
    GraphLinksFormat::Compressed, graph_links/serializer.rs:38)."""

    def _rows_as_sets(self, arr):
        return [frozenset(int(v) for v in row if v >= 0) for row in arr]

    def test_roundtrip_matches_plain(self, corpus, tmp_path):
        g = build_hnsw(corpus[:800], m=8, ef_construct=32, metric="l2",
                       seed=3)
        data_c = g.to_bytes("compressed")
        g2 = HnswGraph.from_bytes(data_c)
        assert g2.metric == g.metric and g2.m == g.m
        # decode canonicalizes neighbor order (sorted); compare as sets
        for l in range(g.num_levels):
            assert self._rows_as_sets(g2.links[l]) == \
                self._rows_as_sets(g.links[l])
            if l and g.level_ids[l] is not None:
                np.testing.assert_array_equal(g2.level_ids[l],
                                              g.level_ids[l])

    def test_compressed_is_smaller(self, corpus):
        g = build_hnsw(corpus[:800], m=8, ef_construct=32, metric="l2",
                       seed=3)
        plain = len(g.to_bytes("plain"))
        comp = len(g.to_bytes("compressed"))
        assert comp < plain, (comp, plain)

    def test_search_from_compressed(self, corpus):
        x = corpus[:800]
        g = build_hnsw(x, m=8, ef_construct=48, metric="l2", seed=4)
        g2 = HnswGraph.from_bytes(g.to_bytes("compressed"))
        q = x[:8] + 0.01
        x_dev = jnp.asarray(x)
        d1, i1 = hnsw_search(g, x_dev, q, k=5, ef=64)
        d2, i2 = hnsw_search(g2, x_dev, q, k=5, ef=64)
        # identical graphs (modulo row order) must agree on the top hit
        assert (np.asarray(i1)[:, 0] == np.asarray(i2)[:, 0]).all()

    def test_empty_rows(self):
        g = HnswGraph("l2", 4, 16, np.array([0], np.int32),
                      [np.full((3, 8), -1, np.int32)], [None])
        g2 = HnswGraph.from_bytes(g.to_bytes("compressed"))
        assert (g2.links[0] == -1).all()

    def test_unknown_format_rejected(self, corpus):
        g = build_hnsw(corpus[:100], m=4, metric="l2")
        with pytest.raises(ValueError):
            g.to_bytes("bitrot")
