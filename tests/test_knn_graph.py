"""knn_graph / knn_graph_lsh: exact tiled kNN graph + LSH scale path."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_tbl(n=300, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1)), dim).cast(pa.list_(pa.float32())),
    })


def _brute_knn(tbl, k):
    m = np.stack([np.asarray(v) for v in tbl["embedding"].to_pylist()])
    m = m.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    ids = tbl["vec_id"].to_numpy()
    out = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:k]
        out[int(ids[i])] = [(int(ids[j]), sims[i, j]) for j in order]
    return out


class TestKnnGraphExact:
    @pytest.mark.parametrize("block_rows", [64, 1000])
    def test_matches_brute_force(self, ray_session, block_rows):
        import ray.data as rd
        from mircv_ray.ops import knn_graph
        tbl = _emb_tbl()
        out = (knn_graph(rd.from_arrow(tbl).repartition(3), k=5,
                         block_rows=block_rows)
               .to_pandas().sort_values(["src", "cosine", "dst"],
                                        ascending=[True, False, True]))
        want = _brute_knn(tbl, 5)
        assert len(out) == 300 * 5
        for src, g in out.groupby("src"):
            expect = want[src]
            assert list(g.dst) == [d for d, _ in expect]
            np.testing.assert_allclose(
                g.cosine, [s for _, s in expect], atol=1e-12)

    def test_k_larger_than_n(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import knn_graph
        tbl = _emb_tbl(n=4)
        out = knn_graph(rd.from_arrow(tbl), k=10).to_pandas()
        # every vector gets all n-1 others
        assert len(out) == 4 * 3
        assert set(out.groupby("src").size()) == {3}


class TestKnnGraphLsh:
    def test_subset_of_valid_edges_with_exact_scores(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import knn_graph_lsh
        tbl = _emb_tbl(n=200)
        out = knn_graph_lsh(rd.from_arrow(tbl), k=5,
                            bands=16).to_pandas()
        assert (out.groupby("src").size() <= 5).all()
        # every emitted cosine is the true cosine
        m = np.stack([np.asarray(v)
                      for v in tbl["embedding"].to_pylist()]).astype(
                          np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        got = sims[out.src.to_numpy(), out.dst.to_numpy()]
        np.testing.assert_allclose(out.cosine, got, atol=1e-12)
        assert (out.src != out.dst).all()

    def test_recall_on_planted_clusters(self, ray_session):
        # near-duplicate vectors share nearly all hyperplane signs, so
        # their mutual edges must be found
        import ray.data as rd
        from mircv_ray.ops import knn_graph_lsh
        rng = np.random.default_rng(11)
        base = rng.standard_normal((40, 16)).astype(np.float32)
        rows = [base + 0.01 * rng.standard_normal((40, 16)).astype(
            np.float32) for _ in range(3)]
        m = np.concatenate(rows)  # ids i, i+40, i+80 are near-dups
        tbl = pa.table({
            "vec_id": pa.array(np.arange(120), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), 16).cast(
                    pa.list_(pa.float32())),
        })
        out = knn_graph_lsh(rd.from_arrow(tbl), k=2,
                            bands=16).to_pandas()
        edges = set(zip(out.src, out.dst))
        hits = sum((i, i + 40) in edges or (i + 40, i) in edges
                   for i in range(40))
        assert hits >= 36  # ~all planted twin pairs surface
