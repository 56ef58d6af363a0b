"""Embedding k-means + SemDeDup-style semantic dedup (ops/clustering.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from mircv_ray.ops.clustering import (_init_centroids, kmeans_assign,
                                      kmeans_fit, semantic_dedup)
from mircv_ray.ops.similarity import _normalize


def _blobs(rng, centers, per, dim, spread=0.02):
    """Well-separated unit-sphere blobs; returns (ids, matrix, labels)."""
    rows, labels = [], []
    for ci, c in enumerate(centers):
        pts = c[None, :] + rng.normal(0, spread, (per, dim))
        rows.append(pts)
        labels.extend([ci] * per)
    m = _normalize(np.concatenate(rows))
    return np.arange(len(m), dtype=np.int64), m, np.array(labels)


def _emb_table(ids, m):
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": pa.array(list(m),
                                           pa.list_(pa.float64()))})


def _numpy_lloyd(m, cent, iters):
    """Reference Lloyd on normalized data, same update rule as kmeans_fit."""
    cent = cent.copy()
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                new[c] = m[mask].mean(axis=0)
        cent = _normalize(new)
    return cent


def _brute_keep(ids, m, threshold):
    """Min-id dominance keep over ALL pairs (the n_clusters=1 semantics)."""
    sims = m @ m.T
    keep = {}
    order = np.argsort(ids)
    for pos, i in enumerate(order):
        earlier = order[:pos]
        keep[int(ids[i])] = not bool(
            (sims[i, earlier] >= threshold).any())
    return keep


class TestKMeans:
    def test_fit_matches_numpy_lloyd(self, ray_session):
        rng = np.random.default_rng(11)
        centers = _normalize(rng.normal(0, 1, (4, 16)))
        ids, m, labels = _blobs(rng, centers, per=60, dim=16)
        ds = rd.from_arrow(_emb_table(ids, m))
        cent = kmeans_fit(ds, n_clusters=4, iters=5, seed=3,
                          sample_limit=1000)
        ref = _numpy_lloyd(m, _init_centroids(ds, 4, 3, "embedding", 1000),
                           iters=5)
        # distributed partial-sum order may differ in the last ulp
        assert np.allclose(cent, ref, atol=1e-9)
        # every blob resolved to one distinct centroid
        assign = (m @ cent.T).argmax(axis=1)
        mapping = {}
        for a, l in zip(assign, labels):
            mapping.setdefault(l, a)
            assert mapping[l] == a
        assert len(set(mapping.values())) == 4

    def test_assign_adds_cluster_column(self, ray_session):
        rng = np.random.default_rng(5)
        centers = _normalize(rng.normal(0, 1, (3, 8)))
        ids, m, labels = _blobs(rng, centers, per=20, dim=8)
        ds = rd.from_arrow(_emb_table(ids, m))
        out = kmeans_assign(ds, centers).to_pandas().sort_values("vec_id")
        assert out["cluster"].dtype == np.int32
        expect = (_normalize(m) @ _normalize(centers).T).argmax(axis=1)
        assert (out["cluster"].to_numpy() == expect).all()

    def test_empty_cluster_keeps_previous_centroid(self, ray_session):
        rng = np.random.default_rng(2)
        # 2 tight blobs but ask for 4 clusters: >=2 go empty, must survive
        centers = _normalize(rng.normal(0, 1, (2, 8)))
        ids, m, _ = _blobs(rng, centers, per=30, dim=8, spread=0.001)
        ds = rd.from_arrow(_emb_table(ids, m))
        cent = kmeans_fit(ds, n_clusters=4, iters=3, seed=1,
                          sample_limit=1000)
        assert cent.shape == (4, 8)
        assert np.isfinite(cent).all()
        assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)


class TestSemanticDedup:
    def _planted(self, rng, n_orig=40, dups_of=(3, 7, 7), dim=12):
        """n_orig well-spread vectors + near-copies appended at high ids."""
        m = _normalize(rng.normal(0, 1, (n_orig, dim)))
        rows = [m]
        for src in dups_of:
            rows.append(_normalize(m[src][None, :]
                                   + rng.normal(0, 1e-4, (1, dim))))
        full = np.concatenate(rows)
        ids = np.arange(len(full), dtype=np.int64)
        return ids, full

    def test_single_cluster_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(9)
        ids, m = self._planted(rng)
        ds = rd.from_arrow(_emb_table(ids, m))
        out = semantic_dedup(ds, n_clusters=1, threshold=0.95) \
            .to_pandas().sort_values("vec_id")
        brute = _brute_keep(ids, _normalize(m), 0.95)
        got = dict(zip(out["vec_id"], out["keep"]))
        assert got == brute
        # the three planted dups (and only high-id copies) are dropped
        dropped = {v for v, k in got.items() if not k}
        assert dropped == {40, 41, 42}

    def test_clustered_precision_one_and_recall_on_blobs(self, ray_session):
        rng = np.random.default_rng(21)
        centers = _normalize(rng.normal(0, 1, (4, 12)))
        ids, m, _ = _blobs(rng, centers, per=25, dim=12)
        # plant near-dups (same blob -> same cluster -> recall 1 here)
        dup = _normalize(m[[5, 30, 55]] + rng.normal(0, 1e-4, (3, 12)))
        full = np.concatenate([m, dup])
        ids = np.arange(len(full), dtype=np.int64)
        ds = rd.from_arrow(_emb_table(ids, full))
        out = semantic_dedup(ds, n_clusters=4, threshold=0.98, iters=4,
                             seed=7).to_pandas().sort_values("vec_id")
        got = dict(zip(out["vec_id"], out["keep"]))
        brute = _brute_keep(ids, _normalize(full), 0.98)
        exact_dropped = {v for v, k in brute.items() if not k}
        clustered_dropped = {v for v, k in got.items() if not k}
        # precision 1: clustered only drops true global near-dups
        assert clustered_dropped <= exact_dropped
        # blob-local dups share a cluster: full recall on the planted set
        assert {100, 101, 102} <= clustered_dropped

    def test_tiled_kernel_matches_untiled(self, ray_session):
        rng = np.random.default_rng(4)
        ids, m = self._planted(rng, n_orig=120, dups_of=(1, 1, 60, 90))
        ds = rd.from_arrow(_emb_table(ids, m))
        big = semantic_dedup(ds, n_clusters=1, threshold=0.97,
                             tile_rows=4096).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        small = semantic_dedup(ds, n_clusters=1, threshold=0.97,
                               tile_rows=7).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert big.equals(small)

    def test_driver_entry_clustered_self_validates(self, ray_session):
        # the entry's in-entry precision assert runs at driver time;
        # here it runs over the real sf0.001 embeddings table
        import __ray_entry__ as e
        out = e.queries()["semantic_dedup_clustered"]("/root/testdata/sf0.001")
        assert out.num_rows > 0
        assert sorted(out.column_names) == ["cluster", "keep", "vec_id"]

    def test_precomputed_centroids_skip_fit(self, ray_session):
        rng = np.random.default_rng(6)
        centers = _normalize(rng.normal(0, 1, (3, 8)))
        ids, m, _ = _blobs(rng, centers, per=10, dim=8)
        ds = rd.from_arrow(_emb_table(ids, m))
        out = semantic_dedup(ds, threshold=0.99,
                             centroids=centers).to_pandas()
        assert set(out["cluster"].unique()) <= {0, 1, 2}
        assert len(out) == len(ids)
