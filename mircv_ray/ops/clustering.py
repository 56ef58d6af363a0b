"""Embedding clustering + semantic deduplication (SemDeDup-style).

Curation primitive the LSH/exact near-dup family does not cover: cluster
the corpus embeddings with k-means, then prune near-duplicates WITHIN each
cluster only (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — public arXiv:2303.09540).
Clustering bounds the candidate set, so the quadratic cosine check runs
over cluster-sized groups instead of the corpus.

Ray-Data shape:

- ``kmeans_fit`` — full-data Lloyd iterations. Centroids are the broadcast
  small side (k x dim floats, captured in the batch closure); each
  iteration is ONE streaming pass emitting per-batch partial sums (at most
  k rows per batch), combined by a k-group ``groupby().map_groups`` —
  the only thing that ever reaches the driver is the k x dim centroid
  matrix itself (model-sized state, the legitimate driver residue of any
  iterative fit).
- ``kmeans_assign`` — map-only: one matmul per batch against the broadcast
  centroids.
- ``semantic_dedup`` — assign, then ``groupby(cluster).map_groups``: within
  a cluster, drop every vector that has an EARLIER (smaller-id) vector with
  cosine >= threshold (min-id dominance — deterministic, order-free, and
  exactly SQL-expressible, unlike greedy chains). The in-group kernel is a
  row-tiled matmul so one mega-cluster never builds a c x c matrix.

Scale contract: one cluster's vectors must fit one task (the SemDeDup
design point — k is chosen so clusters are ~corpus/k; a pathological
mega-cluster degrades to the tiled O(c^2/tile) kernel, not to OOM).
With ``n_clusters=1`` the operator IS the exact global dedup — that twin
is the oracle-gated entry; the clustered path is rows-only with in-entry
precision/recall asserts against the exact twin.

No counterpart in the reference (`/root/reference` indexes text only);
this extends the engine's LLM-data-pipeline family alongside
``ops/dedup.py`` and ``ops/similarity.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _emb_matrix, _normalize
from .dedup import _pack_rows, _unpack_varlen


def _init_centroids(emb_ds, n_clusters: int, seed: int, emb_col: str,
                    sample_limit: int) -> np.ndarray:
    """Deterministic farthest-point (k-means++-style) init from a bounded
    driver-side sample: seed point is rng-chosen, each next centroid is
    the sample vector with the LOWEST max-cosine to the chosen set, so
    well-separated modes each get a centroid (pure random choice can put
    two centroids in one mode and strand another — Lloyd can't recover)."""
    sample = emb_ds.limit(sample_limit).to_pandas()
    m = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    k = min(n_clusters, len(m))
    chosen = [int(rng.integers(len(m)))]
    best = m @ m[chosen[0]]          # running max-cosine to the chosen set
    for _ in range(k - 1):
        nxt = int(np.argmin(best))   # chosen points sit at cosine 1.0
        chosen.append(nxt)
        np.maximum(best, m @ m[nxt], out=best)
    return m[chosen].copy()


def kmeans_fit(emb_ds, n_clusters: int = 16, iters: int = 8,
               emb_col: str = "embedding", seed: int = 42,
               sample_limit: int = 20000) -> np.ndarray:
    """Full-data Lloyd k-means over the (normalized) embedding column.

    Returns the (n_clusters x dim) L2-normalized centroid matrix
    (spherical k-means: assignment by max cosine). Each iteration is one
    streaming pass; empty clusters keep their previous centroid.
    """
    cent = _init_centroids(emb_ds, n_clusters, seed, emb_col, sample_limit)

    for _ in range(iters):
        cn = cent  # captured per-iteration (k x dim, the broadcast side)

        def partials(batch: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(batch, emb_col))
            assign = (m @ cn.T).argmax(axis=1)
            clusters, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(clusters), m.shape[1]), dtype=np.float64)
            np.add.at(sums, inv, m)
            counts = np.bincount(inv, minlength=len(clusters)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(clusters, type=pa.int32()),
                "psum": _pack_rows(sums),
                "n": pa.array(counts, type=pa.int64()),
            })

        def combine(group: pa.Table) -> pa.Table:
            flat, lens = _unpack_varlen(group["psum"].combine_chunks(),
                                        np.float64)
            dim = int(lens[0])
            total = flat.reshape(-1, dim).sum(axis=0)
            return pa.table({
                "cluster": group["cluster"].slice(0, 1),
                "psum": _pack_rows(total[None, :]),
                "n": pa.array([int(group["n"].to_numpy().sum())],
                              type=pa.int64()),
            })

        rows = (emb_ds.map_batches(partials, batch_format="pyarrow")
                .groupby("cluster").map_groups(combine,
                                               batch_format="pyarrow")
                .take_all())
        new = cent.copy()
        for r in rows:
            total = np.frombuffer(r["psum"], dtype=np.float64)
            if r["n"] > 0:
                new[r["cluster"]] = total / r["n"]
        cent = _normalize(new)
    return cent


def kmeans_assign(emb_ds, centroids: np.ndarray,
                  emb_col: str = "embedding"):
    """Map-only nearest-centroid (max-cosine) assignment; adds an int32
    ``cluster`` column."""
    cn = _normalize(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        a = (m @ cn.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(a, type=pa.int32()))

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(emb_ds, n_clusters: int = 16, threshold: float = 0.9,
                   iters: int = 8, centroids: np.ndarray | None = None,
                   id_col: str = "vec_id", emb_col: str = "embedding",
                   seed: int = 42, tile_rows: int = 4096):
    """SemDeDup: Dataset of (``id_col``, cluster, keep).

    ``keep`` is False iff some SAME-CLUSTER vector with a smaller id has
    cosine >= threshold (min-id dominance). ``n_clusters=1`` makes the
    rule global/exact. The within-cluster kernel tiles rows so a
    mega-cluster computes O(c * tile) cells at a time, never c x c.
    """
    if centroids is None:
        centroids = (np.zeros((1, 1)) if n_clusters == 1 else
                     kmeans_fit(emb_ds, n_clusters, iters=iters,
                                emb_col=emb_col, seed=seed))
    cn = _normalize(np.asarray(centroids, dtype=np.float64))

    def assign_pack(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_col))
        a = (np.zeros(len(m), dtype=np.int32) if len(cn) == 1
             else (m @ cn.T).argmax(axis=1).astype(np.int32))
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(a, type=pa.int32()),
                         "nemb": _pack_rows(m)})

    def prune(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        flat, lens = _unpack_varlen(group["nemb"].combine_chunks(),
                                    np.float64)
        m = flat.reshape(len(ids), int(lens[0]))[order]
        c = len(ids)
        keep = np.ones(c, dtype=bool)
        # row-tiled: rows [lo, hi) only ever compare against rows < hi
        for lo in range(0, c, tile_rows):
            hi = min(lo + tile_rows, c)
            sims = m[lo:hi] @ m[:hi].T                    # (tile, hi)
            dominated = ((sims >= threshold)
                         & (np.arange(hi)[None, :]
                            < np.arange(lo, hi)[:, None]))
            keep[lo:hi] = ~dominated.any(axis=1)
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "cluster": group["cluster"].slice(0, 1)
                         .to_numpy().repeat(c),
                         "keep": pa.array(keep, type=pa.bool_())})

    packed = emb_ds.map_batches(assign_pack, batch_format="pyarrow")
    return packed.groupby("cluster").map_groups(prune,
                                                batch_format="pyarrow")
