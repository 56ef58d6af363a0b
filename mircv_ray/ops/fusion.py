"""Rank fusion for hybrid retrieval (sparse BM25 + dense ANN).

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009 —
``RRF(d) = sum_sides 1 / (k + rank_side(d))``) combines the engine's two
retrieval families over one id space: the inverted-index BM25 top-k
(`query/engine.py`) and the embedding cosine top-k (`ops/similarity.py`).
The reference engine is sparse-only (`/root/reference` scores BM25/TFIDF,
ScoreFunction.java); this extends the same query surface with the
standard hybrid step a modern retrieval pipeline adds on top.

Scale shape: fusion consumes per-query TOP-K lists — the inputs are
(queries x k)-sized by construction, orders of magnitude below the
corpus. The expensive sides (index scoring, ANN scan) are the already
distributed stages; the fuse itself is one vectorized pass per query
batch, usable inside an actor-pool ``map_batches`` over a query stream
(same pattern as ``query.run_queries``) — never a corpus-wide job.

Determinism: within a (side, query) list, rank is recomputed here from
(score DESC, id ASC) — not trusted from input row order — and the fused
top-k breaks ties the same way, so the result is reproducible and
exactly mirrors the SQL oracle (`row_number() OVER (ORDER BY score
DESC, id)`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ranks(qid: np.ndarray, doc: np.ndarray,
           score: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """1-based rank within each qid by (score DESC, doc ASC)."""
    order = np.lexsort((doc, -score, qid))
    q, d = qid[order], doc[order]
    starts = np.flatnonzero(np.append(True, q[1:] != q[:-1]))
    pos = np.arange(len(q), dtype=np.int64)
    rank = pos - np.repeat(starts, np.diff(np.append(starts, len(q)))) + 1
    return q, d, rank


def rrf_fuse(sides, k: int = 10, k_rrf: int = 60,
             qid_col: str = "qid", id_col: str = "doc_id",
             score_col: str = "score") -> pa.Table:
    """Fuse per-query ranked lists from multiple retrieval sides.

    ``sides``: list of pa.Table, each with (qid, id, score) columns
    (column names per the kwargs). Every side is independently
    rank-truncated to its own top-``k`` per query before fusion (the
    standard RRF setup: each system contributes its top-k list).
    Returns (qid, doc_id, rrf) — the fused top-``k`` per query, ties
    broken by ascending id.
    """
    qs, ds, rs = [], [], []
    for t in sides:
        if t.num_rows == 0:
            continue
        q, d, rank = _ranks(t[qid_col].to_numpy().astype(np.int64),
                            t[id_col].to_numpy().astype(np.int64),
                            t[score_col].to_numpy().astype(np.float64))
        keep = rank <= k
        qs.append(q[keep])
        ds.append(d[keep])
        rs.append(rank[keep])
    if not qs:
        return pa.table({qid_col: pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "rrf": pa.array([], pa.float64())})
    q = np.concatenate(qs)
    d = np.concatenate(ds)
    contrib = 1.0 / (k_rrf + np.concatenate(rs).astype(np.float64))
    # sum contributions per (qid, doc): sort-grouped, side order fixed
    # by the sides list so float summation order is reproducible
    order = np.lexsort((np.arange(len(q)), d, q))
    q, d, contrib = q[order], d[order], contrib[order]
    new = np.append(True, (q[1:] != q[:-1]) | (d[1:] != d[:-1]))
    gid = np.cumsum(new) - 1
    fused = np.zeros(int(gid[-1]) + 1, dtype=np.float64)
    np.add.at(fused, gid, contrib)
    gq, gd = q[new], d[new]
    # top-k per qid by (rrf DESC, doc ASC)
    oq, od, orank = _ranks(gq, gd, fused)
    # _ranks sorts copies; recover fused values in the same order
    order2 = np.lexsort((gd, -fused, gq))
    keep = orank <= k
    return pa.table({
        qid_col: pa.array(oq[keep], type=pa.int64()),
        id_col: pa.array(od[keep], type=pa.int64()),
        "rrf": pa.array(fused[order2][keep], type=pa.float64()),
    })


def comb_fuse(sides, k: int = 10, method: str = "sum", weights=None,
              qid_col: str = "qid", id_col: str = "doc_id",
              score_col: str = "score") -> pa.Table:
    """Score-based fusion: CombSUM / CombMNZ (Fox & Shaw, TREC-2) with
    per-(side, query) min-max normalization (Lee, SIGIR'97) — the
    score-aware siblings of :func:`rrf_fuse` (which uses ranks only).

    Each side is rank-truncated to its top-``k`` per query (score DESC,
    id ASC), then normalized over the kept list: ``(s - min) /
    (max - min)``, or 1.0 when the list's scores are all equal (a
    uniform list says nothing about order; every doc is "best").
    ``method="sum"``: fused = sum of normalized scores (times
    ``weights[i]`` per side if given — the standard dense/sparse
    interpolation ``a*dense + (1-a)*sparse`` is ``weights=[a, 1-a]``);
    ``method="mnz"``: CombSUM times the number of sides that returned
    the doc. Ties (fused DESC, id ASC). Same scale shape as rrf_fuse:
    inputs are (queries x k)-sized lists, one vectorized pass.
    """
    if method not in ("sum", "mnz"):
        raise ValueError(f"method must be 'sum' or 'mnz', got {method!r}")
    if weights is not None and len(weights) != len(sides):
        raise ValueError("weights must match sides")
    qs, ds, ns = [], [], []
    for si, t in enumerate(sides):
        if t.num_rows == 0:
            continue
        qid = t[qid_col].to_numpy().astype(np.int64)
        doc = t[id_col].to_numpy().astype(np.int64)
        sc = t[score_col].to_numpy().astype(np.float64)
        order = np.lexsort((doc, -sc, qid))
        q, d, s = qid[order], doc[order], sc[order]
        starts = np.flatnonzero(np.append(True, q[1:] != q[:-1]))
        lens = np.diff(np.append(starts, len(q)))
        rank = np.arange(len(q)) - np.repeat(starts, lens) + 1
        keep = rank <= k
        q, d, s = q[keep], d[keep], s[keep]
        starts = np.flatnonzero(np.append(True, q[1:] != q[:-1]))
        lens = np.diff(np.append(starts, len(q)))
        gid = np.repeat(np.arange(len(starts)), lens)
        mx = np.full(len(starts), -np.inf)
        mn = np.full(len(starts), np.inf)
        np.maximum.at(mx, gid, s)
        np.minimum.at(mn, gid, s)
        span = (mx - mn)[gid]
        norm = np.where(span > 0, (s - mn[gid]) / np.where(span > 0, span, 1.0),
                        1.0)
        if weights is not None:
            norm = weights[si] * norm
        qs.append(q)
        ds.append(d)
        ns.append(norm)
    if not qs:
        return pa.table({qid_col: pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "fused": pa.array([], pa.float64())})
    q, d = np.concatenate(qs), np.concatenate(ds)
    contrib = np.concatenate(ns)
    order = np.lexsort((np.arange(len(q)), d, q))  # side order fixed ->
    q, d, contrib = q[order], d[order], contrib[order]  # reproducible sums
    new = np.append(True, (q[1:] != q[:-1]) | (d[1:] != d[:-1]))
    gid = np.cumsum(new) - 1
    fused = np.zeros(int(gid[-1]) + 1, dtype=np.float64)
    np.add.at(fused, gid, contrib)
    if method == "mnz":
        cnt = np.zeros_like(fused)
        np.add.at(cnt, gid, 1.0)
        fused = fused * cnt
    gq, gd = q[new], d[new]
    oq, od, orank = _ranks(gq, gd, fused)
    order2 = np.lexsort((gd, -fused, gq))
    keep = orank <= k
    return pa.table({
        qid_col: pa.array(oq[keep], type=pa.int64()),
        id_col: pa.array(od[keep], type=pa.int64()),
        "fused": pa.array(fused[order2][keep], type=pa.float64()),
    })
