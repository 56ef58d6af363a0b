"""Learning-to-rank feature extraction.

The standard LTR data-prep step (Liu, Foundations & Trends IR 2009;
LETOR-style feature tables): for each query, generate a CANDIDATE set
(union of the sparse BM25 top-k and the dense cosine top-k — the usual
two-tower candidate generation) and emit one row per (query, candidate)
with every ranking signal the engine computes:

    bm25, tfidf, qld   — the three index scoring standards, 0.0 when the
                         doc matches no query term (sentinel; candidates
                         from the dense side may be term-free)
    cosine             — dense similarity of the query vector
    dl                 — document length (tokens)
    n_match            — distinct known query terms present in the doc

This is an EXPORT op: the result is training data for a reranker, not a
ranking itself. Scale shape: per query the work is the same posting-list
decodes the scorers already do plus one candidate-only embedding gather
(broadcast id set, one filtered scan) — candidates are (queries x 2k)
rows, never corpus-sized; the sparse sides never materialize more than
each term's posting lists (the same footprint as any disjunctive query).

Reference: the engine's BM25/TFIDF follow Scorer.java:26-43; QLD and the
dense side are this engine's extensions (see `engine._score_terms_qld`,
`ops/similarity.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _emb_matrix, _normalize, cosine_topk


def ltr_features(index_dir: str, emb_ds, term_queries: list[list[str]],
                 qvecs: np.ndarray, k: int = 10, mu: float = 2000.0,
                 emb_col: str = "embedding",
                 id_col: str = "vec_id") -> pa.Table:
    """One row per (qid, candidate doc). ``term_queries[i]`` are the
    (already tokenized) terms for qid i; ``qvecs[i]`` its dense vector.
    Engine docIds map to table ids as docno = docId - 1 == vec_id (the
    test corpus convention shared with hybrid fusion).
    """
    from ..config import QueryConfig
    from ..query import QueryEngine

    big = 1 << 62                       # "all matched docs" score lists
    engines = {s: QueryEngine(index_dir, QueryConfig(
        standard=s, k=big, parse=False, squeeze=False, mu=mu))
        for s in ("BM25", "TFIDF", "QLD")}
    reader = engines["BM25"].reader

    dense_top = cosine_topk(emb_ds, qvecs, k=k, emb_col=emb_col,
                            id_col=id_col).to_pandas()

    # per-query sparse scores over ALL matched docs (dict docno -> score)
    sparse: list[dict[str, dict[int, float]]] = []
    for terms in term_queries:
        row = {}
        for s, eng in engines.items():
            row[s] = {doc - 1: sc for doc, sc in eng.score_terms(list(terms))}
        sparse.append(row)

    # candidates: sparse BM25 top-k (score desc, id asc) U dense top-k
    cand_per_q: list[np.ndarray] = []
    for qi, terms in enumerate(term_queries):
        bm = sparse[qi]["BM25"]
        top_sparse = sorted(bm, key=lambda d: (-bm[d], d))[:k]
        top_dense = dense_top[dense_top["query_id"] == qi]["vec_id"]
        cand_per_q.append(np.unique(np.concatenate(
            [np.asarray(top_sparse, dtype=np.int64),
             top_dense.to_numpy().astype(np.int64)])))

    # candidate-only embedding gather (broadcast id set, one scan)
    import ray
    all_cand = np.unique(np.concatenate(cand_per_q))
    ids_ref = ray.put(all_cand)

    def keep(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = batch[id_col].to_numpy()
        pos = np.searchsorted(wanted, ids)
        pos[pos >= len(wanted)] = 0
        return batch.take(np.flatnonzero(wanted[pos] == ids))

    emb_t = pa.concat_tables(
        [t for t in ray.get(emb_ds.map_batches(
            keep, batch_format="pyarrow").to_arrow_refs()) if t.num_rows])
    got_ids = emb_t[id_col].to_numpy()
    order = np.argsort(got_ids)
    got_ids = got_ids[order]
    E = _normalize(_emb_matrix(emb_t, emb_col))[order]
    qn = _normalize(np.asarray(qvecs, dtype=np.float64))

    # n_match: distinct known query terms whose posting list contains doc
    def n_match(terms, cand):
        cnt = np.zeros(len(cand), dtype=np.int64)
        for t in dict.fromkeys(terms):          # distinct, order kept
            if reader.lexicon_entry(t) is None:
                continue
            ids, _ = reader.decoded(t)
            pos = np.searchsorted(ids, cand + 1)
            pos[pos >= len(ids)] = 0
            cnt += (ids[pos] == cand + 1)
        return cnt

    cols = {n: [] for n in ("qid", "doc_id", "bm25", "tfidf", "qld",
                            "cosine", "dl", "n_match")}
    for qi, terms in enumerate(term_queries):
        cand = cand_per_q[qi]
        cos = E[np.searchsorted(got_ids, cand)] @ qn[qi]
        dl = np.asarray(reader.doc_len[cand], dtype=np.int64)  # docId-1=cand
        nm = n_match(terms, cand)
        for j, d in enumerate(cand):
            cols["qid"].append(qi)
            cols["doc_id"].append(int(d))
            cols["bm25"].append(sparse[qi]["BM25"].get(int(d), 0.0))
            cols["tfidf"].append(sparse[qi]["TFIDF"].get(int(d), 0.0))
            cols["qld"].append(sparse[qi]["QLD"].get(int(d), 0.0))
            cols["cosine"].append(float(cos[j]))
            cols["dl"].append(int(dl[j]))
            cols["n_match"].append(int(nm[j]))
    return pa.table({
        "qid": pa.array(cols["qid"], type=pa.int64()),
        "doc_id": pa.array(cols["doc_id"], type=pa.int64()),
        "bm25": pa.array(cols["bm25"], type=pa.float64()),
        "tfidf": pa.array(cols["tfidf"], type=pa.float64()),
        "qld": pa.array(cols["qld"], type=pa.float64()),
        "cosine": pa.array(cols["cosine"], type=pa.float64()),
        "dl": pa.array(cols["dl"], type=pa.int64()),
        "n_match": pa.array(cols["n_match"], type=pa.int64()),
    })
