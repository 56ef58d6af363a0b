"""Boolean retrieval with negation: ``+a +b -c`` queries.

ENGINE EXTENSION (the reference supports disjunctive and conjunctive
only, ``m/queryProcessor/QueryProcessorMain.java:60-61``). A query is
(positive terms, negative terms): a live doc qualifies iff it contains
EVERY distinct known positive term and NO known negative term; the
qualifying docs score as usual (positive duplicates score twice).
Unknown terms are ignored on both sides, as everywhere else in the
engine. The heavy lifting — intersection, exclusion-before-top-k,
tombstones, gathered scoring — is `engine.py
score_terms_strict_and(terms, exclude_terms=...)`; the negation set
costs df-sized index reads only, no content, no new scale surface.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["bm25_boolean", "score_terms_boolean"]


def score_terms_boolean(eng, pos_terms: list[str],
                        neg_terms: list[str]) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for a ``+pos -neg`` query."""
    return eng.score_terms_strict_and(pos_terms,
                                      exclude_terms=neg_terms)


def bm25_boolean(index_dir: str,
                 queries: list[tuple[list[str], list[str]]],
                 k: int = 10, parse: bool = False,
                 squeeze: bool = False,
                 standard: str = "BM25") -> pa.Table:
    """Batch ``+pos -neg`` retrieval: (qid, doc_id, score) top-``k``
    per query by (score DESC, doc_id ASC)."""
    from ..config import QueryConfig
    from .engine import QueryEngine
    eng = QueryEngine(index_dir, QueryConfig(
        standard=standard, k=k, parse=parse, squeeze=squeeze))
    qids, dids, scores = [], [], []
    for qid, (pos_t, neg_t) in enumerate(queries):
        for doc_id, score in score_terms_boolean(eng, pos_t, neg_t):
            qids.append(qid)
            dids.append(doc_id)
            scores.append(score)
    return pa.table({"qid": pa.array(qids, type=pa.int64()),
                     "doc_id": pa.array(dids, type=pa.int64()),
                     "score": pa.array(scores, type=pa.float64())})
