"""Boolean retrieval with negation: ``+a +b -c`` queries.

ENGINE EXTENSION (the reference supports disjunctive and conjunctive
only, ``m/queryProcessor/QueryProcessorMain.java:60-61``). A query is
(positive terms, negative terms): a live doc qualifies iff it contains
EVERY distinct known positive term and NO known negative term; the
qualifying docs score as usual (positive duplicates score twice —
the same quirk the clean-AND path keeps, `engine.py
score_terms_strict_and`, whose vectorized intersection/gather shape
this reuses with one extra exclusion step before top-k selection —
excluding after top-k would under-fill k). Unknown terms are ignored
on both sides, as everywhere else in the engine.

The negation set is the union of the negative terms' posting lists —
df-sized index reads, no content, no new scale surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["bm25_boolean", "score_terms_boolean"]


def score_terms_boolean(eng, pos_terms: list[str],
                        neg_terms: list[str]) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) for a ``+pos -neg`` query (see module
    docstring for the exact semantics)."""
    r = eng.reader
    bm25 = eng.qcfg.standard == "BM25"
    r.prefetch(list(pos_terms) + list(neg_terms))
    lists = []
    for t in pos_terms:
        lex = r.lexicon_entry(t)
        if lex is None:
            continue
        ids, tfs = r.decoded(t)
        lists.append((ids, tfs, lex[1]))
    if not lists:
        return []
    seen: dict[int, None] = {}
    distinct = []
    for ids, _, _ in lists:
        if id(ids) not in seen:
            seen[id(ids)] = None
            distinct.append(ids)
    inter = distinct[0]
    for ids in distinct[1:]:
        inter = np.intersect1d(inter, ids, assume_unique=True)
        if not len(inter):
            return []
    # negation: drop docs holding ANY known negative term
    for t in set(neg_terms):
        dec = r.decoded(t)
        if dec is None:
            continue
        inter = inter[~np.isin(inter, dec[0], assume_unique=True)]
        if not len(inter):
            return []
    if len(r.tombstones):
        inter = inter[r.alive_mask(inter)]
        if not len(inter):
            return []
    score = np.zeros(len(inter), dtype=np.float64)
    for ids, tfs, idf in lists:
        pos = np.searchsorted(ids, inter)
        tf = tfs[pos]
        if bm25:
            score += (tf / (r.k1 * r.bj_at(inter - 1) + tf)) * idf
        else:
            score += (1.0 + np.log10(tf)) * idf
    k = eng.qcfg.k
    if len(inter) > k:
        kth = -np.partition(-score, k - 1)[k - 1]
        keep = score >= kth
        score, inter = score[keep], inter[keep]
    order = np.lexsort((inter, -score))[:k]
    return [(int(inter[i]), float(score[i])) for i in order]


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
