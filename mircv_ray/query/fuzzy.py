"""Fuzzy term matching ("did you mean"): edit-distance-1 query-term
expansion over the lexicon, scored as disjunctive BM25.

ENGINE EXTENSION (the reference silently ignores unknown query terms,
``m/queryProcessor/QueryProcessorMain.java:139-154``). A misspelled
term expands to every lexicon term within Levenshtein distance <= 1
(substitution, insertion, deletion — plain Levenshtein, so a
transposition is distance 2 and does NOT match), then the distinct
expansion scores like any disjunctive query.

The distance filter is fully vectorized over the lexicon's fixed-width
S64 key matrix (the same once-per-process sorted array the scorer's
lookups use): candidates are restricted to byte lengths L-1/L/L+1 via
a cached length-sorted index, then

- same length:    substitution  <=> at most one mismatching column;
- length + 1:     deletion      <=> lcp + lcs >= L   (classic split
- length - 1:     insertion     <=> lcp + lcs >= L-1  argument),

with lcp/lcs computed as one ``logical_and.accumulate`` per direction
over the candidate byte matrix. No per-term Python; cost is
O(candidates_of_matching_length x L) bytes per query term.

Scale note: on a sharded 10^12-term lexicon the same check runs
per-shard (the key arrays are already per-process); a SymSpell-style
deletion-neighborhood index is the documented speed-up if fuzzy volume
ever rivals exact lookups — it trades |vocab| x avg_len precomputed
hashes for O(L) probes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ed1_terms", "bm25_fuzzy"]

_len_cache: dict[int, tuple] = {}


def _length_index(terms: np.ndarray):
    """(lens_sorted_row_ids, sorted_lens, byte_matrix) for an S64 key
    array, cached per array identity (built once per process)."""
    key = id(terms)
    hit = _len_cache.get(key)
    # id() values recycle after GC — the stored array reference both
    # keeps the id alive and lets us verify identity
    if hit is not None and hit[3] is terms:
        return hit[:3]
    m = np.ascontiguousarray(terms).view(np.uint8).reshape(-1, 64)
    has0 = (m == 0).any(axis=1)
    lens = np.where(has0, np.argmax(m == 0, axis=1), 64)
    order = np.argsort(lens, kind="stable")
    out = (order, lens[order], m, terms)
    # the byte matrix is a view over the lexicon's key array, so each
    # cached entry PINS that lexicon's terms (engine._lex_cache bounds
    # itself to 4 for the same reason) — keep at most 2 pinned here
    if len(_len_cache) >= 2:
        _len_cache.pop(next(iter(_len_cache)))
    _len_cache[key] = out
    return out[:3]


def _rows_with_len(order, sorted_lens, n: int) -> np.ndarray:
    lo = int(np.searchsorted(sorted_lens, n))
    hi = int(np.searchsorted(sorted_lens, n + 1))
    return order[lo:hi]


def _lcp_lcs(cand: np.ndarray, q: np.ndarray):
    """Per-row longest common prefix / suffix lengths between each
    candidate byte row and ``q`` over their aligned slices."""
    n = len(q)
    eqp = cand[:, :n] == q
    lcp = np.logical_and.accumulate(eqp, axis=1).sum(axis=1)
    eqs = cand[:, cand.shape[1] - n:][:, ::-1] == q[::-1]
    lcs = np.logical_and.accumulate(eqs, axis=1).sum(axis=1)
    return lcp, lcs


def ed1_terms(lex, term: str) -> list[str]:
    """Lexicon terms within Levenshtein distance <= 1 of ``term``
    (includes the term itself when present), in sorted term order."""
    qb = term.encode()
    L = len(qb)
    if L == 0 or L >= 64:
        return []
    q = np.frombuffer(qb, dtype=np.uint8)
    order, sorted_lens, m = _length_index(lex.terms)
    hits = []
    rows = _rows_with_len(order, sorted_lens, L)
    if len(rows):
        sub = (m[rows][:, :L] != q).sum(axis=1) <= 1
        hits.append(rows[sub])
    rows = _rows_with_len(order, sorted_lens, L + 1)
    if len(rows):
        c = m[rows][:, :L + 1]
        lcp, lcs = _lcp_lcs(c, q)
        hits.append(rows[lcp + lcs >= L])
    if L >= 2:
        rows = _rows_with_len(order, sorted_lens, L - 1)
        if len(rows):
            c = m[rows][:, :L - 1]
            lcp = np.logical_and.accumulate(
                c == q[:L - 1], axis=1).sum(axis=1)
            lcs = np.logical_and.accumulate(
                c[:, ::-1] == q[1:][::-1], axis=1).sum(axis=1)
            hits.append(rows[lcp + lcs >= L - 1])
    if not hits:
        return []
    idx = np.sort(np.concatenate(hits))
    return [t.decode() for t in lex.terms[idx]]


def bm25_fuzzy(index_dir: str, queries: list[str], k: int = 10,
               parse: bool = False, squeeze: bool = False,
               standard: str = "BM25"):
    """Each query is one (possibly misspelled) term; expand to its
    ED<=1 lexicon terms and score the distinct expansion as a
    disjunctive top-``k``. Returns (table(qid, doc_id, score),
    {qid: [expansion terms]})."""
    import pyarrow as pa

    from ..config import QueryConfig
    from .engine import QueryEngine
    eng = QueryEngine(index_dir, QueryConfig(
        standard=standard, k=k, parse=parse, squeeze=squeeze))
    from ..text.tokenizer import tokenize_text
    qids, dids, scores = [], [], []
    expansions: dict[int, list[str]] = {}
    for qid, w in enumerate(queries):
        # normalize the raw word through the query tokenizer first
        # (lowercase, punctuation, stemming when parse=True) so
        # "Mergee" behaves like every other query path; a word that
        # tokenizes to several tokens expands each and unions
        words = tokenize_text(w, parse=parse, squeeze=squeeze)
        terms = sorted({t for v in words
                        for t in ed1_terms(eng.reader._lex, v)})
        expansions[qid] = terms
        for doc_id, score in eng.score_terms(terms, conjunctive=False):
            qids.append(qid)
            dids.append(doc_id)
            scores.append(score)
    return (pa.table({"qid": pa.array(qids, type=pa.int64()),
                      "doc_id": pa.array(dids, type=pa.int64()),
                      "score": pa.array(scores, type=pa.float64())}),
            expansions)
