"""General wildcard retrieval via a k-gram term index (IIR ch. 3.2).

ENGINE EXTENSION beyond the reference (which only supports exact query
terms, ``m/queryProcessor/QueryProcessorMain.java:139-154``) and beyond
the engine's own prefix-only wildcard (``engine._LexiconView.
prefix_terms`` handles ``pre*`` with two binary searches): this module
answers ARBITRARY ``*`` patterns — suffix ``*ing``, infix ``f*o``,
contains ``*sub*``, multi-star ``s*a*m`` — and scores the distinct
expansion as a disjunctive BM25/TFIDF top-k like every other query path.

Mechanics (classic, from Manning/Raghavan/Schuetze IIR §3.2.2):

- a 3-gram index over the LEXICON, not the corpus: each term wrapped as
  ``$term$`` contributes its character trigrams; ``gram -> sorted term
  row ids``. Built ONCE per process per lexicon from the scorer's own
  fixed-width S64 key matrix with pure NumPy (sliding windows over the
  byte matrix, one ``np.unique`` over packed (gram<<32|row) keys) and
  cached per array identity like ``fuzzy._length_index`` — vocabulary-
  sized state, never corpus-sized.
- a pattern's literal pieces (boundary-anchored with ``$`` when the
  pattern does not start/end with ``*``) yield trigram constraints;
  candidates = the intersection of those grams' row-id lists.
- k-gram filtering over-generates (IIR's own example: the grams of
  ``red*`` also match ``retired``), so candidates pass a final VERIFY:
  a vectorized greedy wildcard matcher over the candidate byte rows —
  anchored prefix/suffix as direct slice compares, middle pieces as
  leftmost sliding-window matches. No per-term Python anywhere; the
  verify cost is O(candidates x 64 x piece_len) bytes.
- a pattern whose pieces are all shorter than 3 chars (e.g. ``*a*``)
  contributes no gram constraint and falls back to verifying the full
  vocabulary — still lexicon-sized, still one vectorized kernel.

Scale note: on a sharded 10^12-term lexicon the gram index builds
per-shard over each shard's key array (exactly like the fuzzy length
index); candidate sets stay tiny because the verify runs shard-local.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

__all__ = ["wildcard_terms", "bm25_wildcard"]

_BOUND = ord("$")

# gram index pins a view over the lexicon key array — bound like
# fuzzy._len_cache (engine._lex_cache itself is bounded to 4)
_gram_cache: dict[int, tuple] = {}


def _term_matrix(terms: np.ndarray):
    """(byte_matrix (V,64) uint8, lens (V,) int64) for an S64 key array."""
    m = np.ascontiguousarray(terms).view(np.uint8).reshape(-1, 64)
    has0 = (m == 0).any(axis=1)
    lens = np.where(has0, np.argmax(m == 0, axis=1), 64).astype(np.int64)
    return m, lens


def _kgram_index(terms: np.ndarray):
    """3-gram index over ``$term$``-wrapped lexicon terms.

    Returns (ugrams: sorted uint32 packed grams, starts: int64 offsets
    with end sentinel, rows: int64 term row ids grouped by gram,
    m: byte matrix, lens). Cached per array identity.
    """
    key = id(terms)
    hit = _gram_cache.get(key)
    if hit is not None and hit[5] is terms:
        return hit[:5]
    m, lens = _term_matrix(terms)
    v = len(m)
    padded = np.zeros((v, 66), dtype=np.uint8)
    padded[:, 0] = _BOUND
    padded[:, 1:65] = m
    padded[np.arange(v), lens + 1] = _BOUND
    win = sliding_window_view(padded, 3, axis=1)          # (v, 64, 3)
    grams = ((win[..., 0].astype(np.uint32) << 16)
             | (win[..., 1].astype(np.uint32) << 8)
             | win[..., 2].astype(np.uint32))             # (v, 64)
    # window i covers padded cols i..i+2; valid iff i+3 <= lens+2
    pos = np.arange(64, dtype=np.int64)
    valid = pos[None, :] <= (lens - 1)[:, None]
    row_ids = np.broadcast_to(np.arange(v, dtype=np.int64)[:, None],
                              grams.shape)
    packed = (grams[valid].astype(np.uint64) << np.uint64(32)) \
        | row_ids[valid].astype(np.uint64)
    packed = np.unique(packed)                            # dedupe + sort
    g = (packed >> np.uint64(32)).astype(np.uint32)
    rows = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    ugrams, starts = np.unique(g, return_index=True)
    starts = np.append(starts, len(rows)).astype(np.int64)
    out = (ugrams, starts, rows, m, lens, terms)
    if len(_gram_cache) >= 2:
        _gram_cache.pop(next(iter(_gram_cache)))
    _gram_cache[key] = out
    return out[:5]


def _pattern_grams(pattern: bytes) -> set[bytes]:
    """Boundary-anchored trigrams implied by a ``*`` pattern."""
    raw = pattern.split(b"*")
    segs = []
    for i, p in enumerate(raw):
        if not p:
            continue
        s = p
        if i == 0 and not pattern.startswith(b"*"):
            s = b"$" + s
        if i == len(raw) - 1 and not pattern.endswith(b"*"):
            s = s + b"$"
        segs.append(s)
    grams: set[bytes] = set()
    for s in segs:
        for j in range(len(s) - 2):
            grams.add(s[j:j + 3])
    return grams


def _match_wildcard(m: np.ndarray, lens: np.ndarray,
                    pattern: bytes) -> np.ndarray:
    """Boolean mask: which byte rows match the ``*`` pattern exactly.

    Anchored first/last pieces are direct prefix/suffix compares;
    middle pieces match greedily leftmost (correct for ``*``-only
    patterns). Fully vectorized over rows.
    """
    n = len(m)
    ok = np.ones(n, dtype=bool)
    if n == 0:
        return ok
    raw = pattern.split(b"*")
    anchor_start = raw[0] != b""
    anchor_end = raw[-1] != b""
    pieces = [p for p in raw if p]
    if not pieces:
        # pattern is all stars: matches everything (incl. "*")
        return ok
    lo = np.zeros(n, dtype=np.int64)       # search region start
    hi = lens.copy()                        # search region end (excl.)
    if anchor_start:
        p = np.frombuffer(pieces[0], dtype=np.uint8)
        lp = len(p)
        ok &= (lens >= lp) & (m[:, :lp] == p).all(axis=1)
        lo[:] = lp
        if anchor_end and len(pieces) == 1:
            # no '*' at all: exact match
            return ok & (lens == lp)
        pieces = pieces[1:]
    if anchor_end:
        p = np.frombuffer(pieces[-1], dtype=np.uint8)
        lp = len(p)
        # suffix: bytes at [lens-lp, lens) == p, and room after `lo`
        start = lens - lp
        ok &= start >= lo
        safe = np.maximum(start, 0)
        idx = safe[:, None] + np.arange(lp, dtype=np.int64)[None, :]
        ok &= (np.take_along_axis(m, idx, axis=1) == p).all(axis=1)
        hi = start
        pieces = pieces[:-1]
    cur = lo
    for piece in pieces:
        p = np.frombuffer(piece, dtype=np.uint8)
        lp = len(p)
        win = sliding_window_view(m, lp, axis=1)          # (n, 65-lp, lp)
        hitm = (win == p).all(axis=2)
        wpos = np.arange(hitm.shape[1], dtype=np.int64)
        avail = hitm & (wpos[None, :] >= cur[:, None]) \
            & (wpos[None, :] + lp <= hi[:, None])
        found = avail.any(axis=1)
        ok &= found
        first = np.argmax(avail, axis=1)
        cur = np.where(found, first + lp, cur)
    return ok


def wildcard_terms(lex, pattern: str) -> list[str]:
    """Lexicon terms matching a ``*`` pattern, in sorted term order.

    ``lex`` is the engine's ``_LexiconView`` (or anything exposing a
    sorted S64 ``terms`` array).
    """
    pb = pattern.encode()
    if not pb or len(pb) >= 64:
        return []
    if b"*" not in pb:
        # exact-term degenerate case
        return [pattern] if pattern in lex else []
    ugrams, starts, rows, m, lens = _kgram_index(lex.terms)
    grams = _pattern_grams(pb)
    cand: np.ndarray | None = None
    for g3 in grams:
        gv = np.uint32((g3[0] << 16) | (g3[1] << 8) | g3[2])
        i = int(np.searchsorted(ugrams, gv))
        if i >= len(ugrams) or ugrams[i] != gv:
            return []                      # a required gram is absent
        lst = rows[starts[i]:starts[i + 1]]
        cand = lst if cand is None else np.intersect1d(cand, lst,
                                                       assume_unique=True)
        if len(cand) == 0:
            return []
    if cand is None:                        # no gram constraint: full scan
        cand = np.arange(len(m), dtype=np.int64)
    keep = _match_wildcard(m[cand], lens[cand], pb)
    hits = cand[keep]
    return [t.decode() for t in lex.terms[hits]]


def bm25_wildcard(index_dir: str, patterns: list[str], k: int = 10,
                  parse: bool = False, squeeze: bool = False,
                  standard: str = "BM25"):
    """Each query is one ``*`` pattern; expand over the lexicon via the
    k-gram index and score the distinct expansion as a disjunctive
    top-``k``. Returns (table(qid, doc_id, score), {qid: expansion})."""
    import pyarrow as pa

    from ..config import QueryConfig
    from .engine import QueryEngine
    eng = QueryEngine(index_dir, QueryConfig(
        standard=standard, k=k, parse=parse, squeeze=squeeze))
    qids, dids, scores = [], [], []
    expansions: dict[int, list[str]] = {}
    for qid, pat in enumerate(patterns):
        terms = wildcard_terms(eng.reader._lex, pat.lower())
        expansions[qid] = terms
        for doc_id, score in eng.score_terms(terms, conjunctive=False):
            qids.append(qid)
            dids.append(doc_id)
            scores.append(score)
    return (pa.table({"qid": pa.array(qids, type=pa.int64()),
                      "doc_id": pa.array(dids, type=pa.int64()),
                      "score": pa.array(scores, type=pa.float64())}),
            expansions)
