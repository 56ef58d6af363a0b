"""Pure-Python single-threaded reference-semantics implementation.

A few hundred lines implementing exactly what the reference computes —
tokenize -> docId assignment -> inverted index -> BM25/TFIDF -> top-k —
checkable line by line against SURVEY.md. The Ray pipeline must match
this oracle's lexicon, postings, doc table and per-query top-k
(rank-identical; score-equality tolerance only for exact ties).

Semantics sources:
- docId = 1 + rank in (repo, path) sort order (replaces the reference's
  arrival-order counter, InvertedIndex.java:22,51 — see SURVEY.md §7.4).
- df/idf: InvertedIndex.java:159,166 (idf = log10(N/df)).
- BM25: Scorer.java:26-32 — score = tf/(k1*Bj+tf) * idf with
  Bj = 0.3 + 0.7*docLen/avgDocLen, k1=1.5 (NOT the textbook formula).
- TFIDF: Scorer.java:41-43 — (1+log10(tf)) * idf.
- upper bounds: Scorer.java:52-72.
- top-k: bounded min-heap of size k (Scorer.java:140-153); ties broken
  deterministically by ascending docId (the reference's heap tie order is
  unspecified, Scorer.java:205-208).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field

from ..text import tokenize_text


@dataclass
class OracleIndex:
    parse: bool
    squeeze: bool = True
    n_docs: int = 0
    total_doc_len: int = 0
    doc_len: dict[int, int] = field(default_factory=dict)       # docId -> len
    doc_meta: dict[int, dict] = field(default_factory=dict)     # docId -> row
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {docId: tf}

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, rows: list[dict], parse: bool, squeeze: bool = True) -> "OracleIndex":
        """rows: dicts with at least (repo, path, content)."""
        idx = cls(parse=parse, squeeze=squeeze)
        ordered = sorted(rows, key=lambda r: (r["repo"], r["path"]))
        for i, row in enumerate(ordered):
            doc_id = i + 1
            tokens = tokenize_text(row["content"], parse=parse, squeeze=squeeze)
            idx.n_docs += 1
            idx.total_doc_len += len(tokens)
            idx.doc_len[doc_id] = len(tokens)
            idx.doc_meta[doc_id] = {
                **{k: row[k] for k in ("repo", "path") if k in row},
                "docno": str(doc_id - 1),
                "sha256": hashlib.sha256(row["content"].encode()).hexdigest(),
            }
            seen: dict[str, int] = {}
            for t in tokens:
                seen[t] = seen.get(t, 0) + 1
            for t, tf in seen.items():
                idx.postings.setdefault(t, {})[doc_id] = tf
        return idx

    # ------------------------------------------------------------ statistics
    @property
    def avg_doc_len(self) -> float:
        return self.total_doc_len / self.n_docs

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        return math.log10(self.n_docs / self.df(term))

    def lexicon(self) -> dict[str, dict]:
        """term -> {df, idf, bm25_ub, tfidf_ub, max_doc_id} (sorted by term)."""
        out = {}
        for term in sorted(self.postings):
            plist = self.postings[term]
            idf = self.idf(term)
            bm25_ub = 0.0
            tfidf_ub = 0.0
            for doc_id, tf in plist.items():
                bm25_ub = max(bm25_ub, self._bm25(tf, doc_id, idf))
                tfidf_ub = max(tfidf_ub, (1 + math.log10(tf)) * idf)
            out[term] = {
                "df": len(plist),
                "idf": idf,
                "bm25_ub": bm25_ub,
                "tfidf_ub": tfidf_ub,
                "max_doc_id": max(plist),
            }
        return out

    def posting_list(self, term: str) -> tuple[list[int], list[int]]:
        plist = self.postings.get(term, {})
        ids = sorted(plist)
        return ids, [plist[d] for d in ids]

    # --------------------------------------------------------------- scoring
    def _bm25(self, tf: int, doc_id: int, idf: float) -> float:
        bj = 0.3 + 0.7 * (self.doc_len[doc_id] / self.avg_doc_len)
        return (tf / (1.5 * bj + tf)) * idf

    def score_query(self, query: str | list[str], standard: str = "BM25",
                    k: int = 10, conjunctive: bool = False,
                    sort_terms: bool = False) -> list[tuple[int, float]]:
        """Brute-force exact scoring. Returns [(docId, score)] ranked by
        (score desc, docId asc), length <= k.

        Duplicate query terms score twice (M13: no dedup); terms missing
        from the lexicon are silently ignored (QueryProcessorMain.java:139-154).
        """
        if isinstance(query, str):
            terms = tokenize_text(query, parse=self.parse, squeeze=self.squeeze)
        else:
            terms = list(query)
        if sort_terms:
            terms = sorted(terms)
        terms = [t for t in terms if t in self.postings]
        if not terms:
            return []
        candidate: set[int] = set()
        for t in terms:
            candidate |= set(self.postings[t])
        if conjunctive:
            for t in terms:
                candidate &= set(self.postings[t])
        scores = {}
        for d in candidate:
            s = 0.0
            for t in terms:
                tf = self.postings[t].get(d)
                if tf is None:
                    continue
                idf = self.idf(t)
                if standard == "BM25":
                    s += self._bm25(tf, d, idf)
                else:
                    s += (1 + math.log10(tf)) * idf
            scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def score_query_qld(self, query: str | list[str], mu: float = 2000.0,
                        k: int = 10) -> list[tuple[int, float]]:
        """Brute-force query-likelihood with Dirichlet smoothing (the
        engine extension; see QueryEngine._score_terms_qld): over docs
        containing >=1 known query term,

            sum_t ln(1 + tf/(mu*cf_t/T)) + |q|*ln(mu/(len_d+mu))

        with |q| the known-term count WITH multiplicity."""
        if isinstance(query, str):
            terms = tokenize_text(query, parse=self.parse,
                                  squeeze=self.squeeze)
        else:
            terms = list(query)
        terms = [t for t in terms if t in self.postings]
        if not terms:
            return []
        T = self.total_doc_len
        candidate: set[int] = set()
        for t in terms:
            candidate |= set(self.postings[t])
        scores = {}
        for d in candidate:
            s = 0.0
            for t in terms:
                tf = self.postings[t].get(d)
                if tf:
                    cf = sum(self.postings[t].values())
                    s += math.log(1.0 + tf / (mu * cf / T))
            s += len(terms) * math.log(mu / (self.doc_len[d] + mu))
            scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
