"""Pseudo-relevance feedback (PRF) query expansion over the BM25 engine.

ENGINE EXTENSION (the reference scores the literal query only,
``m/queryProcessor/QueryProcessorMain.java:165-176``). Classic
Rocchio-style PRF (Rocchio 1971; RM-style two-pass retrieval):

1. **First pass**: the standard BM25 top-``k_fb`` docs per query (the
   engine's own scorer — identical math and tie-breaks to the
   ``bm25_topk`` oracle).
2. **Expansion selection**: candidate terms are counted from the
   feedback docs' content in ONE candidate-only corpus pass (the
   `query/phrase.py` shape — broadcast feedback-doc keys, per-batch
   hash-probe drop before tokenizing; the scan output is
   (feedback docs × their vocab)-sized, never corpus-sized). A term
   qualifies if it is not an original query term and its df is not
   degenerate (``df * df_cap <= N`` — drops stopword-like terms); the
   top-``m_exp`` by (summed tf over the query's feedback docs DESC,
   term ASC) expand the query. Integer weights keep the selection
   bit-deterministic against the SQL oracle.
3. **Second pass**: BM25 top-``k`` over original + expansion terms
   (original duplicates still score twice — the reference's quirk).

At 100 TB the two scoring passes are in-actor index reads (row-group
pruned, as every query path) and the only content touched is the
``queries x k_fb`` feedback docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import QueryConfig
from ..text.tokenizer import Tokenizer

__all__ = ["bm25_prf", "feedback_term_counts"]


class _TfCounter:
    """Actor-pool content stage: per (feedback doc, term) tf counts."""

    def __init__(self, state_ref, parse: bool, squeeze: bool,
                 content_col: str):
        self.keys, self.doc_ids = ray.get(state_ref)
        self.tok = Tokenizer(parse=parse, squeeze=squeeze,
                             content_col=content_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .candidates import filter_to_candidates
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "term": pa.array([], type=pa.string()),
                          "tf": pa.array([], type=pa.int64())})
        hitb = filter_to_candidates(batch, self.keys)
        if hitb is None:
            return empty
        batch, cand_pos = hitb
        toks = self.tok(batch)["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return empty
        denc = pc.dictionary_encode(flat)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy().astype(np.int64)
        comp = (parents << np.int64(32)) | codes
        comp.sort()
        change = np.flatnonzero(np.append(True, np.diff(comp) != 0))
        tf = np.diff(np.append(change, len(comp))).astype(np.int64)
        run = comp[change]
        return pa.table({
            "doc_id": pa.array(
                self.doc_ids[cand_pos[(run >> np.int64(32))]]),
            "term": denc.dictionary.take(
                pa.array(run & np.int64(0xFFFFFFFF))),
            "tf": pa.array(tf),
        })


def feedback_term_counts(index_dir: str, corpus, fb_doc_ids: np.ndarray,
                         parse: bool, squeeze: bool,
                         content_col: str = "content",
                         concurrency=None) -> pa.Table:
    """(doc_id, term, tf) for every feedback doc, via one candidate-only
    corpus scan (non-candidate batches cost one hash probe)."""
    from .candidates import candidate_key_table, default_scan_concurrency
    keys, ids = candidate_key_table(index_dir, fb_doc_ids)
    state_ref = ray.put((keys, ids))
    if concurrency is None:
        concurrency = default_scan_concurrency()
    out = corpus.select_columns(["repo", "path", content_col]) \
        .map_batches(_TfCounter, batch_format="pyarrow",
                     concurrency=concurrency,
                     fn_constructor_args=(state_ref, parse, squeeze,
                                          content_col))
    tbls = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "term": pa.array([], type=pa.string()),
                         "tf": pa.array([], type=pa.int64())})
    return pa.concat_tables(tbls).combine_chunks()


def more_like_this(index_dir: str, corpus, doc_ids: list[int],
                   m_terms: int = 5, df_cap: int = 10, k: int = 10,
                   parse: bool = False, squeeze: bool = False,
                   content_col: str = "content") -> tuple[pa.Table, dict]:
    """Document-similarity queries (Lucene-style "more like this"):
    for each source doc, its top-``m_terms`` representative terms —
    by (tf within the doc DESC, term ASC), dropping stopword-like
    ``df * df_cap > N`` terms; integer weights keep selection
    bit-deterministic — score as a disjunctive BM25 top-``k`` with the
    source doc itself excluded. The source docs' terms come from the
    same candidate-only scan PRF uses (only ``len(doc_ids)`` docs'
    content is touched). Returns (table(qid, doc_id, score),
    {qid: [terms]}) where qid indexes ``doc_ids``."""
    from .engine import QueryEngine
    eng = QueryEngine(index_dir, QueryConfig(
        standard="BM25", k=k + 1, parse=parse, squeeze=squeeze))
    n = eng.reader.n_docs
    src = np.unique(np.asarray(doc_ids, dtype=np.int64))
    counts = feedback_term_counts(index_dir, corpus, src,
                                  parse, squeeze, content_col)
    cdoc = counts["doc_id"].to_numpy()
    cterm = counts["term"].to_pylist()
    ctf = counts["tf"].to_numpy()
    terms_of: dict[int, list[str]] = {}
    for qid, d in enumerate(doc_ids):
        rows = np.flatnonzero(cdoc == d)
        w = []
        for i in rows:
            t = cterm[i]
            lex = eng.reader.lexicon_entry(t)
            if lex is None or lex[0] * df_cap > n:
                continue
            w.append((-int(ctf[i]), t))
        terms_of[qid] = [t for _, t in sorted(w)[:m_terms]]
    qids, dids, scores = [], [], []
    for qid, d in enumerate(doc_ids):
        # engine k is k+1 so dropping the source doc still fills k
        hits = [(doc_id, s) for doc_id, s in
                eng.score_terms(terms_of[qid], conjunctive=False)
                if doc_id != d][:k]
        for doc_id, s in hits:
            qids.append(qid)
            dids.append(doc_id)
            scores.append(s)
    return (pa.table({"qid": pa.array(qids, type=pa.int64()),
                      "doc_id": pa.array(dids, type=pa.int64()),
                      "score": pa.array(scores, type=pa.float64())}),
            terms_of)


def bm25_prf(index_dir: str, corpus, queries: list[list[str]],
             k_fb: int = 5, m_exp: int = 3, df_cap: int = 10,
             k: int = 10, parse: bool = False, squeeze: bool = False,
             content_col: str = "content") -> tuple[pa.Table, dict]:
    """Two-pass BM25 with pseudo-relevance-feedback expansion.

    ``queries`` are term lists (already tokenized). Returns the final
    ``(qid, doc_id, score)`` table (engine doc ids, top-``k`` per query
    by (score DESC, doc_id ASC)) plus ``{qid: [expansion terms]}``."""
    from .engine import QueryEngine
    eng = QueryEngine(index_dir, QueryConfig(
        standard="BM25", k=max(k, k_fb), parse=parse, squeeze=squeeze))
    n = eng.reader.n_docs
    first = {qid: eng.score_terms(terms, conjunctive=False)[:k_fb]
             for qid, terms in enumerate(queries)}
    fb_ids = np.unique(np.array(
        [d for hits in first.values() for d, _ in hits], dtype=np.int64))
    expansions: dict[int, list[str]] = {}
    if len(fb_ids):
        counts = feedback_term_counts(index_dir, corpus, fb_ids,
                                      parse, squeeze, content_col)
        cdoc = counts["doc_id"].to_numpy()
        cterm = counts["term"].to_pylist()
        ctf = counts["tf"].to_numpy()
        for qid, terms in enumerate(queries):
            mine = np.isin(cdoc, np.array([d for d, _ in first[qid]],
                                          dtype=np.int64))
            w: dict[str, int] = {}
            orig = set(terms)
            for t, f in zip([cterm[i] for i in np.flatnonzero(mine)],
                            ctf[mine]):
                if t in orig:
                    continue
                lex = eng.reader.lexicon_entry(t)
                if lex is None or lex[0] * df_cap > n:
                    continue
                w[t] = w.get(t, 0) + int(f)
            expansions[qid] = [t for t, _ in sorted(
                w.items(), key=lambda kv: (-kv[1], kv[0]))[:m_exp]]
    qids, dids, scores = [], [], []
    for qid, terms in enumerate(queries):
        full = list(terms) + expansions.get(qid, [])
        for doc_id, score in eng.score_terms(full,
                                             conjunctive=False)[:k]:
            qids.append(qid)
            dids.append(doc_id)
            scores.append(score)
    return (pa.table({"qid": pa.array(qids, type=pa.int64()),
                      "doc_id": pa.array(dids, type=pa.int64()),
                      "score": pa.array(scores, type=pa.float64())}),
            expansions)
