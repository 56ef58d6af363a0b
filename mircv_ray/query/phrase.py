"""Phrase (exact adjacency) queries over the inverted index.

ENGINE EXTENSION — the reference stores (docId, tf) postings only (no
positions: ``m/model/PostingList.java``, SURVEY §2.6), so phrase
matching is implemented the way positional-less engines do it:

1. **Index prune**: a phrase's candidate set is the conjunctive
   intersection of its terms' posting lists — bounded by the rarest
   term's df, fetched via the same row-group-pruned reads the scorer
   uses. No content is touched for docs that can't match.
2. **Candidate-only verify**: one ``map_batches`` pass over the corpus
   drops non-candidate rows per batch (Arrow ``is_in`` against a
   broadcast candidate-key set — ``ray.put`` once, read zero-copy per
   actor) BEFORE tokenizing, then counts exact adjacency occurrences
   with vectorized Arrow/NumPy kernels over the flattened token
   stream. Tokenizer state is built once per actor.

At 100 TB the corpus pass is the cost to watch: it is a single
column-pruned scan whose per-batch work collapses to one hash-probe
for batches holding no candidates (the common case — candidates are
rarest-term-df sized). A positional-postings sidecar would remove the
scan entirely; that is the documented scale-up path, not needed for
parity since the reference has no phrase support at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..text.tokenizer import Tokenizer, tokenize_text
from .engine import IndexReader

__all__ = ["phrase_match", "phrase_occurrence_counts"]


def phrase_occurrence_counts(tokens_col, terms: list[str]) -> np.ndarray:
    """Per-row count of exact adjacent occurrences of ``terms`` inside a
    ``list<string>`` tokens column. Vectorized: one ``pc.equal`` pass
    per phrase term over the flattened stream, one boolean AND-reduce,
    one bincount — no Python loop over rows or tokens."""
    if isinstance(tokens_col, pa.ChunkedArray):
        tokens_col = tokens_col.combine_chunks()
    n_rows = len(tokens_col)
    counts = np.asarray(tokens_col.value_lengths().fill_null(0),
                        dtype=np.int64)
    flat = tokens_col.flatten()
    m = len(terms)
    n_flat = len(flat)
    if n_flat == 0 or m == 0 or n_flat < m:
        return np.zeros(n_rows, dtype=np.int64)
    # hit[i] = tokens[i] == terms[0] & tokens[i+1] == terms[1] & ...
    hit = np.asarray(pc.equal(flat, terms[0]).fill_null(False))
    for k in range(1, m):
        eq = np.asarray(pc.equal(flat, terms[k]).fill_null(False))
        h = np.zeros(n_flat, dtype=bool)
        h[: n_flat - k] = hit[: n_flat - k] & eq[k:]
        hit = h
    # a start position is valid only when the whole window stays inside
    # one document: i + m - 1 < end_offset(doc_of(i))
    doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    ends = np.cumsum(counts)
    idx = np.flatnonzero(hit)
    if len(idx) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    d = doc_of[idx]
    idx = idx[idx + m - 1 < ends[d]]
    if len(idx) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    return np.bincount(doc_of[idx], minlength=n_rows)


def _candidates(reader: IndexReader, terms: list[str]) -> np.ndarray:
    """Engine doc ids containing EVERY phrase term (sorted), from the
    decoded posting lists — intersections ordered rarest-first so the
    working set never exceeds the smallest df."""
    lists = []
    for t in set(terms):
        dec = reader.decoded(t)
        if dec is None:
            return np.empty(0, dtype=np.int64)
        lists.append(dec[0])
    lists.sort(key=len)
    cand = lists[0]
    for ids in lists[1:]:
        cand = cand[np.isin(cand, ids, assume_unique=True)]
        if len(cand) == 0:
            break
    if len(cand) and len(reader.tombstones):
        cand = cand[reader.alive_mask(cand)]
    return cand


class _PhraseVerifier:
    """Actor-pool verify stage: candidate filter + adjacency count."""

    def __init__(self, state_ref, phrases: list[list[str]], parse: bool,
                 squeeze: bool, content_col: str):
        keys, doc_ids, memb = ray.get(state_ref)
        self.keys = keys            # pa.StringArray of "repo\x00path"
        self.doc_ids = doc_ids      # aligned engine ids (np.int64)
        self.memb = memb            # (n_cand, n_phrases) bool matrix
        self.phrases = phrases
        self.tok = Tokenizer(parse=parse, squeeze=squeeze,
                             content_col=content_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .candidates import filter_to_candidates
        empty = pa.table({"qid": pa.array([], type=pa.int64()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "n_occurrences": pa.array([], type=pa.int64())})
        hitb = filter_to_candidates(batch, self.keys)
        if hitb is None:
            return empty
        batch, cand_pos = hitb
        toks = self.tok(batch)["tokens"]
        qids, dids, occs = [], [], []
        for qid, terms in enumerate(self.phrases):
            rows = np.flatnonzero(self.memb[cand_pos, qid])
            if len(rows) == 0:
                continue
            n = phrase_occurrence_counts(toks.take(pa.array(rows)), terms)
            hitrows = rows[n > 0]
            if len(hitrows) == 0:
                continue
            qids.append(np.full(len(hitrows), qid, dtype=np.int64))
            dids.append(self.doc_ids[cand_pos[hitrows]])
            occs.append(n[n > 0].astype(np.int64))
        if not qids:
            return empty
        return pa.table({"qid": pa.array(np.concatenate(qids)),
                         "doc_id": pa.array(np.concatenate(dids)),
                         "n_occurrences": pa.array(np.concatenate(occs))})


def phrase_match(index_dir: str, corpus, phrases: list[str],
                 parse: bool = False, squeeze: bool = False,
                 content_col: str = "content",
                 concurrency: int | tuple | None = None):
    """Exact-phrase search: for each phrase string return every live
    document containing its tokens ADJACENT and in order, with the
    occurrence count.

    ``corpus`` is the (repo, path, content) Dataset the index was built
    from. Returns a Dataset of (qid, doc_id, n_occurrences) where
    ``doc_id`` is the engine id (docno = doc_id - 1). Phrases whose
    terms miss the lexicon, or tokenize to nothing, match no documents;
    a single-term "phrase" degenerates to that term's tf."""
    reader = IndexReader(index_dir)
    toks = [tokenize_text(p, parse=parse, squeeze=squeeze)
            for p in phrases]
    per_phrase = [(_candidates(reader, t) if t else
                   np.empty(0, dtype=np.int64)) for t in toks]
    union = np.unique(np.concatenate(per_phrase)) \
        if any(len(c) for c in per_phrase) else np.empty(0, dtype=np.int64)
    schema = pa.schema([("qid", pa.int64()), ("doc_id", pa.int64()),
                        ("n_occurrences", pa.int64())])
    import ray.data as rd
    if len(union) == 0:
        return rd.from_arrow(schema.empty_table())
    # candidate keys: engine id -> (repo, path) from the index's docs
    # table, fetched for the candidate ids only (rarest-term-df sized)
    from .candidates import candidate_key_table, default_scan_concurrency
    keys, ids = candidate_key_table(index_dir, union)
    memb = np.zeros((len(ids), len(phrases)), dtype=bool)
    for qi, cand in enumerate(per_phrase):
        memb[np.searchsorted(ids, cand), qi] = True
    state_ref = ray.put((keys, ids, memb))
    if concurrency is None:
        concurrency = default_scan_concurrency()
    return corpus.select_columns(["repo", "path", content_col]) \
        .map_batches(_PhraseVerifier, batch_format="pyarrow",
                     concurrency=concurrency,
                     fn_constructor_args=(state_ref, toks, parse,
                                          squeeze, content_col))
