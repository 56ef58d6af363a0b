"""Snippet extraction: best keyword-in-context window per (query, doc).

ENGINE EXTENSION (the reference returns bare docnos,
``m/queryProcessor/QueryProcessorMain.java:111-118`` — no result
presentation layer). Classic fulltext snippeting on top of the
positional sidecar (`build/positions.py`):

1. **Window selection from the index alone**: for each query (a bag of
   distinct terms) and each live doc containing ALL of them, the BEST
   minimal-cover window — smallest token span covering one occurrence
   of every term, earliest such window on ties — computed fully
   vectorized over composite ``(docId << 32 | pos)`` keys
   (`positions._min_cover_windows`). No content is touched.
2. **Candidate-only content pass**: one ``map_batches`` scan extracts
   each result window ± ``ctx`` context tokens. Non-candidate rows are
   dropped per batch with one hash probe BEFORE tokenizing (the
   `query/phrase.py` verify shape: candidate keys broadcast once via
   ``ray.put``); window slicing is one take-index gather + one
   ``binary_join`` over ALL windows in the batch — no per-row Python.

At 100 TB the numbers mirror phrase verify: the windows table is
output-sized (queries × matching docs), the scan is a single
column-pruned pass whose per-batch work collapses to a hash probe for
batches holding no result docs, and snippet bytes are the only new
content that moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..text.tokenizer import Tokenizer, tokenize_text

__all__ = ["snippet_extract", "snippet_windows"]


def snippet_windows(index_dir: str, queries: list[str],
                    parse: bool = False, squeeze: bool = False) -> pa.Table:
    """Best window per (query, live doc) from the positional sidecar:
    ``(qid, doc_id, start, min_span)`` with ``start`` the 0-based in-doc
    token position of the window's first token. Docs missing any query
    term (or tombstoned) are absent; queries whose terms miss the
    lexicon match nothing."""
    import json
    from pathlib import Path

    from ..build.positions import _min_cover_windows, term_keysets
    from ..build.tombstones import load_tombstones
    stats = json.loads((Path(index_dir) / "stats.json").read_text())
    num_shards = int(stats["num_shards"])
    salt_buckets = int(stats.get("salt_buckets", 1))
    tombs = load_tombstones(index_dir)
    cache: dict[str, tuple | None] = {}
    out_q, out_d, out_s, out_w = [], [], [], []
    for qid, q in enumerate(queries):
        terms = sorted(set(tokenize_text(q, parse=parse,
                                         squeeze=squeeze)))
        if not terms:
            continue
        keysets = term_keysets(index_dir, terms, num_shards,
                               salt_buckets, cache)
        if keysets is None:
            continue
        docs, spans, starts = _min_cover_windows(keysets)
        if len(docs) == 0:
            continue
        if len(tombs):
            alive = ~np.isin(docs, tombs)
            docs, spans, starts = docs[alive], spans[alive], starts[alive]
        out_q.append(np.full(len(docs), qid, dtype=np.int64))
        out_d.append(docs)
        out_s.append(starts)
        out_w.append(spans)
    if not out_q:
        return pa.table({"qid": pa.array([], type=pa.int64()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "start": pa.array([], type=pa.int64()),
                         "min_span": pa.array([], type=pa.int64())})
    return pa.table({"qid": pa.array(np.concatenate(out_q)),
                     "doc_id": pa.array(np.concatenate(out_d)),
                     "start": pa.array(np.concatenate(out_s)),
                     "min_span": pa.array(np.concatenate(out_w))})


class _SnippetSlicer:
    """Actor-pool content stage: candidate filter + window slice."""

    def __init__(self, state_ref, ctx: int, parse: bool, squeeze: bool,
                 content_col: str):
        # keys: "repo\x00path" per candidate doc (sorted by doc_id);
        # win_*: flat window arrays; win_row: index into keys per window
        (self.keys, self.win_row, self.win_qid, self.win_doc,
         self.win_start, self.win_span) = ray.get(state_ref)
        self.ctx = ctx
        self.tok = Tokenizer(parse=parse, squeeze=squeeze,
                             content_col=content_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .candidates import filter_to_candidates
        empty = pa.table({"qid": pa.array([], type=pa.int64()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "start": pa.array([], type=pa.int64()),
                          "min_span": pa.array([], type=pa.int64()),
                          "snippet": pa.array([], type=pa.string())})
        hitb = filter_to_candidates(batch, self.keys)
        if hitb is None:
            return empty
        batch, cand_pos = hitb
        toks = self.tok(batch)["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = np.asarray(toks.value_lengths().fill_null(0),
                          dtype=np.int64)
        offs = np.cumsum(lens) - lens
        flat = toks.flatten()
        # windows whose doc is in this batch; r = local row per window
        hit = np.flatnonzero(np.isin(self.win_row, cand_pos))
        if len(hit) == 0:
            return empty
        row_of = np.full(int(cand_pos.max()) + 1, -1, dtype=np.int64)
        row_of[cand_pos] = np.arange(len(cand_pos))
        r = row_of[self.win_row[hit]]
        # sidecar/corpus mismatch guard: every window must fit its
        # doc's token stream (positions and the scan tokenize the SAME
        # content by construction — a violation means the caller paired
        # the index with a different corpus)
        over = self.win_start[hit] + self.win_span[hit] > lens[r]
        if over.any():
            i = int(np.flatnonzero(over)[0])
            raise ValueError(
                "positional sidecar does not match the supplied corpus: "
                f"doc_id {int(self.win_doc[hit][i])} window end "
                f"{int(self.win_start[hit][i] + self.win_span[hit][i])} "
                f"> {int(lens[r][i])} tokens")
        s = np.maximum(self.win_start[hit] - self.ctx, 0)
        e = np.minimum(self.win_start[hit] + self.win_span[hit]
                       + self.ctx, lens[r])
        # take-index gather over all windows at once
        wl = e - s
        starts_f = offs[r] + s
        idx = (np.arange(int(wl.sum()), dtype=np.int64)
               - np.repeat(np.cumsum(wl) - wl, wl)
               + np.repeat(starts_f, wl))
        woffs = np.empty(len(wl) + 1, dtype=np.int64)
        woffs[0] = 0
        np.cumsum(wl, out=woffs[1:])
        gathered = flat.take(pa.array(idx))
        win_lists = pa.LargeListArray.from_arrays(
            pa.array(woffs, type=pa.int64()), gathered)
        snips = pc.binary_join(win_lists, " ")
        return pa.table({
            "qid": pa.array(self.win_qid[hit]),
            "doc_id": pa.array(self.win_doc[hit]),
            "start": pa.array(self.win_start[hit]),
            "min_span": pa.array(self.win_span[hit]),
            "snippet": snips,
        })


def snippet_extract(index_dir: str, corpus, queries: list[str],
                    ctx: int = 3, parse: bool = False,
                    squeeze: bool = False, content_col: str = "content",
                    concurrency: int | tuple | None = None):
    """Keyword-in-context snippets: for each query and each live doc
    containing ALL its terms, the best minimal-cover window ± ``ctx``
    tokens of context, as the string of those tokens joined by spaces.

    ``corpus`` is the (repo, path, content) Dataset the index was built
    from; the positional sidecar must exist (`build_positions_index`).
    Returns a Dataset of ``(qid, doc_id, start, min_span, snippet)``
    with engine doc ids (docno = doc_id - 1) and 0-based ``start``."""
    wins = snippet_windows(index_dir, queries, parse=parse,
                           squeeze=squeeze)
    import ray.data as rd
    schema = pa.schema([("qid", pa.int64()), ("doc_id", pa.int64()),
                        ("start", pa.int64()), ("min_span", pa.int64()),
                        ("snippet", pa.string())])
    if wins.num_rows == 0:
        return rd.from_arrow(schema.empty_table())
    from .candidates import candidate_key_table, default_scan_concurrency
    cand = np.unique(wins["doc_id"].to_numpy())
    keys, ids = candidate_key_table(index_dir, cand)
    win_doc = wins["doc_id"].to_numpy()
    state_ref = ray.put((keys, np.searchsorted(ids, win_doc),
                         wins["qid"].to_numpy(), win_doc,
                         wins["start"].to_numpy(),
                         wins["min_span"].to_numpy()))
    if concurrency is None:
        concurrency = default_scan_concurrency()
    return corpus.select_columns(["repo", "path", content_col]) \
        .map_batches(_SnippetSlicer, batch_format="pyarrow",
                     concurrency=concurrency,
                     fn_constructor_args=(state_ref, ctx, parse,
                                          squeeze, content_col))
