"""Champion lists (a.k.a. fancy lists / top-docs): for every term, the
m postings with the highest tf — the classic inexact-top-k retrieval
structure (Manning, Raghavan & Schütze, *Introduction to Information
Retrieval* §7.1.3): a query is first evaluated over the union of its
terms' champion lists only, falling back to full postings when the
heap isn't safe. The reference engine has no equivalent (it always
walks full lists, `MaxScore.java`); this is an index-side extension.

Shape: one streaming decode pass over the postings store (the same
batched vbyte decode as the dump), a LOSSLESS per-batch pre-top-m (a
term's per-batch survivors are >= its global top-m within that batch,
so discarding the rest can never change the final result), then one
slim (term, doc_id, tf) groupby — the exchange carries at most
m x terms x batches rows, never the postings themselves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dump import dump_postings

_EMPTY = {
    "term": pa.array([], type=pa.string()),
    "doc_id": pa.array([], type=pa.int64()),
    "tf": pa.array([], type=pa.int64()),
}


def _topm_rows(tbl: pa.Table, m: int) -> pa.Table:
    """Keep each term's top-m rows by (tf desc, doc_id asc) — one
    dictionary encode + one composite lexsort + run-length ranks, no
    per-term Python."""
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return pa.table(_EMPTY)
    terms = tbl["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    denc = pc.dictionary_encode(terms)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tf = tbl["tf"].to_numpy()
    did = tbl["doc_id"].to_numpy()
    order = np.lexsort((did, -tf, codes))
    c_sorted = codes[order]
    starts = np.flatnonzero(np.diff(c_sorted, prepend=-1))
    lens = np.diff(np.append(starts, len(order)))
    rank = np.arange(len(order)) - np.repeat(starts, lens)
    keep = order[rank < m]
    keep.sort()  # preserve input order for stable output
    sel = pa.array(keep, type=pa.int64())
    return pa.table({"term": terms.take(sel),
                     "doc_id": tbl["doc_id"].take(sel),
                     "tf": tbl["tf"].take(sel)})


def champion_lists(index_dir: str, m: int = 10, docno_offset: int = -1):
    """Dataset (term, doc_id, tf): each term's m highest-tf postings,
    ties broken by ascending doc_id."""
    if m <= 0:
        raise ValueError("m must be positive")
    ds = dump_postings(index_dir, docno_offset=docno_offset)

    def pre(batch: pa.Table) -> pa.Table:
        return _topm_rows(batch, m)

    def final(group: pa.Table) -> pa.Table:
        return _topm_rows(group, m)

    return (ds.map_batches(pre, batch_format="pyarrow")
            .groupby("term")
            .map_groups(final, batch_format="pyarrow"))
