"""Corpus-wide most-frequent word n-grams — the decontamination- and
boilerplate-list building step (the n-gram blocklists of C4/Gopher-style
cleaning and the eval-overlap lists of Brown et al. 2020 Appendix C are
exactly "the top n-grams of a corpus").

Scale shape (ONE content scan, one slim exchange):
- ``map_batches`` emits map-side-combined per-batch partials: the flat
  alnum token stream (the shared splitter, so the operator stays
  SQL-mirrorable) slides an n-token window via n zero-copy slices
  joined element-wise; ONE arrow group_by per batch means only the
  batch-DISTINCT grams enter the exchange.
- one (ngram) groupby sums the partials — the only full exchange,
  bounded by the true distinct-gram count, never the corpus.
- counts are final after the groupby, so per-block top-k by
  (count desc, gram asc) is LOSSLESS (the global top-k is a subset of
  the union of per-block top-ks); ONE constant-key group task merges
  the <= k·blocks survivors. ``min_count`` cuts pair-distinct rows
  before the top-k.

The reference engine has no corpus-analysis surface at all (its
lexicon's collectionFrequency, `m/model/LexiconEntry.java`, is the
n=1 special case of this operator's count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT = pa.schema([("ngram", pa.string()), ("ngram_count", pa.int64())])


def _empty(with_rank: bool) -> pa.Table:
    cols = {"ngram": pa.array([], type=pa.string()),
            "ngram_count": pa.array([], type=pa.int64())}
    if with_rank:
        cols["ngram_rank"] = pa.array([], type=pa.int64())
    return pa.table(cols)


def top_ngrams(ds, n: int = 3, k: int = 50, min_count: int = 1,
               text_col: str = "text"):
    """Top ``k`` corpus-wide word ``n``-grams by count, ties broken by
    gram ascending (bit-deterministic, partition-independent). Grams
    never cross document boundaries. Returns (ngram, ngram_count,
    ngram_rank) with rank 1..k.
    """
    from ray.data.aggregate import Sum
    from .textops import _alnum_flat_terms

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    def partials(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _alnum_flat_terms(batch, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat) - n + 1
        if m <= 0:
            return _empty(False)
        if n == 1:
            grams = flat
        else:
            # a window is valid iff its first and last token share a doc
            # (parents are nondecreasing within a batch's flat stream)
            adj = pa.array(parent[n - 1:] == parent[: -(n - 1)])
            slices = [flat.slice(d, m) for d in range(n)]
            grams = pc.binary_join_element_wise(*slices, " ").filter(adj)
        if len(grams) == 0:
            return _empty(False)
        g = (pa.table({"ngram": grams}).group_by("ngram")
             .aggregate([([], "count_all")]))
        return pa.table({"ngram": g["ngram"],
                         "ngram_count": g["count_all"].cast(pa.int64())})

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("ngram")
              .aggregate(Sum("ngram_count", alias_name="ngram_count")))

    def top_block(tbl: pa.Table, with_rank: bool) -> pa.Table:
        if tbl.num_rows == 0 or "ngram" not in tbl.column_names:
            return _empty(with_rank)
        c = tbl["ngram_count"].to_numpy(zero_copy_only=False)
        keep = c >= min_count
        if not keep.all():
            tbl = tbl.filter(pa.array(keep))
            c = c[keep]
        if tbl.num_rows == 0:
            return _empty(with_rank)
        take = pc.sort_indices(
            tbl, sort_keys=[("ngram_count", "descending"),
                            ("ngram", "ascending")]).slice(0, k)
        out = pa.table({"ngram": tbl["ngram"].take(take),
                        "ngram_count": tbl["ngram_count"].take(take)
                        .cast(pa.int64())})
        if with_rank:
            out = out.append_column(
                "ngram_rank", pa.array(np.arange(1, out.num_rows + 1),
                                       type=pa.int64()))
        return out

    pre = counts.map_batches(lambda b: top_block(b, False),
                             batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__all", pa.array(np.zeros(batch.num_rows, np.int8)))

    def merge(group: pa.Table) -> pa.Table:
        cols = [cn for cn in group.column_names if cn != "__all"]
        return top_block(group.select(cols) if cols else group, True)

    return (pre.map_batches(tag, batch_format="pyarrow")
            .groupby("__all").map_groups(merge, batch_format="pyarrow"))
