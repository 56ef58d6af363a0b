"""Windowed term co-occurrence counts (the GloVe / word-vector count
matrix; Pennington et al. 2014 §3): for every ordered token pair
(a, b) with b at most ``window`` positions to the RIGHT of a in the
same document, the raw occurrence count and the GloVe distance-decayed
weight sum(1/d over occurrences at distance d).

Generalizes ``ops.collocations`` (adjacent pairs, d = 1) to a window;
tokenization is the shared alnum splitter so the operator stays
exactly SQL-mirrorable (counts are integers -> hash-exact; the weight
sum rounds 4 like the LM scores).

Scale shape (one content scan):
- ``map_batches`` emits map-side-combined per-batch partials: for each
  distance d one zero-copy slice pair of the flat token stream, ONE
  arrow group_by per batch over all distances together
  ((a, b) -> count, weight). Only distinct-per-batch pairs enter the
  exchange.
- one (term_a, term_b) groupby sums the partials — the only full
  exchange; ``min_count`` cuts on the combined counts afterwards
  (cheap: it's already pair-distinct).

Pair-vocabulary explosion is bounded by window x tokens per batch on
the map side and by the true distinct-pair count globally — the same
budget GloVe itself pays for its co-occurrence matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT = pa.schema([("term_a", pa.string()), ("term_b", pa.string()),
                  ("pair_count", pa.int64()), ("glove_weight", pa.float64())])


def cooccurrence_counts(ds, window: int = 5, min_count: int = 1,
                        text_col: str = "text"):
    """(term_a, term_b, pair_count, glove_weight) over ordered pairs
    within ``window`` tokens; rows with pair_count < min_count drop."""
    from ray.data.aggregate import Sum
    from .textops import _alnum_flat_terms

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    def partials(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _alnum_flat_terms(batch, text_col)
        n = len(flat)
        a_parts, b_parts, w_parts = [], [], []
        for d in range(1, window + 1):
            if n <= d:
                break
            adj = parent[d:] == parent[:-d]
            if not adj.any():
                continue
            sel = pa.array(adj)
            a_parts.append(flat.slice(0, n - d).filter(sel))
            b_parts.append(flat.slice(d, n - d).filter(sel))
            w_parts.append(np.full(int(adj.sum()), 1.0 / d))
        if not a_parts:
            return pa.table({"term_a": pa.array([], type=pa.string()),
                             "term_b": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.float64())})
        t = pa.table({
            "a": pa.concat_arrays([p.combine_chunks() if
                                   isinstance(p, pa.ChunkedArray) else p
                                   for p in a_parts]),
            "b": pa.concat_arrays([p.combine_chunks() if
                                   isinstance(p, pa.ChunkedArray) else p
                                   for p in b_parts]),
            "w": pa.array(np.concatenate(w_parts), type=pa.float64()),
        })
        g = t.group_by(["a", "b"]).aggregate([([], "count_all"),
                                              ("w", "sum")])
        return pa.table({"term_a": g["a"], "term_b": g["b"],
                         "c": g["count_all"].cast(pa.int64()),
                         "w": g["w_sum"]})

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["c"], min_count)
        t = batch.filter(keep)
        return pa.table({"term_a": t["term_a"], "term_b": t["term_b"],
                         "pair_count": t["c"],
                         "glove_weight": pc.round(t["w"], ndigits=4)})

    return (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["term_a", "term_b"])
              .aggregate(Sum("c", alias_name="c"),
                         Sum("w", alias_name="w"))
              .map_batches(finish, batch_format="pyarrow"))
