"""Faceted search: metadata-facet counts over a query's FULL match set.

ENGINE EXTENSION (the reference returns ranked docnos only). Classic
search-UI facets: for each query, how many matching documents fall in
each bucket of a metadata column (``lang``, ``repo``, ...) — over the
ENTIRE disjunctive match set (every live doc containing >= 1 known
query term), not just the scored top-k.

Dataflow: match ids come from the index alone (union of the decoded
posting lists, tombstone-filtered — df-sized, no content); the facet
column then streams ONCE through ``map_batches`` over the index's own
``docs/`` parquet (two columns, column-pruned) with the per-query id
sets broadcast via ``ray.put``: each batch does one ``np.isin`` + one
``value_counts`` per query and emits (qid, facet, n) partials, summed
at the end (partials are batches x queries x facet-cardinality —
metadata-sized, never doc-sized).

At 100 TB: the scan is over the doc TABLE (rows = docs, two thin
columns), the broadcast is the match-id arrays (df-sized; for
mega-queries ship per-shard slices), and the reduce is facet-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["facet_counts"]


class _FacetCounter:
    def __init__(self, state_ref, facet_col: str):
        self.id_sets = ray.get(state_ref)   # {qid: sorted np.int64 ids}
        self.facet_col = facet_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        facet = batch[self.facet_col]
        if isinstance(facet, pa.ChunkedArray):
            facet = facet.combine_chunks()
        qids, vals, ns = [], [], []
        for qid, mset in self.id_sets.items():
            mask = np.isin(ids, mset, assume_unique=True)
            if not mask.any():
                continue
            vc = pc.value_counts(facet.filter(pa.array(mask)))
            v = vc.field("values")
            c = vc.field("counts").to_numpy(zero_copy_only=False)
            qids.append(np.full(len(v), qid, dtype=np.int64))
            vals.append(v)
            ns.append(c.astype(np.int64))
        if not qids:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "facet": pa.array([], type=pa.string()),
                             "n_docs": pa.array([], type=pa.int64())})
        return pa.table({"qid": pa.array(np.concatenate(qids)),
                         "facet": pa.concat_arrays(
                             [x.cast(pa.string()) for x in vals]),
                         "n_docs": pa.array(np.concatenate(ns))})


def facet_counts(index_dir: str, queries: list[list[str]],
                 facet_col: str = "lang",
                 concurrency: int | tuple | None = None) -> pa.Table:
    """Per (query, facet value) count of live matching docs
    (disjunctive match set). Returns (qid, facet, n_docs)."""
    import ray.data as rd

    from .engine import IndexReader
    reader = IndexReader(index_dir)
    id_sets: dict[int, np.ndarray] = {}
    for qid, terms in enumerate(queries):
        lists = [reader.decoded(t) for t in set(terms)]
        lists = [ids for dec in lists if dec is not None
                 for ids in (dec[0],)]
        if not lists:
            continue
        u = lists[0] if len(lists) == 1 else \
            np.unique(np.concatenate(lists))
        if len(reader.tombstones):
            u = u[reader.alive_mask(u)]
        if len(u):
            id_sets[qid] = u
    empty = pa.table({"qid": pa.array([], type=pa.int64()),
                      "facet": pa.array([], type=pa.string()),
                      "n_docs": pa.array([], type=pa.int64())})
    if not id_sets:
        return empty
    from .candidates import default_scan_concurrency
    state_ref = ray.put(id_sets)
    if concurrency is None:
        concurrency = default_scan_concurrency()
    ds = rd.read_parquet(str(f"{index_dir}/docs"),
                         columns=["doc_id", facet_col]) \
        .map_batches(_FacetCounter, batch_format="pyarrow",
                     concurrency=concurrency,
                     fn_constructor_args=(state_ref, facet_col))
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not parts:
        return empty
    merged = pa.concat_tables(parts).combine_chunks()
    agg = merged.group_by(["qid", "facet"]).aggregate([("n_docs", "sum")])
    # select by NAME — pyarrow's group_by output column order has
    # differed across releases
    return pa.table({"qid": agg["qid"], "facet": agg["facet"],
                     "n_docs": agg["n_docs_sum"]})
