"""Shared scaffolding for candidate-only corpus scans.

Several retrieval extensions (phrase verify, snippets, PRF feedback
tfs) follow the same shape: resolve candidate engine doc ids to
(repo, path) keys from the index's ``docs/`` table, broadcast the key
set once via ``ray.put``, and drop non-candidate rows per batch with
one hash probe BEFORE tokenizing. This module is the single home for
that scaffolding so key construction and lookup semantics cannot
drift between operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["candidate_key_table", "default_scan_concurrency",
           "filter_to_candidates"]


def candidate_key_table(index_dir: str, doc_ids: np.ndarray):
    """(keys, ids) for the given engine doc ids: ``keys`` is the
    "repo\\x00path" StringArray and ``ids`` the aligned int64 doc-id
    array, both sorted by doc_id (callers searchsorted into ``ids``).
    Reads only the candidate rows of the docs table."""
    dt = pq.read_table(str(f"{index_dir}/docs"),
                       columns=["doc_id", "repo", "path"],
                       filters=[("doc_id", "in", doc_ids.tolist())])
    order = np.argsort(dt["doc_id"].to_numpy())
    dt = dt.take(pa.array(order))
    keys = pc.binary_join_element_wise(dt["repo"], dt["path"], "\x00")
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return keys, dt["doc_id"].to_numpy().astype(np.int64)


def default_scan_concurrency():
    """Autoscaling actor-pool bounds for an embarrassingly parallel
    candidate scan (per-batch work collapses to one hash probe for
    candidate-free batches)."""
    import ray
    return (1, max(2, int(ray.cluster_resources().get("CPU", 8))))


def filter_to_candidates(batch: pa.Table, keys):
    """Drop non-candidate rows of a (repo, path, ...) batch. Returns
    ``(filtered_batch, cand_pos)`` where ``cand_pos[i]`` is row i's
    index into the broadcast ``keys``/ids arrays, or ``None`` when the
    batch holds no candidates."""
    key = pc.binary_join_element_wise(batch["repo"], batch["path"],
                                      "\x00")
    pos = pc.index_in(key, value_set=keys)
    sel = pc.is_valid(pos)
    if not pc.any(sel).as_py():
        return None
    return (batch.filter(sel),
            np.asarray(pos.filter(sel), dtype=np.int64))
