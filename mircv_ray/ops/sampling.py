"""Data-mixture sampling operators for training-data pipelines."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textops import TOKEN_COUNT_RE


def source_quota_sample(ds, budget_tokens: int, source_col: str = "source",
                        id_col: str = "doc_id", text_col: str = "text"):
    """Per-source token-budget quota (the mixture-weighting primitive:
    cap each source's contribution at ``budget_tokens``).

    Documents are taken in ascending ``id_col`` order within each source
    while the running token total (inclusive) stays <= the budget.
    Returns (doc_id, source, n_tokens, cum_tokens) for the KEPT docs.

    Shape: one vectorized counting scan (content never shuffles — only
    slim (id, source, n_tokens) rows move), then a per-source group task
    doing a sort + cumsum. A source whose row count dwarfs a worker
    (the mega-source analogue of `sessionize`'s mega-user) needs the
    salted two-phase variant — per-(source, id-range) partial sums, then
    a tiny prefix-offset exchange — mirroring
    `ops/windows.py::sessionize(salt_width_us=...)`; at that point the
    quota cut lands in exactly one range and the others filter locally.
    """

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[text_col], TOKEN_COUNT_RE)
        n = n.combine_chunks() if isinstance(n, pa.ChunkedArray) else n
        return pa.table({id_col: batch[id_col],
                         source_col: batch[source_col],
                         "n_tokens": n.cast(pa.int64())})

    def quota(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          source_col: pa.array([], type=pa.string()),
                          "n_tokens": pa.array([], type=pa.int64()),
                          "cum_tokens": pa.array([], type=pa.int64())})
        if group.num_rows == 0 or group.num_columns == 0:
            return empty
        order = pc.sort_indices(group[id_col])
        g = group.take(order)
        cum = np.cumsum(g["n_tokens"].to_numpy())
        keep = cum <= budget_tokens
        sel = pa.array(keep)
        return pa.table({id_col: g[id_col].filter(sel),
                         source_col: g[source_col].filter(sel),
                         "n_tokens": g["n_tokens"].filter(sel),
                         "cum_tokens": pa.array(cum[keep])})

    counted = ds.map_batches(count, batch_format="pyarrow")
    return counted.groupby(source_col).map_groups(quota,
                                                  batch_format="pyarrow")


def hash_split(ds, id_col: str, fractions: dict[str, float],
               hash_mode: str = "crc32", salt: int = 0):
    """Deterministic train/val/test splitting: adds a ``split`` column
    that is a pure function of each row's id — map-only, no shuffle, no
    RNG state, identical at any partitioning or cluster size (the
    property a 100-TB split needs: resume and backfill re-derive every
    assignment bit-identically).

    bucket = hash(id, salt) % 1_000_000; splits own consecutive bucket
    ranges in ``fractions`` insertion order (values must sum to 1).
    ``hash_mode``: "crc32" hashes the id's string form (any type);
    "knuth32" is the Knuth multiplicative hash on integer ids —
    weaker mixing, but exactly expressible in ANSI SQL, so oracle-
    checkable end to end.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, expected 1.0")
    if hash_mode not in ("crc32", "knuth32"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names]) * 1_000_000
    bounds[-1] = 1_000_000  # float-roundoff guard: last split owns the tail

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if hash_mode == "knuth32":
            v = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ((v + np.uint64(salt)) * np.uint64(2654435761)) \
                % np.uint64(2**32)
        else:
            from ..util import crc32_column
            s = pc.cast(ids, pa.string())
            h = crc32_column(s, seed=salt).astype(np.uint64)
        bucket = (h % np.uint64(1_000_000)).astype(np.int64)
        idx = np.searchsorted(bounds, bucket, side="right")
        split = pa.DictionaryArray.from_arrays(
            pa.array(idx, type=pa.int32()), pa.array(names)) \
            .cast(pa.string())
        return batch.append_column("split", split)

    return ds.map_batches(assign, batch_format="pyarrow")
