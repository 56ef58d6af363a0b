"""Corpus-level duplicate-line removal (the RefinedWeb / C4 line-dedup
step: drop every line whose exact byte content appears >= min_count
times across the WHOLE corpus — navigation menus, cookie banners,
boilerplate headers) plus the within-document duplicate-line /
duplicate-paragraph repetition fractions (Gopher rules 1-4, Rae et al.
2021 §A1.1) that complement `ops.textops.gopher_filter`'s quality
rules.

Scale shape of `line_dedup`:

- pass 1 (count): per-batch map-side combine over distinct lines, then
  ONE (line -> count) groupby — the only exchange that moves line
  content, and only distinct-per-batch lines enter it.
- pass 2 (rebuild): dup set <= ``broadcast_max_lines``: the distinct
  duplicated lines broadcast once via ``ray.put`` and every doc task
  filters map-only (hash-set `is_in` membership, exact on bytes).
  Larger: two tagged-union partitioned exchanges — (doc, ord, line)
  occurrence rows meet the dup set co-partitioned by line hash
  (matching by LINE BYTES, so hash collisions cannot flip the result),
  only the FLAGGED (doc_id, ord) pairs come back and meet the full
  docs co-partitioned by doc hash for the rebuild. Nothing
  corpus-sized ever lands on the driver.

Both paths produce byte-identical output (pytest-pinned across a
forced threshold of 0).

`duplicate_line_stats` is one map-only pass (no shuffle): an
occurrence is a duplicate iff an identical line/paragraph appeared
EARLIER in the same document (SQL `row_number() OVER (PARTITION BY
doc, line ORDER BY ord) > 1`), so the fractions are deterministic and
exactly SQL-mirrorable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# above this many DISTINCT duplicated lines the dup set stops
# broadcasting and the partitioned rebuild runs instead (same knob
# pattern as textops.LM_BROADCAST_MAX_VOCAB)
LINE_BROADCAST_MAX = 2_000_000

_line_cache: dict = {}


def _split_lines(col):
    """column -> (flat line StringArray, per-row line counts int64,
    parent row index per line). NULL text splits like ''."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    lst = pc.split_pattern(col, pattern="\n")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(lst)
    parent = np.repeat(np.arange(len(col), dtype=np.int64), counts)
    return flat, counts, parent


def _rebuild(batch: pa.Table, flat, counts, parent, is_dup: np.ndarray,
             id_col: str) -> pa.Table:
    """Assemble the output table given the per-line dup mask."""
    n_docs = batch.num_rows
    n_dup = np.bincount(parent[is_dup], minlength=n_docs) \
        .astype(np.int64) if is_dup.any() else \
        np.zeros(n_docs, dtype=np.int64)
    keep = pa.array(~is_dup)
    kept_flat = flat.filter(keep)
    kept_counts = counts - n_dup
    offsets = np.concatenate(
        [[0], np.cumsum(kept_counts)]).astype(np.int32)
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   kept_flat)
    text_clean = pc.binary_join(lst, "\n")
    return pa.table({
        id_col: batch[id_col],
        "n_lines": pa.array(counts, type=pa.int64()),
        "n_dup_lines": pa.array(n_dup, type=pa.int64()),
        "text_clean": text_clean,
    })


def line_dedup(ds, min_count: int = 2, id_col: str = "doc_id",
               text_col: str = "text",
               broadcast_max_lines: int | None = None):
    """(doc_id, n_lines, n_dup_lines, text_clean): remove every line
    whose exact content occurs >= ``min_count`` times corpus-wide;
    kept lines re-join with '\\n' in original order (all-duplicate docs
    yield ''). Matching is exact on line BYTES on both paths."""
    import ray
    from ray.data.aggregate import Sum

    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if broadcast_max_lines is None:
        broadcast_max_lines = LINE_BROADCAST_MAX

    def line_counts(batch: pa.Table) -> pa.Table:
        flat, _, _ = _split_lines(batch[text_col])
        a = pa.table({"line": flat}).group_by("line").aggregate(
            [([], "count_all")])
        return pa.table({"line": a["line"],
                         "c": a["count_all"].cast(pa.int64())})

    def only_dups(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["c"], min_count)
        return batch.filter(m).select(["line"])

    dup_ds = (ds.map_batches(line_counts, batch_format="pyarrow")
                .groupby("line").aggregate(Sum("c", alias_name="c"))
                .map_batches(only_dups, batch_format="pyarrow")
                .materialize())
    n_dup_lines = dup_ds.count()
    if n_dup_lines > broadcast_max_lines:
        return _line_dedup_joined(ds, dup_ds, id_col, text_col)

    tbls = [t for t in ray.get(dup_ds.to_arrow_refs()) if t.num_rows]
    dup_arr = (pa.concat_tables(tbls).combine_chunks()["line"]
               .combine_chunks()
               if tbls else pa.array([], type=pa.string()))
    dup_ref = ray.put(dup_arr)

    def clean(batch: pa.Table) -> pa.Table:
        key = dup_ref.hex() if hasattr(dup_ref, "hex") else id(dup_ref)
        if key not in _line_cache:
            _line_cache[key] = ray.get(dup_ref)
            while len(_line_cache) > 4:
                _line_cache.pop(next(iter(_line_cache)))
        dup_set = _line_cache[key]
        flat, counts, parent = _split_lines(batch[text_col])
        if len(dup_set):
            is_dup = pc.is_in(flat, value_set=dup_set) \
                .to_numpy(zero_copy_only=False)
        else:
            is_dup = np.zeros(len(flat), dtype=bool)
        return _rebuild(batch, flat, counts, parent, is_dup, id_col)

    return ds.map_batches(clean, batch_format="pyarrow")


_FLAG_SCHEMA = pa.schema([("doc_id", pa.int64()), ("ord", pa.int64())])


def _line_dedup_joined(ds, dup_ds, id_col: str, text_col: str):
    """line_dedup's scale path: no driver dup set, no broadcast. Two
    tagged-union partitioned exchanges (cf. textops._lm_score_joined's
    join shape — Dataset.join is avoided for the same sparse-partition
    reasons, see ops/dedup.py)."""
    from ..util import crc32_column, default_join_partitions
    nparts = default_join_partitions()

    def occ_rows(batch: pa.Table) -> pa.Table:
        flat, counts, parent = _split_lines(batch[text_col])
        did = batch[id_col].to_numpy()[parent]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]) \
            .astype(np.int64)
        ords = np.arange(len(parent), dtype=np.int64) - np.repeat(
            starts, counts)
        pkey = (crc32_column(flat) % np.uint32(nparts)).astype(np.int64)
        return pa.table({
            "pkey": pa.array(pkey, type=pa.int64()),
            "side": pa.array(np.ones(len(parent), dtype=np.int8)),
            "line": flat,
            "doc_id": pa.array(did, type=pa.int64()),
            "ord": pa.array(ords, type=pa.int64()),
        })

    def dup_rows(batch: pa.Table) -> pa.Table:
        line = batch["line"]
        if isinstance(line, pa.ChunkedArray):
            line = line.combine_chunks()
        n = len(line)
        pkey = (crc32_column(line) % np.uint32(nparts)).astype(np.int64)
        return pa.table({
            "pkey": pa.array(pkey, type=pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "line": line,
            "doc_id": pa.array(np.zeros(n, dtype=np.int64)),
            "ord": pa.array(np.zeros(n, dtype=np.int64)),
        })

    def flag(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return _FLAG_SCHEMA.empty_table()
        side = group["side"].to_numpy()
        st = group.filter(pa.array(side == 0))
        lf = group.filter(pa.array(side == 1))
        if lf.num_rows == 0 or st.num_rows == 0:
            return _FLAG_SCHEMA.empty_table()
        dup_set = st["line"]
        if isinstance(dup_set, pa.ChunkedArray):
            dup_set = dup_set.combine_chunks()
        hit = pc.is_in(lf["line"].combine_chunks()
                       if isinstance(lf["line"], pa.ChunkedArray)
                       else lf["line"], value_set=dup_set)
        flagged = lf.filter(hit)
        return pa.table({"doc_id": flagged["doc_id"],
                         "ord": flagged["ord"]})

    flagged = (dup_ds.map_batches(dup_rows, batch_format="pyarrow")
               .union(ds.map_batches(occ_rows, batch_format="pyarrow"))
               .groupby("pkey").map_groups(flag, batch_format="pyarrow"))

    # exchange 2: flagged (doc_id, ord) pairs meet the full docs
    # co-partitioned by doc hash; each partition rebuilds its docs
    def doc_rows(batch: pa.Table) -> pa.Table:
        did = batch[id_col]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        dkey = did.cast(pa.int64()).to_numpy() % nparts
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table({
            "dkey": pa.array(dkey, type=pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            "doc_id": did.cast(pa.int64()),
            "ord": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            "text": text,
        })

    def ord_rows(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        dkey = did.cast(pa.int64()).to_numpy() % nparts
        n = batch.num_rows
        return pa.table({
            "dkey": pa.array(dkey, type=pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "doc_id": did.cast(pa.int64()),
            "ord": batch["ord"].cast(pa.int64()),
            "text": pa.array([""] * n, type=pa.string()),
        })

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_lines", pa.int64()),
                            ("n_dup_lines", pa.int64()),
                            ("text_clean", pa.string())])

    def rebuild(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return out_schema.empty_table()
        side = group["side"].to_numpy()
        docs = group.filter(pa.array(side == 1))
        fl = group.filter(pa.array(side == 0))
        if docs.num_rows == 0:
            return out_schema.empty_table()
        flat, counts, parent = _split_lines(docs["text"])
        is_dup = np.zeros(len(flat), dtype=bool)
        if fl.num_rows:
            doc_ids = docs["doc_id"].to_numpy()
            order = np.argsort(doc_ids, kind="stable")
            sorted_ids = doc_ids[order]
            starts = np.zeros(docs.num_rows + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            f_did = fl["doc_id"].to_numpy()
            f_ord = fl["ord"].to_numpy()
            pos = np.searchsorted(sorted_ids, f_did)
            row = order[np.minimum(pos, len(order) - 1)]
            ok = sorted_ids[np.minimum(pos, len(order) - 1)] == f_did
            is_dup[starts[row[ok]] + f_ord[ok]] = True
        return _rebuild(
            pa.table({id_col: docs["doc_id"]}), flat, counts, parent,
            is_dup, id_col)

    tagged = (flagged.map_batches(ord_rows, batch_format="pyarrow")
              .union(ds.map_batches(doc_rows, batch_format="pyarrow")))
    return tagged.groupby("dkey").map_groups(rebuild,
                                             batch_format="pyarrow")


# ------------------------- within-doc repetition fractions (Gopher 1-4)

def _dup_occurrence_stats(flat, counts, parent, n_docs: int):
    """counts/chars of occurrences that repeat an EARLIER identical
    element within the same parent doc. Returns (n_dup, dup_chars,
    total_chars) per doc."""
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    total_chars = np.bincount(parent, weights=lens, minlength=n_docs)
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(codes) == 0:
        z = np.zeros(n_docs, dtype=np.int64)
        return z, np.zeros(n_docs), total_chars
    # stable sort keeps original order within (doc, line) runs, so
    # "first" is the earliest occurrence — matches row_number() > 1
    order = np.lexsort((codes, parent))
    c2, p2 = codes[order], parent[order]
    first = np.ones(len(c2), dtype=bool)
    first[1:] = (c2[1:] != c2[:-1]) | (p2[1:] != p2[:-1])
    dup = ~first
    n_dup = np.bincount(p2[dup], minlength=n_docs).astype(np.int64)
    dup_chars = np.bincount(p2[dup], weights=lens[order][dup],
                            minlength=n_docs)
    return n_dup, dup_chars, total_chars


def duplicate_line_stats(batch: pa.Table, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac, n_paras,
    dup_para_frac, dup_para_char_frac) — Gopher repetition rules 1-4:
    the fraction of lines / paragraphs (and of their characters) that
    repeat an earlier identical one WITHIN the document. Map-only;
    fractions round half-away-from-zero to 4 decimals (SQL round())."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n_docs = batch.num_rows

    def r4(x: np.ndarray) -> np.ndarray:
        return np.trunc(x * 1e4 + np.copysign(0.5, x)) / 1e4

    out = {id_col: batch[id_col]}
    for name, pat in (("line", "\n"), ("para", "\n\n")):
        lst = pc.split_pattern(col, pattern=pat)
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        counts = pc.list_value_length(lst) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lst)
        parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        n_dup, dup_chars, tot_chars = _dup_occurrence_stats(
            flat, counts, parent, n_docs)
        nf = counts.astype(np.float64)
        out[f"n_{name}s"] = pa.array(counts, type=pa.int64())
        out[f"dup_{name}_frac"] = pa.array(
            r4(np.where(counts > 0, n_dup / np.maximum(nf, 1.0), 0.0)),
            type=pa.float64())
        out[f"dup_{name}_char_frac"] = pa.array(
            r4(np.where(tot_chars > 0,
                        dup_chars / np.maximum(tot_chars, 1.0), 0.0)),
            type=pa.float64())
    return pa.table(out)
