"""C4-style cleaning filter (Raffel et al. 2020 §2.2, the heuristics
behind the Colossal Clean Crawled Corpus) — the line-level complement
to the Gopher document rules in ``ops.textops.gopher_filter`` /
``ops.ngramrep``:

line rules (a line survives iff ALL hold):
- ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``),
- contains at least ``min_words`` whitespace-separated words,
- does not contain the word "javascript" (case-insensitive);

document rules (on the ORIGINAL text, C4's reading):
- at least ``min_kept_lines`` surviving lines ("pages with fewer than
  3 sentences were removed"),
- no "lorem ipsum" (case-insensitive),
- no curly brace ``{`` (code placeholder).

Map-only and vectorized: one line split per batch, per-line predicates
as Arrow kernels over the flat line stream, per-doc keep counts via
bincount. ``text_clean`` is the surviving lines re-joined with a
newline in original order (empty when the doc is dropped or no line
survives); deterministic and exactly SQL-mirrorable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TERMINALS = (".", "!", "?", '"')


def c4_line_filter(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text", min_words: int = 5,
                   min_kept_lines: int = 3) -> pa.Table:
    from .linededup import _split_lines
    flat, counts, parent = _split_lines(batch[text_col])
    n_docs = batch.num_rows

    low = pc.utf8_lower(flat)
    ok = pc.ends_with(flat, pattern=TERMINALS[0])
    for t in TERMINALS[1:]:
        ok = pc.or_(ok, pc.ends_with(flat, pattern=t))
    n_words = pc.count_substring_regex(flat, pattern=r"[^ \t]+")
    ok = pc.and_(ok, pc.greater_equal(n_words, min_words))
    ok = pc.and_(ok, pc.invert(pc.match_substring(low, "javascript")))
    ok_np = ok.to_numpy(zero_copy_only=False)

    n_kept = np.bincount(parent[ok_np], minlength=n_docs).astype(np.int64) \
        if ok_np.any() else np.zeros(n_docs, dtype=np.int64)

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    tlow = pc.utf8_lower(text)
    doc_ok = pc.and_(
        pc.invert(pc.match_substring(tlow, "lorem ipsum")),
        pc.invert(pc.match_substring(text, "{"))
    ).to_numpy(zero_copy_only=False)
    keep = doc_ok & (n_kept >= min_kept_lines)

    # surviving lines of KEPT docs re-join in order; dropped docs -> ''
    line_keep = ok_np & keep[parent]
    kept_flat = flat.filter(pa.array(line_keep))
    kept_counts = np.where(keep, n_kept, 0)
    offsets = np.concatenate([[0], np.cumsum(kept_counts)]) \
        .astype(np.int32)
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   kept_flat)
    return pa.table({
        id_col: batch[id_col],
        "n_lines": pa.array(counts, type=pa.int64()),
        "n_kept_lines": pa.array(n_kept, type=pa.int64()),
        "keep": pa.array(keep),
        "text_clean": pc.binary_join(lst, "\n"),
    })
