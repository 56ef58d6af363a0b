"""Document chunking — sliding token windows for RAG / pretraining.

The standard retrieval-augmentation data-prep step: split each document
into fixed-size token windows with optional overlap (``stride < size``),
carrying (doc_id, chunk_id, start, n_tokens, text) so chunks can be
embedded, indexed and traced back to their source span. Pairs with the
embedding ops (chunk-level ANN) and the index builder (chunk-level
postings) — the reference engine indexes whole documents only.

Map-only and fully vectorized: per batch ONE regex whitespace split,
empty-token filter over the flat value stream, chunk boundaries as
closed-form arithmetic over per-doc token counts, and chunk text as a
single take-gather + ``binary_join_element_wise``-free ``binary_join``
over a list array re-slicing the flat token stream — no per-row Python.
Tokens = whitespace-separated words (the chunker's contract is spans of
the ORIGINAL text, so no stemming/stopwording — unlike the index
tokenizer); a doc with n tokens yields chunks starting at 0, stride,
2*stride, ... while start < n, each ``min(size, n - start)`` long (the
tail chunk may be short). Empty/NULL docs yield no chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import multi_arange


def chunk_documents(ds, size: int = 100, stride: int | None = None,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Dataset (id, text) -> Dataset (doc_id, chunk_id, start, n_tokens,
    text) of sliding token windows. ``stride`` defaults to ``size``
    (non-overlapping); ``stride < size`` overlaps consecutive chunks."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    stride = size if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        txt = batch[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt.cast(pa.string()), "")
        la = pc.split_pattern_regex(txt, pattern=r"\s+")
        off = la.offsets.to_numpy().astype(np.int64)
        vals = la.values
        vlen = pc.binary_length(vals).to_numpy()
        keep = vlen > 0                      # regex split leaves "" at edges
        flat = vals.filter(pa.array(keep))   # kept tokens, row-major
        # per-row kept-token counts via prefix sums at the row offsets
        # (np.add.reduceat mishandles zero-length rows)
        csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        n_tok = csum[off[1:]] - csum[off[:-1]]
        n_rows = len(n_tok)
        if n_rows == 0 or int(n_tok.sum()) == 0:
            return pa.table({"doc_id": pa.array([], ids.type),
                             "chunk_id": pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        kstart = csum[off[:-1]]              # row -> first kept-token idx
        n_chunks = np.where(n_tok > 0, (n_tok + stride - 1) // stride, 0)
        row_of_chunk = np.repeat(np.arange(n_rows), n_chunks)
        cid = multi_arange(n_chunks)
        start = cid * stride
        length = np.minimum(size, n_tok[row_of_chunk] - start)
        # gather each chunk's tokens from the flat kept stream
        tok_idx = (np.repeat(kstart[row_of_chunk] + start, length)
                   + multi_arange(length))
        chunk_offsets = np.concatenate([[0], np.cumsum(length)])
        chunks = pa.ListArray.from_arrays(
            pa.array(chunk_offsets, type=pa.int32()),
            flat.take(pa.array(tok_idx, type=pa.int64())))
        text = pc.binary_join(chunks.cast(pa.list_(pa.string())), " ")
        return pa.table({
            "doc_id": ids.take(pa.array(row_of_chunk, type=pa.int64())),
            "chunk_id": pa.array(cid, type=pa.int64()),
            "start": pa.array(start, type=pa.int64()),
            "n_tokens": pa.array(length, type=pa.int64()),
            "text": text,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


_SENT_RE = r"[.!?]+"


def split_sentences(ds, id_col: str = "doc_id", text_col: str = "text",
                    min_chars: int = 1):
    """Rule-based sentence splitting — the preprocessing step between
    documents and sentence-level dedup/embedding (the chunker's
    punctuation-aware sibling: ``chunk_documents`` windows TOKENS, this
    splits on terminal punctuation runs ``[.!?]+``). Sentences are
    whitespace-trimmed; empties (and those under ``min_chars``) drop;
    ``sent_id`` is the 0-based index among the KEPT sentences of the
    doc — deterministic and SQL-mirrorable via ordinality.

    Map-only, one regex split per batch over the Arrow value stream —
    offsets of the flat split give every per-doc index without a
    Python row loop.
    """
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")

    def split(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        lists = pc.split_pattern_regex(pc.fill_null(t, ""),
                                       pattern=_SENT_RE)
        flat = pc.utf8_trim_whitespace(pc.list_flatten(lists))
        parent = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        keep = pc.greater_equal(pc.utf8_length(flat),
                                pa.scalar(min_chars, pa.int32()))
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        parent = parent[keep_np]
        # 0-based rank among kept sentences per doc
        starts = np.flatnonzero(
            np.append(True, parent[1:] != parent[:-1]))
        pos = np.arange(len(parent)) - np.repeat(
            starts, np.diff(np.append(starts, len(parent))))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(ids[parent], type=pa.int64()),
            "sent_id": pa.array(pos, type=pa.int64()),
            "sentence": flat,
        })

    return ds.map_batches(split, batch_format="pyarrow")
