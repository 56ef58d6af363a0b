"""Decode the whole postings store back to (term, doc_id, tf) rows.

Used by the driver correctness gate: exercises the full encode ->
parquet -> decode round trip as a streaming Dataset. The vbyte path
decodes each BATCH of segment rows with one varint pass + one cumsum
(the same whole-stream trick as IndexReader.decoded, generalized to many
terms); ef/none fall back to per-block NumPy decode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.blocks import decode_block_ids, decode_block_tfs


def _flatten_blocks(batch: pa.Table):
    """blocks list<struct> column -> flat per-block arrays + per-row block
    counts (vectorized; no .as_py() over rows). The binary fields stay an
    Arrow StructArray — each decode path views their values buffers
    directly (vbyte/unary: one packed pass; ef/none: memoryview slices),
    never a per-block to_pylist."""
    blocks = batch["blocks"]
    if isinstance(blocks, pa.ChunkedArray):
        blocks = blocks.combine_chunks()
    flat = blocks.flatten()  # StructArray of all blocks in row order
    import pyarrow.compute as pc
    row_counts = pc.list_value_length(blocks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    bmax = flat.field("max_doc_id").to_numpy(zero_copy_only=False)
    bn = flat.field("n").to_numpy(zero_copy_only=False)
    return row_counts, bmax, bn, flat


def _decode_batch(batch: pa.Table, codec: str, docno_offset: int) -> pa.Table:
    from ..util import binary_values_list, binary_values_parts
    row_counts, bmax, bn, flat = _flatten_blocks(batch)
    total = int(bn.sum())
    terms = batch["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    # postings per ROW (sum of its blocks' n)
    row_ends = np.cumsum(row_counts)
    row_n = np.add.reduceat(bn, np.append(0, row_ends[:-1])) \
        if len(bn) else np.zeros(len(batch), dtype=np.int64)
    row_n[row_counts == 0] = 0
    if codec == "vbyte" and total:
        from ..codecs.unary import unary_decode_packed
        from ..codecs.vbyte import vbyte_decode
        ids_data, _ = binary_values_parts(flat.field("ids"))
        gaps = vbyte_decode(ids_data.tobytes(), total)
        csum = np.cumsum(gaps)
        # each ROW is an independent gap chain (block bases chain within
        # a row starting from 0): re-anchor at every row start
        val_starts = np.cumsum(bn) - bn
        row_start_vals = val_starts[np.append(0, row_ends[:-1])[
            row_counts > 0]] if len(bn) else np.zeros(0, np.int64)
        offs = np.where(row_start_vals > 0, csum[row_start_vals - 1], 0)
        seg_lens = np.diff(np.append(row_start_vals, total))
        ids_np = csum - np.repeat(offs, seg_lens)
        tfs_data, tfs_lens = binary_values_parts(flat.field("tfs"))
        tfs_np = unary_decode_packed(tfs_data, tfs_lens, bn)
    else:
        ids_bufs = binary_values_list(flat.field("ids"))
        tfs_bufs = binary_values_list(flat.field("tfs"))
        ids, tfs = [], []
        prev = 0
        bi = 0
        for r in range(len(batch)):
            prev = 0
            for _ in range(int(row_counts[r])):
                ids.append(decode_block_ids(ids_bufs[bi], codec, int(bn[bi]),
                                            int(bmax[bi]), prev))
                tfs.append(decode_block_tfs(tfs_bufs[bi], codec,
                                            int(bn[bi])))
                prev = int(bmax[bi])
                bi += 1
        ids_np = (np.concatenate(ids) if ids else np.zeros(0, np.int64))
        tfs_np = (np.concatenate(tfs) if tfs else np.zeros(0, np.int64))
    return pa.table({
        "term": terms.take(pa.array(
            np.repeat(np.arange(len(batch)), row_n), type=pa.int64())),
        "doc_id": pa.array(ids_np + docno_offset, type=pa.int64()),
        "tf": pa.array(tfs_np, type=pa.int64()),
    })


def dump_postings(index_dir: str, docno_offset: int = -1,
                  apply_tombstones: bool = False):
    """Dataset of (term, doc_id, tf). ``docno_offset=-1`` converts engine
    docIds back to docnos (docno = docId - 1, DocumentIndex.java:82-84).
    ``apply_tombstones`` drops postings of deleted docs (the query-time
    view of an index with a tombstone sidecar; the array rides the
    closure — it is deletion-sized, not corpus-sized)."""
    import ray.data as rd
    from ..build.index_build import load_stats
    codec = load_stats(index_dir)["codec"]
    # only the decode inputs leave storage (the seg-metadata columns —
    # df/cores/bytes — are lexicon fodder, ~30% of the file)
    ds = rd.read_parquet(f"{index_dir}/postings",
                         columns=["term", "blocks"])
    ds = ds.map_batches(
        lambda b: _decode_batch(b, codec, docno_offset),
        batch_format="pyarrow")
    if apply_tombstones:
        from ..build.tombstones import load_tombstones
        tombs = load_tombstones(index_dir)
        if len(tombs):
            def drop(batch: pa.Table) -> pa.Table:
                eng = batch["doc_id"].to_numpy() - docno_offset
                pos = np.searchsorted(tombs, eng)
                hit = np.zeros(len(eng), dtype=bool)
                inb = pos < len(tombs)
                hit[inb] = tombs[pos[inb]] == eng[inb]
                return batch.filter(pa.array(~hit))
            ds = ds.map_batches(drop, batch_format="pyarrow")
    return ds
