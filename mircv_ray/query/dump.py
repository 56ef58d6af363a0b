"""Decode the whole postings store back to (term, doc_id, tf) rows.

Used by the driver correctness gate: exercises the full encode ->
parquet -> decode round trip as a streaming Dataset (one map_batches
over segment rows; per-block NumPy decode, no driver-side loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.blocks import decode_block_ids, decode_block_tfs


def _decode_batch(batch: pa.Table, codec: str, docno_offset: int) -> pa.Table:
    terms_out, ids_out, tfs_out = [], [], []
    blocks_col = batch["blocks"]
    if isinstance(blocks_col, pa.ChunkedArray):
        blocks_col = blocks_col.combine_chunks()
    for row in range(batch.num_rows):
        term = batch["term"][row].as_py()
        prev = 0
        for blk in blocks_col[row].as_py():
            ids = decode_block_ids(blk["ids"], codec, blk["n"],
                                   blk["max_doc_id"], prev)
            tfs = decode_block_tfs(blk["tfs"], codec, blk["n"])
            prev = blk["max_doc_id"]
            terms_out.extend([term] * len(ids))
            ids_out.append(ids)
            tfs_out.append(tfs)
    ids_np = (np.concatenate(ids_out) if ids_out else np.zeros(0, np.int64))
    tfs_np = (np.concatenate(tfs_out) if tfs_out else np.zeros(0, np.int64))
    return pa.table({
        "term": pa.array(terms_out, type=pa.string()),
        "doc_id": pa.array(ids_np + docno_offset, type=pa.int64()),
        "tf": pa.array(tfs_np, type=pa.int64()),
    })


def dump_postings(index_dir: str, docno_offset: int = -1):
    """Dataset of (term, doc_id, tf). ``docno_offset=-1`` converts engine
    docIds back to docnos (docno = docId - 1, DocumentIndex.java:82-84)."""
    import ray.data as rd
    from ..build.index_build import load_stats
    codec = load_stats(index_dir)["codec"]
    ds = rd.read_parquet(f"{index_dir}/postings")
    return ds.map_batches(
        lambda b: _decode_batch(b, codec, docno_offset),
        batch_format="pyarrow")
