"""Sequence packing: greedy token-budget bin packing for LLM training.

A training pipeline packs documents into fixed-size context windows
("bins" of ``budget`` tokens) to avoid padding waste. This operator
assigns every document a (shard, bin, offset) — deterministic,
order-free, resumable:

- documents are processed in ascending id order WITHIN fixed id-range
  shards (``shard = id // shard_size``); bins never cross a shard
  boundary. That is the partitioning contract that makes the operator
  embarrassingly parallel at 100 TB: each shard packs independently in
  one task, re-running a shard is idempotent, and a new shard of
  documents appends without repacking history (the same reason training
  pipelines pack per input file).
- within a shard, packing is GREEDY NEXT-FIT in id order: a document
  that does not fit in the current bin's remaining budget opens a new
  bin. A document longer than the whole budget occupies a bin alone
  (flagged ``overflow`` — a real pipeline would chunk it; chunking is a
  different operator because it changes row identity).

The per-shard kernel is not a Python per-row loop: bin boundaries fall
out of one prefix-sum plus one ``searchsorted`` PER BIN (find the
largest prefix still within ``start + budget``), so the work is
O(n_bins * log n_docs) on top of the vectorized cumsum — bins are
~total_tokens/budget, far fewer than rows when budget >> avg doc len.

SQL mirror (the driver oracle): a recursive CTE carrying (bin, fill)
row-by-row per shard — exactly the greedy rule, value-equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["greedy_pack", "pack_sequences"]


def greedy_pack(lengths: np.ndarray, budget: int):
    """Greedy next-fit packing of ``lengths`` (in the given order) into
    bins of ``budget``. Returns (bin_ids, offsets) — ``offsets`` is each
    item's token offset within its bin. One searchsorted per bin."""
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    bins = np.empty(n, dtype=np.int64)
    offs = np.empty(n, dtype=np.int64)
    if n == 0:
        return bins, offs
    if (lengths < 0).any():
        raise ValueError("negative lengths")
    csum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=csum[1:])
    i = 0
    b = 0
    while i < n:
        # largest j with csum[j] - csum[i] <= budget; at least one item
        # per bin (an overflow doc sits alone)
        j = int(np.searchsorted(csum, csum[i] + budget, side="right")) - 1
        j = max(j, i + 1)
        bins[i:j] = b
        offs[i:j] = csum[i:j] - csum[i]
        b += 1
        i = j
    return bins, offs


def pack_sequences(ds, budget: int, shard_size: int,
                   id_col: str = "doc_id", len_col: str = "doc_len"):
    """Pack a (id, token-length) Dataset into ``budget``-token bins.

    Returns a Dataset with (id_col, len_col, shard, bin, offset,
    overflow); ``bin`` is 0-based within its shard. Only the slim
    (id, len) pairs shuffle — content never moves; the packed layout is
    a JOIN KEY for whatever stage materializes the windows.
    """
    if budget <= 0 or shard_size <= 0:
        raise ValueError("budget and shard_size must be positive")

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        # ids are non-negative, so integer divide == floor
        shard = pc.divide(ids, pa.scalar(shard_size, type=pa.int64()))
        return batch.append_column("shard", shard)

    def pack_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        group = group.take(order)
        lens = group[len_col].to_numpy().astype(np.int64)
        bins, offs = greedy_pack(lens, budget)
        return pa.table({
            id_col: group[id_col],
            len_col: group[len_col],
            "shard": group["shard"],
            "bin": pa.array(bins, type=pa.int64()),
            "offset": pa.array(offs, type=pa.int64()),
            "overflow": pa.array(lens > budget),
        })

    from .. import use_push_shuffle
    use_push_shuffle(ds)
    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack_group, batch_format="pyarrow"))
