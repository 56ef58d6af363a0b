"""Posting-list cursor with block skipping.

Python/NumPy equivalent of the reference's posting iterator
(`PostingList.java:27-58`, `UncompressedPostingList.java:149-222`,
`CompressedPostingList.java:228-339`): ``doc_id()/next()/tf()`` walk the
block-structured postings; ``next_geq(target)`` hops block descriptors
(skip pointers) with ``np.searchsorted`` over the per-block max docIds,
then scans inside the (lazily decoded) block. An exhausted cursor reports
``EXHAUSTED`` (the reference's Integer.MAX_VALUE).

Blocks may come from multiple docId-range segments of the same term
(hot-term salting); their descriptors are globally ascending by
construction, so one flat block array per term suffices.
"""

from __future__ import annotations

import numpy as np

from ..codecs.blocks import decode_block_ids, decode_block_tfs

EXHAUSTED = 2 ** 63 - 1


class PostingCursor:
    __slots__ = ("term", "df", "idf", "term_ub", "codec",
                 "block_max", "block_n", "block_base", "ids_bufs", "tfs_bufs",
                 "block_ubs", "_bi", "_pos", "_ids", "_tfs", "_exhausted")

    def __init__(self, term: str, df: int, idf: float, term_ub: float,
                 codec: str, block_max: np.ndarray, block_n: np.ndarray,
                 block_base: np.ndarray, ids_bufs: list[bytes],
                 tfs_bufs: list[bytes], block_ubs: np.ndarray | None = None):
        self.term = term
        self.df = df
        self.idf = idf
        self.term_ub = term_ub
        self.codec = codec
        self.block_max = block_max
        self.block_n = block_n
        self.block_base = block_base    # vbyte gap base per block
        self.ids_bufs = ids_bufs
        self.tfs_bufs = tfs_bufs
        self.block_ubs = block_ubs      # per-block score UB (block-max)
        self._bi = -1
        self._pos = -1
        self._ids = None
        self._tfs = None
        self._exhausted = len(block_max) == 0
        if not self._exhausted:
            self._load_block(0)
            self._pos = 0

    # ------------------------------------------------------------- internals
    def _load_block(self, bi: int) -> None:
        self._bi = bi
        n = int(self.block_n[bi])
        self._ids = decode_block_ids(self.ids_bufs[bi], self.codec, n,
                                     int(self.block_max[bi]),
                                     int(self.block_base[bi]))
        self._tfs = decode_block_tfs(self.tfs_bufs[bi], self.codec, n)

    # ------------------------------------------------------------------- api
    def doc_id(self) -> int:
        if self._exhausted:
            return EXHAUSTED
        return int(self._ids[self._pos])

    def tf(self) -> int:
        return int(self._tfs[self._pos])

    def next(self) -> None:
        if self._exhausted:
            return
        self._pos += 1
        if self._pos >= len(self._ids):
            if self._bi + 1 < len(self.block_max):
                self._load_block(self._bi + 1)
                self._pos = 0
            else:
                self._exhausted = True

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with docId >= target (Q2)."""
        if self._exhausted:
            return
        if int(self.block_max[self._bi]) >= target:
            # scan within current block (from the current position)
            pos = self._pos + int(np.searchsorted(self._ids[self._pos:], target))
            self._pos = pos  # guaranteed in-block: block_max >= target
        else:
            bi = int(np.searchsorted(self.block_max, target))
            if bi >= len(self.block_max):
                self._exhausted = True
                return
            self._load_block(bi)
            self._pos = int(np.searchsorted(self._ids, target))

    def ub_at(self, target: int) -> float:
        """Block-max: upper bound of this term's score contribution for
        docId == ``target``, WITHOUT decoding any block. If target falls
        past the last block the list can't contain it -> 0. Falls back to
        the term UB when the index carries no per-block cores."""
        if self._exhausted:
            return 0.0
        if self.block_ubs is None:
            return self.term_ub
        bi = int(np.searchsorted(self.block_max, target))
        if bi >= len(self.block_max):
            return 0.0
        return float(self.block_ubs[bi])

    def reset(self) -> None:
        self._exhausted = len(self.block_max) == 0
        if not self._exhausted:
            if self._bi != 0:
                self._load_block(0)
            self._pos = 0
