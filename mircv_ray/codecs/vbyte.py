"""DocID-gap variable-byte codec — the engine's primary posting format.

Classic LSB-first varint (7 data bits per byte, high bit = continuation,
as popularized by protocol buffers / classic IR VByte): the low 7 bits of
the value come first; every byte except the last has bit 0x80 set... no —
convention used here: bytes with the HIGH BIT SET mean "more bytes
follow"; each byte carries 7 bits, least-significant group first.

The reference engine compresses absolute docIds with Elias-Fano
(`EliasFano.java`); the north-star format for this rebuild is gap + VByte,
which is rank/score-neutral (compression never affects BM25 math).

All encode/decode paths are vectorized NumPy (no per-value Python loop:
the loops below are over the ≤10 byte *lanes* of int64, not over values).
"""

from __future__ import annotations

import numpy as np

_MAX_LANES = 10  # ceil(64/7)


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode an array of non-negative int64s as concatenated varints."""
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    # number of 7-bit groups per value (>=1); lane loop — log2-on-float is
    # unsafe past 2**53
    v = values.copy()
    lengths = np.ones(n, dtype=np.int64)
    v >>= np.uint64(7)
    while v.any():
        lengths += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(lengths)          # index AFTER last byte of each value
    starts = ends - lengths
    v = values.copy()
    # lane k writes the k-th least-significant 7-bit group at starts+k
    active = np.arange(n)
    k = 0
    while len(active):
        idx = starts[active] + k
        out[idx] = (v[active] & np.uint64(0x7F)).astype(np.uint8)
        more = lengths[active] > (k + 1)
        out[idx[more]] |= 0x80
        v[active] >>= np.uint64(7)
        active = active[more]
        k += 1
    return out.tobytes()


def vbyte_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode all (or the first ``count``) varints from ``buf``."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if len(raw) == 0:
        return np.zeros(0, dtype=np.int64)
    stops = np.flatnonzero((raw & 0x80) == 0)
    if count is not None:
        stops = stops[:count]
    ends = stops + 1
    starts = np.concatenate(([0], ends[:-1]))
    n = len(stops)
    values = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts
    active = np.arange(n)
    k = 0
    while len(active):
        b = raw[starts[active] + k].astype(np.uint64)
        values[active] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
        k += 1
        active = active[lengths[active] > k]
    return values.astype(np.int64)


def vbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized: 9 threshold compares)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    lengths = np.ones(len(v), dtype=np.int64)
    for k in range(1, _MAX_LANES):
        lengths += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    return lengths


def vbyte_encode_gaps(doc_ids: np.ndarray, base: int = 0) -> bytes:
    """Delta-encode a strictly ascending docId array then varint it.

    The first gap is ``doc_ids[0] - base`` so a block can be decoded
    knowing only the previous block's max docId (the block descriptor
    chain provides it; see codecs/blocks.py).
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    gaps = np.diff(ids, prepend=base)
    if len(gaps) and gaps.min() <= 0:
        raise ValueError("doc_ids must be strictly ascending and > base")
    return vbyte_encode(gaps)


def vbyte_decode_gaps(buf: bytes, count: int, base: int = 0) -> np.ndarray:
    gaps = vbyte_decode(buf, count)
    return np.cumsum(gaps) + base
