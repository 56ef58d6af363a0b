"""Elias-Fano docId codec — byte-compatible with the reference.

Re-implements the observable behavior of the reference's
`search_engine/src/main/java/unipi/aide/mircv/model/EliasFano.java` and
`EliasFanoCache.java` (golden byte vectors in `EliasFanoTest.java` pin the
exact layout):

- layout: byte-aligned low-bits array (l bits per value, MSB-first)
  followed at bit offset ``round_up(l*n)`` by the high-bits region — a
  unary cluster-count stream which is exactly the canonical EF upper-bits
  stream (bit ``i + high_i`` set for the i-th value).
- ``ef_get_l(u, n) = ceil(log(u/n)/log(2))`` (EliasFano.java:31-33).
- ``ef_compressed_size(u, n)`` uses ``getL(u+1, n)`` — the reference's
  ``u+1`` quirk (EliasFano.java:118-125) — and rounds both regions up to
  whole bytes (``round_up(0) == 8``, EliasFano.java:13-21).
- ``ef_get`` replicates the memoized random-access cursor including the
  cache's ``-1`` initial values (EliasFanoCache.java:13-17).

Encode/decode of whole blocks is vectorized NumPy; only the cursor path
(`ef_get`) walks bits in Python (it reads a handful of bits per call).
"""

from __future__ import annotations

import math

import numpy as np

_LOG2 = math.log(2)


def round_up(val: int) -> int:
    """Round a bit count up to a whole byte; 0 becomes 8 (EliasFano.java:13-21)."""
    if val == 0:
        return 8
    return val if val % 8 == 0 else val + (8 - val % 8)


def ef_get_l(u: int, length: int) -> int:
    """Number of low bits per element (EliasFano.java:31-33)."""
    return int(math.ceil(math.log(u / length) / _LOG2))


def ef_compressed_size(u: int, length: int) -> int:
    """Bytes needed to compress ``length`` values with max ``u``
    (EliasFano.java:118-125, incl. the ``u+1`` quirk)."""
    l = ef_get_l(u + 1, length)
    num_low = round_up(l * length)
    num_high = round_up(2 * length)
    return (num_low + num_high) // 8


def ef_compress(values, out: bytearray, l: int, high_bits_offset: int) -> None:
    """Compress ascending ints into caller-allocated ``out``
    (semantics of EliasFano.java:40-73; layout verified by golden vectors)."""
    vals = np.asarray(values, dtype=np.int64)
    n = len(vals)
    nbits = len(out) * 8
    bits = np.zeros(nbits, dtype=np.uint8)
    if l > 0:
        mask = (1 << l) - 1
        lows = (vals & mask).astype(">u8")
        lowbits = np.unpackbits(lows.view(np.uint8).reshape(n, 8), axis=1)[:, 64 - l:]
        bits[: l * n] = lowbits.reshape(-1)
    highs = (vals >> l).astype(np.int64)
    ones = high_bits_offset + np.arange(n) + highs
    bits[ones] = 1
    packed = np.packbits(bits)
    out[:] = packed.tobytes()


def ef_decompress(buf: bytes, length: int, max_doc_id: int) -> np.ndarray:
    """Decompress ``length`` docIds (EliasFano.java:82-113)."""
    l = ef_get_l(max_doc_id, length)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    if l > 0:
        lowbits = bits[: l * length].reshape(length, l).astype(np.int64)
        weights = (1 << np.arange(l - 1, -1, -1)).astype(np.int64)
        lows = lowbits @ weights
    else:
        lows = np.zeros(length, dtype=np.int64)
    high_off = round_up(l * length)
    ones = np.flatnonzero(bits[high_off:] == 1)[:length]
    highs = ones - np.arange(length)
    return (highs.astype(np.int64) << l) | lows


class EliasFanoCache:
    """Decode-cursor memo (EliasFanoCache.java:8-30)."""

    __slots__ = ("high_bits_offset", "number_of_doc_ids", "current_high_bit_number")

    def __init__(self) -> None:
        self.high_bits_offset = -1
        self.number_of_doc_ids = -1
        self.current_high_bit_number = -1

    def set_cache(self, high_bits_offset: int, number_of_doc_ids: int,
                  current_high_bit_number: int) -> None:
        self.high_bits_offset = high_bits_offset
        self.number_of_doc_ids = number_of_doc_ids
        self.current_high_bit_number = current_high_bit_number


def _read_unary(bits: np.ndarray, offset: int) -> int:
    pos = offset
    while pos < len(bits) and bits[pos] == 1:
        pos += 1
    return pos - offset


def ef_get(buf: bytes, max_doc_id: int, length: int, idx: int,
           cache: EliasFanoCache) -> int:
    """Random access with memoized cursor (EliasFano.java:138-167).

    Returns 2**31-1 (Integer.MAX_VALUE) when ``idx`` is out of range, like
    the reference.
    """
    if idx >= length:
        return 2 ** 31 - 1
    l = ef_get_l(max_doc_id, length)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    high_bits_offset = (round_up(l * length)
                        if cache.high_bits_offset == -1 else cache.high_bits_offset)
    if l > 0:
        lowbits = bits[l * idx: l * idx + l].astype(np.int64)
        low = 0
        for b in lowbits:
            low = (low << 1) | int(b)
    else:
        low = 0
    current_high = cache.current_high_bit_number
    number_of_doc_ids = 0 if cache.number_of_doc_ids == -1 else cache.number_of_doc_ids
    while number_of_doc_ids < idx + 1:
        how_many = _read_unary(bits, high_bits_offset)
        high_bits_offset += how_many + 1
        number_of_doc_ids += how_many
        current_high += 1
    cache.set_cache(high_bits_offset, number_of_doc_ids, current_high)
    return (current_high << l) | low
