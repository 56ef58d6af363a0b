"""Skip-block layout for posting lists.

Replicates the reference's block-split policy (semantics of
`UncompressedPostingList.writeToDiskMerged`
search_engine/src/main/java/unipi/aide/mircv/model/UncompressedPostingList.java:241-284
and `CompressedPostingList.writeToDiskMerged` CompressedPostingList.java:126-163):

- single block when the whole list is small: ``df * 4 <= BLOCK_THRESHOLD``
  bytes for the uncompressed/vbyte formats, or
  ``ef_compressed_size(max_doc_id, df) <= BLOCK_THRESHOLD`` for Elias-Fano;
- otherwise ``block_size = floor(sqrt(df))`` postings per block, last
  block keeps the remainder (BlockDescriptor per block records
  ``max_doc_id`` + posting count, BlockDescriptor.java:7-26).

Instead of byte offsets into flat ``.dat`` files, blocks are stored
structurally as an Arrow ``list<struct>`` column of the postings table —
Parquet replaces the reference's offset bookkeeping (LexiconEntry.java:13-21).

Codecs:
- ``"vbyte"`` (primary, per the north-star spec): docId gaps varint-coded,
  first gap relative to the previous block's max docId; tfs unary-coded.
- ``"ef"``: absolute docIds Elias-Fano-coded per block (reference format);
  tfs unary-coded.
- ``"none"``: raw little-endian int64 docIds / int32 tfs (reference's
  uncompressed mode, modulo 64-bit ids).
"""

from __future__ import annotations

import math

import numpy as np

from .eliasfano import ef_compress, ef_compressed_size, ef_decompress, ef_get_l, round_up
from .unary import unary_decode, unary_encode
from .vbyte import vbyte_decode_gaps, vbyte_encode_gaps

BLOCK_THRESHOLD = 2048  # bytes (Configuration.java:15 BLOCK_TRESHOLD)

CODECS = ("vbyte", "ef", "none")


def split_blocks(df: int, max_doc_id: int, codec: str,
                 threshold: int = BLOCK_THRESHOLD) -> list[tuple[int, int]]:
    """Return [(start, end), ...] posting-index ranges for each block."""
    if df <= 0:
        return []
    if codec == "ef":
        single = ef_compressed_size(int(max_doc_id), df) <= threshold
    else:
        single = df * 4 <= threshold
    if single:
        return [(0, df)]
    block_size = int(math.isqrt(df))
    bounds = list(range(0, df, block_size))
    return [(s, min(s + block_size, df)) for s in bounds]


def _encode_ids(ids: np.ndarray, codec: str, base: int) -> bytes:
    if codec == "vbyte":
        return vbyte_encode_gaps(ids, base=base)
    if codec == "ef":
        n = len(ids)
        max_id = int(ids[-1])
        l = ef_get_l(max_id, n)
        size = (round_up(l * n) + round_up(ids_high_bits(ids, l))) // 8
        out = bytearray(size)
        ef_compress(ids, out, l, round_up(l * n))
        return bytes(out)
    if codec == "none":
        return np.asarray(ids, dtype="<i8").tobytes()
    raise ValueError(f"unknown codec {codec!r}")


def ids_high_bits(ids: np.ndarray, l: int) -> int:
    """Exact high-bits stream length for an EF block: n + high(max) + 1."""
    return len(ids) + (int(ids[-1]) >> l) + 1


def _encode_tfs(tfs: np.ndarray, codec: str) -> bytes:
    if codec == "none":
        return np.asarray(tfs, dtype="<i4").tobytes()
    return unary_encode(tfs)


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray, codec: str,
                  threshold: int = BLOCK_THRESHOLD) -> dict:
    """Encode one posting list into its block structure.

    Returns a dict suitable for an Arrow ``list<struct>`` cell:
    ``{"max_doc_id": [...], "n": [...], "ids": [bytes...], "tfs": [bytes...]}``.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    df = len(doc_ids)
    ranges = split_blocks(df, int(doc_ids[-1]) if df else 0, codec, threshold)
    out = {"max_doc_id": [], "n": [], "ids": [], "tfs": []}
    prev_max = 0
    for s, e in ranges:
        ids = doc_ids[s:e]
        out["max_doc_id"].append(int(ids[-1]))
        out["n"].append(e - s)
        out["ids"].append(_encode_ids(ids, codec, base=prev_max))
        out["tfs"].append(_encode_tfs(tfs[s:e], codec))
        prev_max = int(ids[-1])
    return out


def encode_stream_blocks(doc_ids: np.ndarray, tfs: np.ndarray,
                         block_bounds: np.ndarray,
                         term_starts: np.ndarray
                         ) -> tuple[bytes, np.ndarray, bytes, np.ndarray]:
    """Vectorized vbyte+unary encoding of a whole blocked value stream.

    ``doc_ids``/``tfs`` are a term-major, per-term docId-ascending
    concatenation of MANY posting lists; ``block_bounds`` (len =
    n_blocks + 1, ascending, covering the stream) marks EVERY block
    boundary — single- and multi-block terms alike — and
    ``term_starts`` the value indices where a new term begins (each
    must also be a block start).

    Byte-identical to ``encode_blocks(ids_t, tfs_t, "vbyte")`` called
    per term: a term's first gap is its absolute first docId, and each
    interior block's first gap is relative to the PREVIOUS block's max
    docId — which is simply the previous stream element, so the whole
    stream is ONE plain gap pass with a reset only at term starts. The
    unary tf stream is byte-padded per block, exactly the per-block
    ``unary_encode`` layout.

    Returns ``(id_bytes, id_byte_bounds, tf_bytes, tf_byte_bounds)``:
    two contiguous byte buffers plus per-block byte boundaries (len =
    n_blocks + 1) — zero-copy sliceable into Arrow binary columns.
    This replaces the per-block Python encode loop that made hot
    term-hash shards (a mega-df term is ~sqrt(df) blocks) the build's
    straggler tasks."""
    from .vbyte import vbyte_encode, vbyte_lengths

    n_blocks = len(block_bounds) - 1
    if n_blocks <= 0 or len(doc_ids) == 0:
        z = np.zeros(1, dtype=np.int64)
        return b"", z, b"", z
    starts = block_bounds[:-1]
    ends = block_bounds[1:]
    # ---- ids: one global gap stream, reset to absolute at term starts
    gaps = doc_ids.astype(np.int64, copy=True)
    gaps[1:] -= doc_ids[:-1]
    gaps[term_starts] = doc_ids[term_starts]
    id_bytes = vbyte_encode(gaps)
    byte_ends = np.cumsum(vbyte_lengths(gaps))
    id_bounds = np.concatenate(([0], byte_ends[ends - 1]))
    # ---- tfs: global unary bit stream with per-BLOCK byte padding
    tf64 = tfs.astype(np.int64)
    cum_v = np.cumsum(tf64 + 1)
    blk_base = np.concatenate(([0], cum_v[ends - 1][:-1]))
    used_bits = cum_v[ends - 1] - blk_base          # sum+count per block
    tf_sizes = np.maximum((used_bits + 7) // 8, 1)  # unary_byte_size per blk
    tf_byte_ends = np.cumsum(tf_sizes)
    tf_byte_starts = tf_byte_ends - tf_sizes
    total_bits = int(tf_byte_ends[-1]) * 8
    blk_bit_off = np.repeat(tf_byte_starts * 8, ends - starts)
    zero_pos = blk_bit_off + (cum_v - np.repeat(blk_base, ends - starts)) - 1
    delta = np.zeros(total_bits + 1, dtype=np.int8)
    np.add.at(delta, tf_byte_starts * 8, 1)
    np.add.at(delta, tf_byte_starts * 8 + used_bits, -1)
    bits = (np.cumsum(delta[:-1]) > 0).astype(np.uint8)
    bits[zero_pos] = 0
    tf_bytes = np.packbits(bits).tobytes()
    return (id_bytes, id_bounds, tf_bytes,
            np.concatenate(([0], tf_byte_ends)))


def stream_block_bounds(df: np.ndarray, threshold: int = BLOCK_THRESHOLD
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``split_blocks`` over MANY vbyte/none posting lists.

    ``df`` is the per-term posting count of a term-major value stream.
    Returns ``(block_bounds, blocks_per_term)`` where ``block_bounds``
    (len = total_blocks + 1) marks every block boundary in stream
    coordinates — single block when ``df*4 <= threshold``, else
    ``isqrt(df)`` postings per block with the remainder in the last
    block, exactly ``split_blocks``'s policy."""
    n = len(df)
    if n == 0:
        return np.zeros(1, dtype=np.int64), np.zeros(0, dtype=np.int64)
    df = df.astype(np.int64)
    # exact isqrt: float sqrt is correctly rounded but floor can still
    # be off by one in principle — clamp with two integer corrections
    bs = np.sqrt(df.astype(np.float64)).astype(np.int64)
    bs = np.where((bs + 1) * (bs + 1) <= df, bs + 1, bs)
    bs = np.where(bs * bs > df, bs - 1, bs)
    single = df * 4 <= threshold
    per_blk = np.maximum(np.where(single, df, bs), 1)
    nb = np.where(single, 1, -(-df // per_blk))
    total = int(nb.sum())
    first = np.cumsum(nb) - nb
    bidx = np.arange(total, dtype=np.int64) - np.repeat(first, nb)
    term_off = np.cumsum(df) - df
    bstarts = np.repeat(term_off, nb) + bidx * np.repeat(per_blk, nb)
    return np.append(bstarts, int(df.sum())), nb


def encode_single_block_terms(doc_ids: np.ndarray, tfs: np.ndarray,
                              bounds: np.ndarray
                              ) -> tuple[list[bytes], list[bytes]]:
    """Vectorized vbyte+unary encoding of MANY single-block posting lists.

    ``doc_ids``/``tfs`` are the term-major concatenation of all lists;
    ``bounds`` marks term boundaries (len = n_terms + 1). Byte-identical
    to calling ``encode_blocks(ids_t, tfs_t, "vbyte")`` per term (each
    term's first gap is its absolute first docId; unary buffers are
    byte-padded per term), but the varint byte-length computation, the
    gap stream, and the unary bit stream each build in ONE NumPy pass —
    per-term Python work reduces to a bytes slice. This is the hot
    kernel at code-corpus scale, where vocabulary (and therefore the
    number of posting lists) grows linearly with the corpus.
    """
    from .vbyte import vbyte_encode, vbyte_lengths

    n_terms = len(bounds) - 1
    if n_terms == 0:
        return [], []
    starts = bounds[:-1]
    ends = bounds[1:]
    # ---- ids: global gap stream with a reset at each term start
    gaps = doc_ids.astype(np.int64).copy()
    gaps[1:] -= doc_ids[:-1]
    gaps[starts] = doc_ids[starts]          # first gap = absolute id (base 0)
    id_bytes = vbyte_encode(gaps)
    byte_ends = np.cumsum(vbyte_lengths(gaps))
    term_byte_ends = byte_ends[ends - 1]
    term_byte_starts = np.concatenate(([0], term_byte_ends[:-1]))
    ids_bufs = [id_bytes[s:e] for s, e in
                zip(term_byte_starts, term_byte_ends)]
    # ---- tfs: global unary bit stream with per-term byte padding
    tf64 = tfs.astype(np.int64)
    cum_v = np.cumsum(tf64 + 1)
    seg_base = np.concatenate(([0], cum_v[ends - 1][:-1]))
    used_bits = cum_v[ends - 1] - seg_base          # sum+count per term
    tf_sizes = np.maximum((used_bits + 7) // 8, 1)  # unary_byte_size per term
    tf_byte_ends = np.cumsum(tf_sizes)
    tf_byte_starts = tf_byte_ends - tf_sizes
    total_bits = int(tf_byte_ends[-1]) * 8
    term_bit_off = np.repeat(tf_byte_starts * 8, ends - starts)
    # zero-terminator of each value: bit_off + within-term cumulative - 1
    zero_pos = term_bit_off + (cum_v - np.repeat(seg_base, ends - starts)) - 1
    # used regions are all-ones, then terminators cleared
    delta = np.zeros(total_bits + 1, dtype=np.int8)
    np.add.at(delta, tf_byte_starts * 8, 1)
    np.add.at(delta, tf_byte_starts * 8 + used_bits, -1)
    bits = (np.cumsum(delta[:-1]) > 0).astype(np.uint8)
    bits[zero_pos] = 0
    tf_bytes = np.packbits(bits).tobytes()
    tfs_bufs = [tf_bytes[s:e] for s, e in zip(tf_byte_starts, tf_byte_ends)]
    return ids_bufs, tfs_bufs


def decode_block_ids(buf: bytes, codec: str, n: int, max_doc_id: int,
                     base: int) -> np.ndarray:
    if codec == "vbyte":
        return vbyte_decode_gaps(buf, n, base=base)
    if codec == "ef":
        return ef_decompress(buf, n, max_doc_id)
    if codec == "none":
        return np.frombuffer(buf, dtype="<i8").astype(np.int64)
    raise ValueError(f"unknown codec {codec!r}")


def decode_block_tfs(buf: bytes, codec: str, n: int) -> np.ndarray:
    if codec == "none":
        return np.frombuffer(buf, dtype="<i4").astype(np.int64)
    return unary_decode(buf, n)
