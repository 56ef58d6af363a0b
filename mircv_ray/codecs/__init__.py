"""Compression kernels for posting lists.

Byte-for-byte compatible with the reference's JUnit-tested codecs
(`search_engine/src/main/java/unipi/aide/mircv/model/Bits.java`,
`UnaryCompressor.java`, `EliasFano.java`), plus the docID-gap
variable-byte codec that is this engine's primary format.
"""

from .unary import unary_encode, unary_decode, unary_byte_size, unary_get
from .vbyte import vbyte_encode, vbyte_decode, vbyte_encode_gaps, vbyte_decode_gaps
from .eliasfano import (
    ef_get_l,
    ef_compressed_size,
    ef_compress,
    ef_decompress,
    ef_get,
    EliasFanoCache,
)
from .blocks import split_blocks, encode_blocks, decode_block_ids, decode_block_tfs

__all__ = [
    "unary_encode", "unary_decode", "unary_byte_size", "unary_get",
    "vbyte_encode", "vbyte_decode", "vbyte_encode_gaps", "vbyte_decode_gaps",
    "ef_get_l", "ef_compressed_size", "ef_compress", "ef_decompress",
    "ef_get", "EliasFanoCache",
    "split_blocks", "encode_blocks", "decode_block_ids", "decode_block_tfs",
]
