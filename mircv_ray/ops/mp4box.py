"""Minimal ISO-BMFF (MP4) structural codec — pure stdlib struct math.

Implements the public ISO/IEC 14496-12 box layout: enough WRITER to
emit a spec-shaped single-video-track file (ftyp + mdat + moov with a
full sample table: stsd/stts/stsc/stsz/stco), and enough PARSER to walk
the box tree and resolve any sample index to its exact byte range in
mdat — the structural half of video processing (frame sampling, shard
splitting, per-sample feature extraction) that needs NO codec library.

The writer stores frames as uncompressed RGB24 under the QuickTime
'raw ' visual sample entry, so the synthetic corpus is both a valid
MP4 and fully decodable here; files carrying compressed codecs (avc1,
hev1, ...) still parse structurally — sample ranges, durations,
dimensions — and only the pixel DECODE is refused (DecodeImage's
documented NotImplementedError policy).

Chunk mapping is the real thing: samples are grouped into multi-sample
chunks (stsc runs + stco offsets), so the sample->offset resolution
exercises the same first_chunk/samples_per_chunk expansion every real
demuxer performs, not a trivial one-sample-per-chunk layout.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + payload)


def encode_mp4_raw(frames: np.ndarray, fps: int = 10,
                   samples_per_chunk: int = 3) -> bytes:
    """(n, h, w, 3) uint8 -> single-track MP4 with raw RGB24 samples.

    Layout: ftyp, mdat (all samples, chunked), moov. stco offsets point
    into mdat, so the file is self-contained and seekable."""
    n, h, w = frames.shape[:3]
    sample = np.ascontiguousarray(frames, dtype=np.uint8)
    samples = [sample[i].tobytes() for i in range(n)]
    return _mux_mp4(samples, w, h, fps, samples_per_chunk, b"raw ",
                    b"raw video\x00")


def encode_mp4_mjpeg(frames: np.ndarray, fps: int = 10,
                     samples_per_chunk: int = 3,
                     quality: int = 90) -> bytes:
    """(n, h, w, 3) uint8 -> single-track MJPEG-in-MP4: each sample is
    one baseline JPEG (the classic 'jpeg' visual sample entry), muxed
    with the same ISO-BMFF table layout as the raw path. Fully
    round-trippable here: ``decode_mp4_frame`` routes 'jpeg' samples
    through the pure-NumPy baseline JPEG decoder."""
    from .jpegcodec import encode_jpeg_baseline
    n, h, w = frames.shape[:3]
    samples = [encode_jpeg_baseline(
        np.ascontiguousarray(frames[i], dtype=np.uint8), quality=quality)
        for i in range(n)]
    return _mux_mp4(samples, w, h, fps, samples_per_chunk, b"jpeg",
                    b"mjpeg video\x00")


def _mux_mp4(samples: list, w: int, h: int, fps: int,
             samples_per_chunk: int, codec4cc: bytes,
             compressor: bytes) -> bytes:
    n = len(samples)
    if not 1 <= samples_per_chunk:
        raise ValueError("samples_per_chunk must be >= 1")
    sizes = [len(s) for s in samples]
    data = b"".join(samples)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2" + b"mp41")
    mdat = _box(b"mdat", data)
    mdat_payload_off = len(ftyp) + 8

    n_chunks = -(-n // samples_per_chunk)
    chunk_offsets = []
    pos = mdat_payload_off
    for c in range(n_chunks):
        chunk_offsets.append(pos)
        in_chunk = min(samples_per_chunk, n - c * samples_per_chunk)
        pos += sum(sizes[c * samples_per_chunk:
                         c * samples_per_chunk + in_chunk])

    timescale = 1000
    delta = timescale // max(fps, 1)
    duration = n * delta

    stsd_entry = (b"\x00" * 6 + struct.pack(">H", 1)        # data_ref_idx
                  + b"\x00" * 16
                  + struct.pack(">HH", w, h)
                  + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
                  + struct.pack(">I", 0)
                  + struct.pack(">H", 1)                     # frame_count
                  + b"\x00" * 32                             # compressorname
                  + struct.pack(">Hh", 24, -1))              # depth
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1)
                 + _box(codec4cc, stsd_entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    # one stsc run; a short final chunk needs no extra entry (the spec's
    # run semantics only bound FULL chunks; demuxers clamp by stsz/stco)
    stsc = _full(b"stsc", 0, 0,
                 struct.pack(">IIII", 1, 1, samples_per_chunk, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">I", n_chunks)
                 + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full(b"url ", 0, 1, b"")          # flag 1: self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + compressor)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(buf: bytes, start: int, end: int, found: dict) -> None:
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack_from(">I4s", buf, i)
        if size == 1:   # 64-bit largesize
            size = struct.unpack_from(">Q", buf, i + 8)[0]
            body = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
            body = i + 8
        else:
            body = i + 8
        if size < 8 or i + size > end:
            raise ValueError("malformed MP4 box tree")
        if btype in _CONTAINERS:
            _walk(buf, body, i + size, found)
        else:
            found.setdefault(btype, (body, i + size))
        i += size


def _parse_tables(buf: bytes) -> dict:
    found: dict = {}
    _walk(buf, 0, len(buf), found)
    for req in (b"stsd", b"stsz", b"stco", b"stsc", b"stts", b"mdhd"):
        if req not in found and not (req == b"stco" and b"co64" in found):
            raise ValueError(f"MP4 missing {req.decode()} box")
    out: dict = {}
    s, _ = found[b"stsd"]
    n_entries = struct.unpack_from(">I", buf, s + 4)[0]
    if n_entries < 1:
        raise ValueError("empty stsd")
    entry = s + 8
    out["codec"] = buf[entry + 4:entry + 8].decode("latin1")
    out["width"], out["height"] = struct.unpack_from(">HH", buf,
                                                     entry + 8 + 24)
    s, _ = found[b"stsz"]
    fixed, n = struct.unpack_from(">II", buf, s + 4)
    out["n_samples"] = n
    if fixed:
        out["sizes"] = np.full(n, fixed, dtype=np.int64)
    else:
        out["sizes"] = np.frombuffer(buf, dtype=">u4", count=n,
                                     offset=s + 12).astype(np.int64)
    if b"stco" in found:
        s, _ = found[b"stco"]
        nc = struct.unpack_from(">I", buf, s + 4)[0]
        out["chunk_offsets"] = np.frombuffer(
            buf, dtype=">u4", count=nc, offset=s + 8).astype(np.int64)
    else:
        s, _ = found[b"co64"]
        nc = struct.unpack_from(">I", buf, s + 4)[0]
        out["chunk_offsets"] = np.frombuffer(
            buf, dtype=">u8", count=nc, offset=s + 8).astype(np.int64)
    s, _ = found[b"stsc"]
    ne = struct.unpack_from(">I", buf, s + 4)[0]
    runs = np.frombuffer(buf, dtype=">u4", count=ne * 3,
                         offset=s + 8).astype(np.int64).reshape(ne, 3)
    out["stsc_runs"] = runs    # (first_chunk 1-based, per_chunk, desc_idx)
    s, _ = found[b"stts"]
    ne = struct.unpack_from(">I", buf, s + 4)[0]
    out["stts"] = np.frombuffer(buf, dtype=">u4", count=ne * 2,
                                offset=s + 8).astype(np.int64).reshape(ne, 2)
    s, _ = found[b"mdhd"]
    version = buf[s]
    if version == 1:
        out["timescale"] = struct.unpack_from(">I", buf, s + 4 + 16)[0]
        out["duration"] = struct.unpack_from(">Q", buf, s + 4 + 20)[0]
    else:
        out["timescale"], out["duration"] = struct.unpack_from(
            ">II", buf, s + 4 + 8)
    return out


def mp4_info(buf: bytes) -> dict:
    """codec / width / height / n_samples / timescale / duration /
    sample_ms (per-sample presentation offsets in ms)."""
    t = _parse_tables(buf)
    deltas = np.repeat(t["stts"][:, 1], t["stts"][:, 0])
    if len(deltas) < t["n_samples"]:    # tolerate short stts (pad last)
        pad = np.full(t["n_samples"] - len(deltas),
                      deltas[-1] if len(deltas) else 1, dtype=np.int64)
        deltas = np.concatenate([deltas, pad])
    starts = np.concatenate([[0], np.cumsum(deltas[:-1])])
    return {"codec": t["codec"], "width": int(t["width"]),
            "height": int(t["height"]), "n_samples": int(t["n_samples"]),
            "timescale": int(t["timescale"]), "duration": int(t["duration"]),
            "sample_ms": starts * 1000 // max(t["timescale"], 1)}


def mp4_sample_ranges(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, sizes) byte range of EVERY sample: the standard
    stsc-run expansion (first_chunk/samples_per_chunk) + stco chunk
    bases + within-chunk prefix sums — all vectorized."""
    t = _parse_tables(buf)
    n = t["n_samples"]
    sizes = t["sizes"]
    chunks = t["chunk_offsets"]
    runs = t["stsc_runs"]
    nc = len(chunks)
    per_chunk = np.empty(nc, dtype=np.int64)
    for i in range(len(runs)):
        first = runs[i, 0] - 1
        last = runs[i + 1, 0] - 1 if i + 1 < len(runs) else nc
        per_chunk[first:last] = runs[i, 1]
    csum = np.concatenate([[0], np.cumsum(per_chunk)])
    # chunk index of every sample; final chunk may be short — clamp by n
    sample_chunk = np.searchsorted(csum, np.arange(n), side="right") - 1
    within = np.arange(n) - csum[sample_chunk]
    size_csum = np.concatenate([[0], np.cumsum(sizes)])
    chunk_first_sample = csum[sample_chunk]
    offsets = (chunks[sample_chunk]
               + size_csum[np.arange(n)] - size_csum[chunk_first_sample])
    del within
    return offsets, sizes


def decode_mp4_frame(buf: bytes, idx: int) -> np.ndarray:
    """Decode ONE video sample to (h, w, 3) uint8 by byte-range seek
    (no other sample is touched). Real pixel paths: 'raw ' RGB24 and
    'jpeg'/'mjpa' (MJPEG — each sample is a baseline JPEG, decoded by
    the pure-NumPy ``jpegcodec``). Other compressed codecs raise
    NotImplementedError: the sample TABLE still parses — only pixel
    decode needs a library this container lacks."""
    info = mp4_info(buf)
    codec = info["codec"]
    if codec not in ("raw ", "jpeg", "mjpa"):
        raise NotImplementedError(
            f"MP4 codec {codec!r} needs a decoder library this "
            "container lacks; the sample TABLE still parses — only pixel "
            "decode is unavailable")
    if not 0 <= idx < info["n_samples"]:
        raise IndexError(idx)
    offsets, sizes = mp4_sample_ranges(buf)
    if codec == "raw ":
        h, w = info["height"], info["width"]
        return np.frombuffer(buf, dtype=np.uint8, count=int(sizes[idx]),
                             offset=int(offsets[idx])).reshape(h, w, 3)
    from .jpegcodec import decode_jpeg_baseline
    off, sz = int(offsets[idx]), int(sizes[idx])
    return decode_jpeg_baseline(buf[off:off + sz])


def decode_mp4_raw_frame(buf: bytes, idx: int) -> np.ndarray:
    """Back-compat alias of ``decode_mp4_frame`` (originally raw-only)."""
    return decode_mp4_frame(buf, idx)
