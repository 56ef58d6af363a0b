"""Multimodal column operators (decode / feature / resize / frame-sample).

Images/audio/video are opaque ``binary`` columns with typed metadata
columns alongside; heavy per-payload work runs as actor-pool
``map_batches`` stages (state in ``__init__``, work in ``__call__``).

REAL decode paths (pure NumPy + stdlib zlib, no external libraries):
- PPM (P6 binary RGB) and PGM (P5 gray) images
- BMP (uncompressed 24-bit BI_RGB, bottom-up)
- PNG (non-interlaced 8-bit gray / gray+alpha / RGB / RGBA, all five
  scanline filters — zlib inflate + vectorized unfilter)
- JPEG (baseline sequential SOF0, 8-bit gray / YCbCr 4:4:4 — own
  Huffman + DCT implementation in ``jpegcodec.py``, encoder included)
- WAV (RIFF PCM16 mono) audio
- RAWV, a trivial raw-RGB video container used by the synthetic
  generator (``b"RAWV" + <u16 w, u16 h, u16 n_frames, u16 fps> +
  n_frames * h*w*3 raw bytes``) — frame sampling seeks by offset math,
  decoding only the sampled frames.
- MP4 (ISO-BMFF, ``mp4box.py``): the box tree and full sample table
  (stsd/stts/stsc/stsz/stco) parse structurally for ANY codec — frame
  timing and exact per-sample byte ranges are always real — and
  'raw ' RGB24 samples decode to pixels; compressed codecs (avc1, …)
  are the pixel-decode stub.

Formats that genuinely require codec libraries (compressed MP4 codecs,
progressive or subsampled JPEG, and the palette/16-bit/interlaced PNG
variants) are STUBBED: ``DecodeImage(fake=False)`` raises
``NotImplementedError`` for them — no image library is used even if
importable; ``fake=True`` emits a deterministic feature seeded from
sha256(payload) so pipelines still exercise realistic data movement.

Features are real signal statistics, stable across runs/parallelism:
- images: 8x8 nearest-resized grayscale, mean-centered (64-dim — the
  classic aHash-style embedding)
- audio: 64-bin average magnitude spectrum (np.fft) of the PCM signal

Usage shape:

    ds.map_batches(DecodeImage, batch_size=64,   # small: payloads large
                   concurrency=8, num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64

MIME_PPM = "image/x-portable-pixmap"
MIME_PGM = "image/x-portable-graymap"
MIME_BMP = "image/bmp"
MIME_PNG = "image/png"
MIME_JPEG = "image/jpeg"
MIME_WAV = "audio/wav"
MIME_RAWV = "video/x-rawv"
MIME_MP4 = "video/mp4"

from .jpegcodec import decode_jpeg_baseline, encode_jpeg_baseline  # noqa: E402
from .mp4box import (decode_mp4_frame, encode_mp4_mjpeg,  # noqa: E402
                     encode_mp4_raw, mp4_info)


# --------------------------------------------------------------- codecs (real)

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> (h, w, 3) or (h, w) uint8."""
    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, width, height, maxval — whitespace separated, with
    # optional '#' comment lines
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if buf[i:i + 1] == b"#":
            while i < len(buf) and buf[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        fields.append(buf[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    ch = 3 if buf[:2] == b"P6" else 1
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=i)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP (bottom-up, BGR)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    raw = data.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raw), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw),
                       2835, 2835, 0, 0)
    return header + info + raw


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", buf, 10)[0]
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", buf, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


# PNG color types with 8-bit depth this codec handles (palette needs a
# PLTE lookup; 16-bit needs byte-pair lanes — both out of scope)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _png_filter_row(cur: np.ndarray, prev: np.ndarray, bpp: int,
                    ftype: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one unfiltered scanline (encoding
    direction — fully vectorized: every predictor reads only ORIGINAL
    bytes, so there is no serial dependency when filtering)."""
    c = cur.astype(np.int64)
    left = np.zeros_like(c)
    left[bpp:] = c[:-bpp]
    up = prev.astype(np.int64)
    upleft = np.zeros_like(c)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        return cur
    if ftype == 1:
        return ((c - left) % 256).astype(np.uint8)
    if ftype == 2:
        return ((c - up) % 256).astype(np.uint8)
    if ftype == 3:
        return ((c - (left + up) // 2) % 256).astype(np.uint8)
    if ftype == 4:
        return ((c - _paeth(left, up, upleft)) % 256).astype(np.uint8)
    raise ValueError(f"unknown PNG filter {ftype}")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int64 arrays."""
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """(h, w) gray / (h, w, 2) gray+alpha / (h, w, 3) RGB / (h, w, 4)
    RGBA uint8 -> non-interlaced 8-bit PNG. ``filter_type`` picks the
    per-row filter (0..4) — useful to exercise every decode branch."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ct, ch = 0, 1
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        ch = img.shape[2]
        ct = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    rows = img.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    parts = []
    for y in range(h):
        parts.append(bytes([filter_type]))
        parts.append(_png_filter_row(rows[y], prev, ch, filter_type)
                     .tobytes())
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(parts),
                                                compress_level))
            + _png_chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """Non-interlaced 8-bit gray/gray+alpha/RGB/RGBA PNG -> (h, w[, ch])
    uint8. Pure stdlib-zlib + NumPy: IDAT chunks concatenate into one
    zlib stream of filtered scanlines; unfiltering runs row-by-row with
    vectorized lanes — filters 0/2 are whole-row ops, filter 1 (sub) is
    a per-pixel cumulative sum done as cumsum mod 256, filters 3/4
    (average/paeth) walk pixels with channel-lane vector steps (their
    predictors read DECODED left bytes, an inherently serial recurrence).
    Palette (color type 3), 16-bit and interlaced PNGs raise."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    idat = []
    w = h = ct = depth = interlace = None
    while i + 8 <= len(buf):
        ln = struct.unpack_from(">I", buf, i)[0]
        ctype = buf[i + 4:i + 8]
        data = buf[i + 8:i + 8 + ln]
        if ctype == b"IHDR":
            w, h, depth, ct, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0 or ct not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only non-interlaced 8-bit gray/RGB/alpha PNGs supported "
            f"(got depth={depth}, color type={ct}, interlace={interlace})")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has the wrong length")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        r = raw[y, 1:].astype(np.int64)
        f = int(filters[y])
        if f == 0:
            cur = r
        elif f == 1:     # sub: out[x] = r[x] + out[x-ch] — cumsum mod 256
            cur = (r.reshape(w, ch).cumsum(axis=0) % 256).reshape(stride)
        elif f == 2:     # up
            cur = (r + prev) % 256
        elif f in (3, 4):  # average / paeth: serial in x, vector in ch
            cur = np.zeros(stride, dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            upleft = np.zeros(ch, dtype=np.int64)
            for x in range(0, stride, ch):
                up = prev[x:x + ch]
                pred = ((left + up) // 2 if f == 3
                        else _paeth(left, up, upleft))
                left = (r[x:x + ch] + pred) % 256
                upleft = up
                cur[x:x + ch] = left
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF WAV."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM16 mono WAV -> (int16 samples, sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    rate = None
    while i + 8 <= len(buf):
        cid = buf[i:i + 4]
        sz = struct.unpack_from("<I", buf, i + 4)[0]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", buf, i + 8)
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", count=sz // 2,
                                    offset=i + 8)
            return samples, int(rate or 16000)
        i += 8 + sz + (sz & 1)
    raise ValueError("no data chunk")


def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 -> RAWV container."""
    n, h, w = frames.shape[:3]
    return (b"RAWV" + struct.pack("<HHHH", w, h, n, fps)
            + np.ascontiguousarray(frames, dtype=np.uint8).tobytes())


def rawv_info(buf: bytes) -> tuple[int, int, int, int]:
    if buf[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    w, h, n, fps = struct.unpack_from("<HHHH", buf, 4)
    return w, h, n, fps


def decode_rawv_frame(buf: bytes, idx: int) -> np.ndarray:
    """Decode ONE frame by offset math (no full-container decode)."""
    w, h, n, _fps = rawv_info(buf)
    if not 0 <= idx < n:
        raise IndexError(idx)
    sz = h * w * 3
    return np.frombuffer(buf, dtype=np.uint8, count=sz,
                         offset=12 + idx * sz).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index arithmetic."""
    h, w = img.shape[:2]
    ys = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64)
    xs = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64)
    return img[ys[:, None], xs[None, :]]


def image_feature(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Mean-centered 8x8 grayscale thumbnail (aHash-style embedding)."""
    side = int(np.sqrt(dim))
    if img.ndim == 3:
        gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    else:
        gray = img.astype(np.float64)
    thumb = resize_nearest(gray, side, side).reshape(-1)
    return thumb - thumb.mean()


def audio_feature(samples: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Average magnitude spectrum binned to ``dim`` bands."""
    x = samples.astype(np.float64)
    if len(x) < 2 * dim:
        x = np.pad(x, (0, 2 * dim - len(x)))
    spec = np.abs(np.fft.rfft(x))[1:]           # drop DC
    cut = (len(spec) // dim) * dim
    return spec[:cut].reshape(dim, -1).mean(axis=1)


# ----------------------------------------------------------- synthetic media

def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows with REAL payloads: PPM / BMP
    / PNG / JPEG images (PNG rows cycle through filter types 0-4, JPEG
    through qualities 80-99), PCM16 WAV audio, RAWV video — every row
    decodable by the pure-NumPy codecs above."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows: dict[str, list] = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            variant = (i // 3) % 4
            if variant == 0:
                payload, mime = encode_ppm(img), MIME_PPM
            elif variant == 1:
                payload, mime = encode_bmp(img), MIME_BMP
            elif variant == 2:
                payload, mime = encode_png(img, filter_type=(i // 9) % 5), \
                    MIME_PNG
            else:
                payload, mime = encode_jpeg_baseline(
                    img, quality=80 + (i // 12) % 20), MIME_JPEG
            dur = -1
        elif kind == "audio":
            sr = 8000
            t = np.arange(int(rng.integers(400, 4000)))
            freq = float(rng.uniform(100, 1000))
            samples = (3000 * np.sin(2 * np.pi * freq * t / sr)).astype(
                np.int16)
            payload, mime = encode_wav_pcm16(samples, sr), MIME_WAV
            h = w = -1
            dur = int(len(samples) * 1000 / sr)
        else:
            h, w = 16, 16
            nf = int(rng.integers(3, 9))
            frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            variant = (i // 3) % 3  # rotate: RAWV / raw MP4 / MJPEG MP4
            if variant == 1:
                payload, mime = encode_mp4_raw(
                    frames, fps=10,
                    samples_per_chunk=2 + (i // 6) % 3), MIME_MP4
            elif variant == 2:
                payload, mime = encode_mp4_mjpeg(
                    frames, fps=10, samples_per_chunk=2 + (i // 6) % 3,
                    quality=85 + (i // 9) % 11), MIME_MP4
            else:
                payload, mime = encode_rawv(frames, fps=10), MIME_RAWV
            dur = nf * 100
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w if kind != "audio" else -1)
        rows["height"].append(h if kind != "audio" else -1)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------- actor stages

class DecodeImage:
    """Actor-pool decode + feature-extract stage.

    Per row, by mime: PPM/PGM/BMP/PNG/JPEG/WAV/RAWV decode with the
    REAL NumPy/zlib codecs (RAWV featurizes its middle frame); other
    formats fall back to a deterministic sha256-seeded fake vector when
    ``fake=True`` (default) or raise ``NotImplementedError`` otherwise
    (MP4 etc. need codec libraries this container lacks — no external
    image library is attempted or used).
    """

    def __init__(self, fake: bool = True, feature_dim: int = FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        return rng.standard_normal(self.feature_dim)

    def _features(self, payload: bytes, mime: str) -> np.ndarray:
        if mime in (MIME_PPM, MIME_PGM):
            return image_feature(decode_ppm(payload), self.feature_dim)
        if mime == MIME_BMP:
            return image_feature(decode_bmp(payload), self.feature_dim)
        if mime == MIME_PNG:
            return image_feature(decode_png(payload), self.feature_dim)
        if mime == MIME_JPEG:
            return image_feature(decode_jpeg_baseline(payload),
                                 self.feature_dim)
        if mime == MIME_WAV:
            return audio_feature(decode_wav_pcm16(payload)[0],
                                 self.feature_dim)
        if mime == MIME_RAWV:
            _w, _h, n, _ = rawv_info(payload)
            return image_feature(decode_rawv_frame(payload, n // 2),
                                 self.feature_dim)
        if mime == MIME_MP4:
            # structural parse is always real (mp4box); pixel decode is
            # real for 'raw ' RGB24 and MJPEG ('jpeg'/'mjpa') samples,
            # codec-stubbed otherwise
            try:
                info = mp4_info(payload)
                return image_feature(
                    decode_mp4_frame(payload, info["n_samples"] // 2),
                    self.feature_dim)
            except (NotImplementedError, ValueError):
                # compressed codec or malformed container: plumbing mode
                # degrades to the deterministic fake, strict mode raises
                if self.fake:
                    return self._fake_features(payload)
                raise
        if self.fake:
            return self._fake_features(payload)
        raise NotImplementedError(
            f"decoding {mime!r} requires a codec library this container "
            "lacks (none is used); pass fake=True for the deterministic "
            "plumbing path")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        mimes = batch["mime"].to_pylist()
        feats = np.stack([self._features(p, m) for p, m in
                          zip(payloads.to_pylist(), mimes)]) \
            if batch.num_rows else np.zeros((0, self.feature_dim))
        flat = pa.array(feats.reshape(-1).astype(np.float32))
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.FixedSizeListArray.from_arrays(flat,
                                                         self.feature_dim),
        })


class SampleFrames:
    """Video frame-sampling stage: for RAWV and MP4('raw ') payloads,
    REALLY decodes the ``n_frames`` evenly-spaced frames (offset-seek /
    sample-table byte ranges, no full decode) and emits one row per
    frame with its aHash feature; compressed-codec MP4s still get REAL
    sample-table timing with zeroed features; unknown containers emit
    uniform offsets only."""

    def __init__(self, n_frames: int = 4, feature_dim: int = FEATURE_DIM):
        self.n = n_frames
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offs, feats = [], [], []
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for mid, kind, dur, mime, payload in zip(
                batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
                batch["duration_ms"].to_pylist(), batch["mime"].to_pylist(),
                payloads.to_pylist()):
            if kind != "video" or dur <= 0:
                continue
            if mime == MIME_RAWV:
                _w, _h, nf, fps = rawv_info(payload)
                for j in range(self.n):
                    fi = min(int(nf * (j + 0.5) / self.n), nf - 1)
                    ids.append(mid)
                    offs.append(int(fi * 1000 / max(fps, 1)))
                    feats.append(image_feature(
                        decode_rawv_frame(payload, fi), self.dim))
            elif mime == MIME_MP4:
                # REAL sample-table timing for any codec; pixel decode
                # for 'raw ' and MJPEG samples, zeros for codec-stubbed
                info = mp4_info(payload)
                nf = info["n_samples"]
                for j in range(self.n):
                    fi = min(int(nf * (j + 0.5) / self.n), nf - 1)
                    ids.append(mid)
                    offs.append(int(info["sample_ms"][fi]))
                    try:
                        feats.append(image_feature(
                            decode_mp4_frame(payload, fi), self.dim))
                    except NotImplementedError:
                        feats.append(np.zeros(self.dim))
            else:
                for j in range(self.n):
                    ids.append(mid)
                    offs.append(int(dur * (j + 0.5) / self.n))
                    feats.append(np.zeros(self.dim))
        flat = pa.array(np.concatenate(feats).astype(np.float32)
                        if feats else np.zeros(0, np.float32))
        return pa.table({"media_id": pa.array(ids, type=pa.int64()),
                         "frame_ms": pa.array(offs, type=pa.int64()),
                         "feature": pa.FixedSizeListArray.from_arrays(
                             flat, self.dim)})
