"""Multimodal column operators (decode / feature / resize / frame-sample).

Images/audio/video are opaque ``binary`` columns with typed metadata
columns alongside; heavy per-payload work runs as actor-pool
``map_batches`` stages (state in ``__init__``, work in ``__call__``).

REAL decode paths (pure NumPy, no external libraries):
- PPM (P6 binary RGB) and PGM (P5 gray) images
- BMP (uncompressed 24-bit BI_RGB, bottom-up)
- WAV (RIFF PCM16 mono) audio
- RAWV, a trivial raw-RGB video container used by the synthetic
  generator (``b"RAWV" + <u16 w, u16 h, u16 n_frames, u16 fps> +
  n_frames * h*w*3 raw bytes``) — frame sampling seeks by offset math,
  decoding only the sampled frames.

Formats that genuinely require codec libraries (PNG/JPEG/MP4/…) are
STUBBED: ``DecodeImage(fake=False)`` raises ``NotImplementedError`` for
them unless PIL is importable; ``fake=True`` emits a deterministic
feature seeded from sha256(payload) so pipelines still exercise
realistic data movement.

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
MIME_WAV = "audio/wav"
MIME_RAWV = "video/x-rawv"


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
    images, PCM16 WAV audio, RAWV video — every row decodable by the
    pure-NumPy codecs above."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows: dict[str, list] = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 2:
                payload, mime = encode_bmp(img), MIME_BMP
            else:
                payload, mime = encode_ppm(img), MIME_PPM
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

    Per row, by mime: PPM/PGM/BMP/WAV/RAWV decode with the REAL NumPy
    codecs (RAWV featurizes its middle frame); other formats fall back
    to a deterministic sha256-seeded fake vector when ``fake=True``
    (default) or raise ``NotImplementedError`` otherwise (PNG/JPEG need
    codec libraries this container lacks; a PIL import is attempted).
    """

    def __init__(self, fake: bool = True, feature_dim: int = FEATURE_DIM):
        self.fake = fake
        self.feature_dim = feature_dim
        try:  # real decoder deps for PNG/JPEG, gated behind an import-try
            import PIL.Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        return rng.standard_normal(self.feature_dim)

    def _features(self, payload: bytes, mime: str) -> np.ndarray:
        if mime in (MIME_PPM, MIME_PGM):
            return image_feature(decode_ppm(payload), self.feature_dim)
        if mime == MIME_BMP:
            return image_feature(decode_bmp(payload), self.feature_dim)
        if mime == MIME_WAV:
            return audio_feature(decode_wav_pcm16(payload)[0],
                                 self.feature_dim)
        if mime == MIME_RAWV:
            _w, _h, n, _ = rawv_info(payload)
            return image_feature(decode_rawv_frame(payload, n // 2),
                                 self.feature_dim)
        if self.fake:
            return self._fake_features(payload)
        raise NotImplementedError(
            f"decoding {mime!r} requires an image library "
            f"(PIL available: {self._pil}); pass fake=True for the "
            "deterministic plumbing path")

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
    """Video frame-sampling stage: for RAWV payloads, REALLY decodes the
    ``n_frames`` evenly-spaced frames (offset-seek, no full decode) and
    emits one row per frame with its aHash feature; for other containers
    emits the offsets only (decode stubbed)."""

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
