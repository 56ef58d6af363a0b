"""Pure-NumPy media codecs + actor-pool decode stages."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops.multimodal import (FEATURE_DIM, MIME_BMP, MIME_PPM,
                                      DecodeImage, SampleFrames,
                                      audio_feature, decode_bmp, decode_ppm,
                                      decode_rawv_frame, decode_wav_pcm16,
                                      encode_bmp, encode_ppm, encode_rawv,
                                      encode_wav_pcm16, image_feature,
                                      make_media_table, rawv_info,
                                      resize_nearest)


def test_ppm_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comment lines in the header parse too
    buf = encode_ppm(img)
    commented = b"P6\n# a comment\n7 13\n255\n" + buf.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), img)


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.default_rng(2)
    # width 7 -> 21-byte rows padded to 24: exercises stride handling
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    s = (1000 * np.sin(np.arange(500) / 7.0)).astype(np.int16)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_rawv_frame_seek():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(6, 4, 5, 3), dtype=np.uint8)
    buf = encode_rawv(frames, fps=10)
    assert rawv_info(buf) == (5, 4, 6, 10)
    for i in (0, 3, 5):
        assert np.array_equal(decode_rawv_frame(buf, i), frames[i])


def test_resize_nearest_identity_and_downsample():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert np.array_equal(resize_nearest(img, 4, 4), img)
    half = resize_nearest(img, 2, 2)
    assert half.shape == (2, 2)
    assert half[0, 0] in img[:2, :2]


def test_features_shapes_and_determinism():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    f1, f2 = image_feature(img), image_feature(img)
    assert f1.shape == (FEATURE_DIM,)
    assert np.array_equal(f1, f2)
    assert abs(f1.mean()) < 1e-9      # mean-centered
    s = (3000 * np.sin(np.arange(2000) / 5.0)).astype(np.int16)
    af = audio_feature(s)
    assert af.shape == (FEATURE_DIM,)
    assert af.max() > 0


def test_decode_stage_real_path(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(make_media_table(30))
    out = ds.map_batches(DecodeImage, fn_constructor_kwargs={"fake": False},
                         batch_size=16, concurrency=2,
                         batch_format="pyarrow", num_cpus=1).to_pandas()
    assert len(out) == 30
    # features vary across rows (real signal, not constant stub)
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (30, FEATURE_DIM)
    assert np.std(feats) > 0


def test_decode_stage_unknown_mime_strict_raises():
    # a container with no structural parser stays genuinely stubbed
    # (jpeg became a real codec in r3, MP4 box parsing in r3 too — a
    # malformed MP4 is now a parse error, covered in test_mp4.py)
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "kind": pa.array(["video"]),
                  "payload": pa.array([b"\x1aE\xdf\xa3 webm-ish"], pa.binary()),
                  "mime": pa.array(["video/webm"])})
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(t)
    # fake path still deterministic
    a = DecodeImage(fake=True)(t)["feature"].to_pylist()
    b = DecodeImage(fake=True)(t)["feature"].to_pylist()
    assert a == b
    # a REAL mime with a corrupt payload is a hard error even fake=True
    bad = pa.table({"media_id": pa.array([1], pa.int64()),
                    "kind": pa.array(["image"]),
                    "payload": pa.array([b"\xff\xd8 fake jpeg"], pa.binary()),
                    "mime": pa.array(["image/jpeg"])})
    with pytest.raises(ValueError):
        DecodeImage(fake=True)(bad)


def test_sample_frames_real_decode(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(make_media_table(30))
    out = ds.map_batches(SampleFrames, fn_constructor_kwargs={"n_frames": 3},
                         batch_size=16, concurrency=2,
                         batch_format="pyarrow", num_cpus=1).to_pandas()
    n_videos = (30 + 0) // 3   # every third row is a video
    assert len(out) == n_videos * 3
    feats = np.stack(out["feature"].to_numpy())
    assert np.std(feats) > 0   # real frame content, not zeros


# ----------------------------------------------------- PNG (r3: real decode)

class TestPng:
    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("shape", [(11, 7), (9, 5, 2), (13, 6, 3),
                                       (8, 8, 4)])
    def test_roundtrip_all_filters_all_colortypes(self, ftype, shape):
        from mircv_ray.ops.multimodal import decode_png, encode_png
        rng = np.random.default_rng(ftype * 10 + len(shape))
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img, filter_type=ftype))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_gradient_compresses_and_roundtrips(self):
        # smooth data exercises real zlib compression (not stored blocks)
        from mircv_ray.ops.multimodal import decode_png, encode_png
        y, x = np.mgrid[0:64, 0:48]
        img = np.stack([(y * 4) % 256, (x * 5) % 256, (y + x) % 256],
                       axis=-1).astype(np.uint8)
        buf = encode_png(img, filter_type=2)
        assert len(buf) < img.nbytes // 2
        assert np.array_equal(decode_png(buf), img)

    def test_multiple_idat_chunks(self):
        # IDAT may be split arbitrarily: re-chunk an encoded stream
        import struct
        import zlib
        from mircv_ray.ops.multimodal import (_PNG_SIG, _png_chunk,
                                              decode_png, encode_png)
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
        buf = encode_png(img)
        # extract chunks
        i, ihdr, idat = 8, None, b""
        while i + 8 <= len(buf):
            ln = struct.unpack_from(">I", buf, i)[0]
            ctype = buf[i + 4:i + 8]
            if ctype == b"IHDR":
                ihdr = buf[i + 8:i + 8 + ln]
            elif ctype == b"IDAT":
                idat += buf[i + 8:i + 8 + ln]
            i += 12 + ln
        split = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                 + b"".join(_png_chunk(b"IDAT", idat[j:j + 7])
                            for j in range(0, len(idat), 7))
                 + _png_chunk(b"IEND", b""))
        assert np.array_equal(decode_png(split), img)

    def test_unsupported_variants_raise(self):
        import struct
        import zlib
        from mircv_ray.ops.multimodal import (_PNG_SIG, _png_chunk,
                                              decode_png)
        def mk(depth, ct, interlace):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ct, 0, 0, interlace)
            return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 20))
                    + _png_chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_png(mk(16, 2, 0))        # 16-bit
        with pytest.raises(NotImplementedError):
            decode_png(mk(8, 3, 0))         # palette
        with pytest.raises(NotImplementedError):
            decode_png(mk(8, 2, 1))         # interlaced
        with pytest.raises(ValueError):
            decode_png(b"\x89PNG not a real signature")

    def test_media_table_includes_decodable_png(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops.multimodal import MIME_PNG
        tbl = make_media_table(60)
        assert MIME_PNG in set(tbl["mime"].to_pylist())
        out = rd.from_arrow(tbl).map_batches(
            DecodeImage, fn_constructor_kwargs={"fake": False},
            batch_size=16, concurrency=2, batch_format="pyarrow",
            num_cpus=1).to_pandas()
        assert len(out) == 60
        feats = np.stack(out["feature"].to_numpy())
        assert np.std(feats) > 0


# ---------------------------------------------------- JPEG (r3: real codec)

class TestJpeg:
    @pytest.mark.parametrize("shape", [(8, 8), (24, 33), (9, 10),
                                       (16, 16, 3), (17, 21, 3)])
    def test_coefficient_exact_roundtrip(self, shape):
        # the entropy layer is LOSSLESS: decoded zigzag coefficients must
        # equal the encoder's quantized coefficients bit for bit
        from mircv_ray.ops.jpegcodec import (
            _QT_CHROMA, _QT_LUMA, _quantized_coefs, _rgb_to_ycbcr,
            _scaled_qt, decode_jpeg_coefficients, encode_jpeg_baseline)
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        buf = encode_jpeg_baseline(img, quality=85)
        zz, qts, h, w = decode_jpeg_coefficients(buf)
        assert (h, w) == img.shape[:2]
        if img.ndim == 2:
            planes = [img.astype(np.float64)]
            bases = [_QT_LUMA]
        else:
            ycc = _rgb_to_ycbcr(img)
            planes = [ycc[..., i] for i in range(3)]
            bases = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
        assert len(zz) == len(planes)
        for got, plane, base in zip(zz, planes, bases):
            exp = _quantized_coefs(plane, _scaled_qt(base, 85))
            assert np.array_equal(got, exp)

    def test_smooth_image_low_error(self):
        from mircv_ray.ops.jpegcodec import (decode_jpeg_baseline,
                                             encode_jpeg_baseline)
        y, x = np.mgrid[0:32, 0:40]
        rgb = np.stack([np.minimum(x * 3, 255), np.minimum(y * 4, 255),
                        np.minimum(x + y, 255)], axis=-1).astype(np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(rgb, quality=95))
        assert dec.shape == rgb.shape
        err = np.abs(dec.astype(int) - rgb.astype(int))
        assert err.mean() < 2.0 and err.max() <= 12

    def test_flat_image_exact(self):
        from mircv_ray.ops.jpegcodec import (decode_jpeg_baseline,
                                             encode_jpeg_baseline)
        img = np.full((9, 10), 130, np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=50))
        assert np.array_equal(dec, img)

    def test_ff_stuffing_survives(self):
        # high-frequency content at high quality emits many literal bits
        # -> near-certain 0xFF bytes in the scan, exercising stuffing
        from mircv_ray.ops.jpegcodec import (decode_jpeg_baseline,
                                             encode_jpeg_baseline)
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
        buf = encode_jpeg_baseline(img, quality=100)
        assert b"\xff\x00" in buf[20:]      # stuffed bytes present
        dec = decode_jpeg_baseline(buf)
        assert dec.shape == img.shape

    def test_unsupported_modes_raise(self):
        import struct
        from mircv_ray.ops.jpegcodec import (decode_jpeg_baseline,
                                             encode_jpeg_baseline)
        img = np.zeros((8, 8), np.uint8)
        buf = bytearray(encode_jpeg_baseline(img))
        # flip SOF0 (0xC2 = progressive) — parser must refuse
        i = buf.find(b"\xff\xc0")
        prog = bytes(buf[:i]) + b"\xff\xc2" + bytes(buf[i + 2:])
        with pytest.raises(NotImplementedError):
            decode_jpeg_baseline(prog)
        with pytest.raises(ValueError):
            decode_jpeg_baseline(b"not a jpeg")
        with pytest.raises(ValueError):
            encode_jpeg_baseline(np.zeros((4, 4, 2), np.uint8))

    def test_media_table_includes_decodable_jpeg(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops.multimodal import MIME_JPEG
        tbl = make_media_table(60)
        assert MIME_JPEG in set(tbl["mime"].to_pylist())
        out = rd.from_arrow(tbl).map_batches(
            DecodeImage, fn_constructor_kwargs={"fake": False},
            batch_size=16, concurrency=2, batch_format="pyarrow",
            num_cpus=1).to_pandas()
        assert len(out) == 60
