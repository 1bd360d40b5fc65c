"""Pure-numpy media codecs (functions/codecs.py): bit-exact round
trips, spec edge cases (row padding, comments, odd chunks, top-down
BMP), and malformed-byte rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bioner_ray.functions import codecs


def _img(h, w, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


class TestSniff:
    def test_all_formats(self):
        assert codecs.sniff(codecs.encode_pgm(_img(4, 5))) == "pgm"
        assert codecs.sniff(codecs.encode_ppm(_img(4, 5, 3))) == "ppm"
        assert codecs.sniff(codecs.encode_bmp(_img(4, 5, 3))) == "bmp"
        assert codecs.sniff(codecs.encode_wav(np.zeros(8, dtype=np.int16))) == "wav"
        assert codecs.sniff(codecs.encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8))) == "y4m"
        assert codecs.sniff(b"\x89PNG\r\n") is None
        assert codecs.sniff(b"") is None


class TestNetpbm:
    @pytest.mark.parametrize("h,w", [(1, 1), (7, 13), (32, 8)])
    def test_pgm_roundtrip(self, h, w):
        img = _img(h, w)
        np.testing.assert_array_equal(codecs.decode_netpbm(codecs.encode_pgm(img)), img)

    def test_ppm_roundtrip(self):
        img = _img(9, 11, 3)
        np.testing.assert_array_equal(codecs.decode_netpbm(codecs.encode_ppm(img)), img)

    def test_header_comments_and_whitespace(self):
        # other tools emit comments and arbitrary whitespace; the spec
        # allows both anywhere between header tokens
        img = _img(3, 4)
        payload = b"P5 # tool says hi\n # more\n 4\t3\n255\n" + img.tobytes()
        np.testing.assert_array_equal(codecs.decode_netpbm(payload), img)

    def test_truncated_and_bad_maxval_rejected(self):
        good = codecs.encode_pgm(_img(6, 6))
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_netpbm(good[:-5])
        with pytest.raises(ValueError, match="maxval"):
            codecs.decode_netpbm(b"P5\n2 2\n65535\n" + b"\0" * 8)
        with pytest.raises(ValueError):
            codecs.decode_netpbm(b"P4\n2 2\n")  # bitmap PBM unsupported


class TestBmp:
    @pytest.mark.parametrize("h,w", [(1, 1), (5, 7), (16, 3)])  # w=7,3 force row padding
    def test_roundtrip_rgb(self, h, w):
        img = _img(h, w, 3)
        np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)

    def test_gray_promotes_to_rgb(self):
        img = _img(4, 6)
        out = codecs.decode_bmp(codecs.encode_bmp(img))
        assert out.shape == (4, 6, 3)
        np.testing.assert_array_equal(out[:, :, 0], img)

    def test_top_down_negative_height(self):
        img = _img(4, 4, 3)
        payload = bytearray(codecs.encode_bmp(img))
        # flip to top-down: negate height, reverse raster row order
        h, w = img.shape[:2]
        struct.pack_into("<i", payload, 22, -h)
        stride = (w * 3 + 3) // 4 * 4
        raster = bytes(payload[54:])
        rows = [raster[i * stride : (i + 1) * stride] for i in range(h)]
        payload[54:] = b"".join(reversed(rows))
        np.testing.assert_array_equal(codecs.decode_bmp(bytes(payload)), img)

    def test_compressed_rejected(self):
        payload = bytearray(codecs.encode_bmp(_img(2, 2, 3)))
        struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="uncompressed"):
            codecs.decode_bmp(bytes(payload))

    def test_decode_image_luma_is_integer_bt601(self):
        img = np.array([[[255, 0, 0]]], dtype=np.uint8)  # pure red
        gray = codecs.decode_image(codecs.encode_ppm(img))
        assert gray[0, 0] == (299 * 255 + 500) // 1000


class TestWav:
    def test_mono_roundtrip(self):
        rng = np.random.default_rng(1)
        s = rng.integers(-(2**15), 2**15, 777).astype(np.int16)
        out, rate = codecs.decode_wav(codecs.encode_wav(s, rate=8000))
        assert rate == 8000 and out.shape == (777, 1)
        np.testing.assert_array_equal(out[:, 0], s)

    def test_stereo_roundtrip(self):
        s = np.arange(-10, 10, dtype=np.int16).reshape(-1, 2)
        out, _ = codecs.decode_wav(codecs.encode_wav(s))
        np.testing.assert_array_equal(out, s)

    def test_unknown_chunks_skipped_and_odd_padding(self):
        s = np.array([1, -2, 3], dtype=np.int16)
        payload = codecs.encode_wav(s)
        # splice an odd-length junk chunk (word-aligned per RIFF) before data
        head, data = payload[:36], payload[36:]
        junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\0"
        spliced = head[:12] + head[12:36] + junk + data
        spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
        out, _ = codecs.decode_wav(spliced)
        np.testing.assert_array_equal(out[:, 0], s)

    def test_8bit_pcm(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        data = bytes([0, 128, 255])
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        out, _ = codecs.decode_wav(payload)
        assert out[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]

    def test_missing_data_rejected(self):
        with pytest.raises(ValueError, match="fmt/data"):
            codecs.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


class TestY4m:
    def test_mono_roundtrip(self):
        frames = _img(3, 6, seed=2).reshape(1, 3, 6).repeat(4, axis=0).copy()
        frames[2] ^= 0xFF
        np.testing.assert_array_equal(codecs.decode_y4m(codecs.encode_y4m(frames)), frames)

    def test_c420_luma_extracted(self):
        w, h = 4, 2
        luma = _img(h, w, seed=3)
        chroma = b"\x80" * ((w // 2) * (h // 2) * 2)
        payload = b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\n" + b"FRAME\n" + luma.tobytes() + chroma
        out = codecs.decode_y4m(payload)
        assert out.shape == (1, h, w)
        np.testing.assert_array_equal(out[0], luma)

    def test_default_colorspace_is_420(self):
        w, h = 2, 2
        luma = _img(h, w, seed=4)
        payload = b"YUV4MPEG2 W2 H2 F25:1\n" + b"FRAME\n" + luma.tobytes() + b"\x80\x80"
        np.testing.assert_array_equal(codecs.decode_y4m(payload)[0], luma)

    def test_truncated_frame_rejected(self):
        payload = codecs.encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8))
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_y4m(payload[:-3])

    def test_unsupported_colorspace_rejected(self):
        with pytest.raises(ValueError, match="colorspace"):
            codecs.decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + b"\0" * 12)
