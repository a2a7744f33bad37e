"""Tests for the baseline TIFF decoder + lossless encoder twin
(``operators/tiff.py``) and its ``decode_media`` integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mlentory_etl_pipeline_spark.operators import multimodal, tiff


def test_rgb_roundtrip_both_orders_strips_packbits():
    rng = np.random.default_rng(4)
    for big_endian in (False, True):
        for packbits in (False, True):
            for rps in (None, 3):
                rgb = rng.integers(0, 256, size=(11, 17, 3)).astype(np.uint8)
                enc = tiff.tiff_encode(
                    rgb.tobytes(), 17, 11, "rgb",
                    big_endian=big_endian, packbits=packbits,
                    rows_per_strip=rps,
                )
                got, w, h = tiff.decode_tiff(enc)
                assert (w, h) == (17, 11)
                assert np.array_equal(got, rgb), (big_endian, packbits, rps)


def test_gray_8_and_16_bit():
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, size=(9, 13)).astype(np.uint8)
    got, _, _ = tiff.decode_tiff(
        tiff.tiff_encode(g.tobytes(), 13, 9, "gray", packbits=True,
                         rows_per_strip=2)
    )
    assert np.array_equal(got[:, :, 0], g)
    g16 = rng.integers(0, 65536, size=(7, 5))
    want = (g16 >> 8).astype(np.uint8)
    for big_endian, dt in ((False, "<u2"), (True, ">u2")):
        enc = tiff.tiff_encode(
            g16.astype(dt).tobytes(), 5, 7, "gray16", big_endian=big_endian
        )
        got, _, _ = tiff.decode_tiff(enc)
        assert np.array_equal(got[:, :, 0], want), big_endian


def test_min_is_white_inversion():
    """Photometric 0 (MinIsWhite) inverts grayscale: patch the
    photometric tag value in a valid gray file."""
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    enc = bytearray(tiff.tiff_encode(g.tobytes(), 8, 8, "gray"))
    # find the IFD entry for tag 262 and flip its value 1 -> 0
    (n,) = struct.unpack("<H", enc[8:10])
    for i in range(n):
        e = 10 + 12 * i
        (tag,) = struct.unpack("<H", enc[e : e + 2])
        if tag == 262:
            assert struct.unpack("<H", enc[e + 8 : e + 10])[0] == 1
            struct.pack_into("<H", enc, e + 8, 0)
            break
    else:  # pragma: no cover
        raise AssertionError("photometric tag not found")
    got, _, _ = tiff.decode_tiff(bytes(enc))
    assert np.array_equal(got[:, :, 0], 255 - g)


def test_palette_colormap_hand_built():
    """Photometric 3: hand-build a 4x2 paletted file with a 16-bit
    ColorMap (reds, then greens, then blues)."""
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    pal8 = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    cmap = [v << 8 for v in pal8[:, 0]] + [v << 8 for v in pal8[:, 1]] + [
        v << 8 for v in pal8[:, 2]
    ]
    entries = [
        (256, 4, 1, 4), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (277, 3, 1, 1), (278, 4, 1, 2),
    ]
    n = len(entries) + 3  # + ColorMap, StripOffsets, StripByteCounts
    ifd_size = 2 + 12 * n + 4
    cmap_off = 8 + ifd_size
    strip_off = cmap_off + 2 * len(cmap)
    entries += [
        (273, 4, 1, strip_off),
        (279, 4, 1, 8),
        (320, 3, len(cmap), cmap_off),
    ]
    entries.sort()
    out = bytearray(b"II" + struct.pack("<H", 42) + struct.pack("<I", 8))
    out += struct.pack("<H", n)
    for tag, ftype, count, val in entries:
        out += struct.pack("<HHII", tag, ftype, count, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<" + "H" * len(cmap), *cmap)
    out += idx.tobytes()
    got, w, h = tiff.decode_tiff(bytes(out))
    assert (w, h) == (4, 2)
    assert np.array_equal(got, pal8[idx])


def test_taxonomy_and_fuzz():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    good = tiff.tiff_encode(rgb.tobytes(), 8, 8, "rgb")
    with pytest.raises(ValueError, match="byte-order"):
        tiff.decode_tiff(b"XX" + good[2:])
    # BigTIFF magic: capability gap
    big = bytearray(good)
    struct.pack_into("<H", big, 2, 43)
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        tiff.decode_tiff(bytes(big))
    # LZW compression: capability gap (patch tag 259 value to 5)
    lzw = bytearray(good)
    (n,) = struct.unpack("<H", lzw[8:10])
    for i in range(n):
        e = 10 + 12 * i
        if struct.unpack("<H", lzw[e : e + 2])[0] == 259:
            struct.pack_into("<H", lzw, e + 8, 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        tiff.decode_tiff(bytes(lzw))
    # mutation fuzz: taxonomy only
    for t in range(150):
        buf = bytearray(good)
        kind = t % 3
        if kind == 0:
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= int(rng.integers(1, 256))
        elif kind == 1:
            i = int(rng.integers(0, len(buf)))
            j = min(len(buf), i + int(rng.integers(1, 16)))
            buf[i:j] = bytes(j - i)
        else:
            buf = buf[: int(rng.integers(1, len(buf)))]
        try:
            tiff.decode_tiff(bytes(buf))
        except (ValueError, NotImplementedError):
            pass


def test_decode_media_real_tiff(spark):
    rng = np.random.default_rng(15)
    rgb = rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
    enc = tiff.tiff_encode(rgb.tobytes(), 32, 24, "rgb", packbits=True)
    media = spark.createDataFrame(
        [(0, "image", enc, "tiff", 32, 24, None)], multimodal.MEDIA_SCHEMA
    )
    [got] = multimodal.decode_media(media, fake=False, feature_dim=6).collect()
    r = rgb.astype(np.int64)
    lum = ((r[..., 0] * 299 + r[..., 1] * 587 + r[..., 2] * 114) // 1000)
    lum = lum.reshape(-1) / 255.0
    want = [float(s.mean()) for s in np.array_split(lum, 6)]
    assert all(abs(float(a) - b) < 1e-6 for a, b in zip(got.features, want))
