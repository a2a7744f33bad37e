"""Tests for the from-scratch GIF decoder + encoder twin
(``operators/gif.py``) and its ``decode_media`` integration. GIF is
lossless, so every round trip asserts BIT-EXACT equality.

Reference anchor: ``HFDatasetManager.py:202-215`` (arbitrary HF dataset
columns, image features included, via load_dataset -> to_pandas;
PNG/JPEG/GIF now decode without Pillow).
"""

from __future__ import annotations

import numpy as np
import pytest

from mlentory_etl_pipeline_spark.operators import gif, multimodal


def test_roundtrip_exact_across_palette_sizes():
    rng = np.random.default_rng(3)
    for ncol, (w, h) in ((2, (7, 3)), (4, (13, 9)), (16, (40, 25)), (256, (64, 48))):
        pal = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
        img = rng.integers(0, ncol, size=(h, w)).astype(np.uint8)
        frames, pals, _d, dw, dh = gif.decode_gif(
            gif.gif_encode([img], pal, w, h)
        )
        assert (dw, dh) == (w, h)
        assert np.array_equal(frames[0], img)
        assert np.array_equal(pals[0][:ncol], pal)


def test_interlaced_roundtrip_exact():
    rng = np.random.default_rng(5)
    for w, h in ((23, 17), (8, 1), (5, 11), (16, 16)):
        img = rng.integers(0, 16, size=(h, w)).astype(np.uint8)
        pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
        frames, _, _, _, _ = gif.decode_gif(
            gif.gif_encode([img], pal, w, h, interlace=True)
        )
        assert np.array_equal(frames[0], img), (w, h)


def test_multiframe_and_delays():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    fs = [rng.integers(0, 8, size=(10, 12)).astype(np.uint8) for _ in range(3)]
    frames, _, delays, _, _ = gif.decode_gif(
        gif.gif_encode(fs, pal, 12, 10, delays_ms=[40, 80, 120])
    )
    assert len(frames) == 3
    assert delays == [40, 80, 120]
    for got, want in zip(frames, fs):
        assert np.array_equal(got, want)


def test_lzw_dictionary_cap_reset():
    """A large noisy 256-color image forces the LZW dictionary past
    4096 entries: the encoder must emit CLEAR at the cap and the
    decoder must resynchronize — still bit-exact."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(200, 300)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    frames, _, _, _, _ = gif.decode_gif(gif.gif_encode([img], pal, 300, 200))
    assert np.array_equal(frames[0], img)


def test_lzw_kwkwk_case():
    """aaaa... is THE classic KwKwK stream (code == table size when
    received); a run image exercises it densely."""
    img = np.zeros((16, 16), dtype=np.uint8)
    pal = np.array([[10, 20, 30], [0, 0, 0]], dtype=np.uint8)
    frames, _, _, _, _ = gif.decode_gif(gif.gif_encode([img], pal, 16, 16))
    assert np.array_equal(frames[0], img)


def test_transparency_composition():
    """Frame 2's transparent pixels must leave frame 1's pixels
    visible in the composed screen."""
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f1 = np.full((4, 4), 0, dtype=np.uint8)
    f2 = np.full((4, 4), 2, dtype=np.uint8)
    f2[0, 0] = 1  # index 1 will be declared transparent
    enc = gif.gif_encode([f1, f2], pal, 4, 4, transparent=1)
    frames, _, _, _, _ = gif.decode_gif(enc)
    assert np.array_equal(frames[0], f1)
    want = f2.copy()
    want[0, 0] = f1[0, 0]  # transparent pixel shows the prior frame
    assert np.array_equal(frames[1], want)


def test_luma_matches_palette_model():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(20, 30)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    lum = gif.decode_gif_luma(gif.gif_encode([img], pal, 30, 20))
    rgb = pal[img].astype(np.int64)
    want = (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    assert np.array_equal(lum, want)


def test_corrupt_and_unsupported_taxonomy():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 16, size=(8, 8)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    good = gif.gif_encode([img], pal, 8, 8)
    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError):
        gif.decode_gif(good[: len(good) // 2])  # truncated
    # disposal 3 (restore to previous): capability gap taxonomy
    bad = bytearray(good)
    i = bad.index(bytes([0x21, 0xF9, 4]))
    bad[i + 3] = 3 << 2
    with pytest.raises(NotImplementedError, match="real media decode"):
        gif.decode_gif(bytes(bad))
    # pixel index outside the color table: corrupt, not a gap. Built
    # by hand: a 4-entry global table but LZW data (min code size 3,
    # so literals up to 7 exist) carrying index 5.
    import struct as _struct

    lzw = gif._lzw_encode(3, bytes([5, 0, 1, 2]))
    raw = (
        b"GIF89a"
        + _struct.pack("<HH", 2, 2)
        + bytes([0x81, 0, 0])  # GCT present, 2<<1 = 4 entries
        + bytes(12)
        + b"\x2c"
        + _struct.pack("<HHHH", 0, 0, 2, 2)
        + b"\x00"
        + bytes([3, len(lzw)])
        + lzw
        + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="outside color table"):
        gif.decode_gif(raw)


def test_decode_video_frames_real_gif(spark):
    """Animated GIF through decode_video_frames: samples at every_ms
    map to the frame whose display interval covers the timestamp, and
    per-frame features equal the first-principles luma means."""
    rng = np.random.default_rng(29)
    pal = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8) * 17
    fs = [rng.integers(0, 16, size=(8, 8)).astype(np.uint8) for _ in range(3)]
    enc = gif.gif_encode(fs, pal, 8, 8, delays_ms=[100, 200, 100])
    media = spark.createDataFrame(
        [(7, "video", enc, "gif", 8, 8, 400)], multimodal.MEDIA_SCHEMA
    )
    rows = sorted(
        multimodal.decode_video_frames(media, every_ms=100, feature_dim=4)
        .collect(),
        key=lambda r: r.frame_ts_ms,
    )
    # intervals: f0 [0,100), f1 [100,300), f2 [300,400) -> samples at
    # 0,100,200,300 hit frames 0,1,1,2
    assert [(r.frame_ts_ms, r.frame_index) for r in rows] == [
        (0, 0), (100, 1), (200, 1), (300, 2),
    ]
    for r in rows:
        rgb = pal[fs[r.frame_index]].astype(np.int64)
        lum = (
            (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
        ).reshape(-1) / 255.0
        want = [float(s.mean()) for s in np.array_split(lum, 4)]
        assert all(
            abs(float(a) - b) < 1e-6 for a, b in zip(r.features, want)
        )
    # all-zero delays: a single sample of the FINAL frame (the one a
    # renderer leaves on screen after instantaneous flips)
    enc0 = gif.gif_encode(fs, pal, 8, 8)
    media0 = spark.createDataFrame(
        [(8, "video", enc0, "gif", 8, 8, None)], multimodal.MEDIA_SCHEMA
    )
    rows0 = multimodal.decode_video_frames(media0, every_ms=100).collect()
    assert [(r.frame_ts_ms, r.frame_index) for r in rows0] == [(0, 2)]
    # non-GIF video: capability gap taxonomy
    import pytest

    mediam = spark.createDataFrame(
        [(9, "video", b"\x00\x00\x00 ftypmp42", "mp4", 8, 8, 1000)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        multimodal.decode_video_frames(mediam).collect()
    assert "real media decode" in str(exc.value)


def test_decode_media_real_gif(spark):
    """Real GIF bytes through the Arrow-batched decode_media path:
    lossless decode means the features equal the first-principles
    segment means of the palette-mapped luminance exactly."""
    rng = np.random.default_rng(19)
    img = rng.integers(0, 64, size=(24, 32)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(64, 3)).astype(np.uint8)
    enc = gif.gif_encode([img], pal, 32, 24)
    media = spark.createDataFrame(
        [(0, "image", enc, "gif", 32, 24, None)], multimodal.MEDIA_SCHEMA
    )
    [got] = multimodal.decode_media(media, fake=False, feature_dim=6).collect()
    rgb = pal[img].astype(np.int64)
    lum = (
        (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    ).reshape(-1) / 255.0
    want = [float(s.mean()) for s in np.array_split(lum, 6)]
    assert all(abs(float(a) - b) < 1e-6 for a, b in zip(got.features, want))


def test_bg_index_out_of_range_substituted():
    """ADVICE r7: a logical-screen bg_index past the global color table
    (real-world files do this) must not leave out-of-range indices on
    the composed screen — decode substitutes 0 and luma lookup works."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 4, size=(4, 4)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(4, 3)).astype(np.uint8)
    raw = bytearray(gif.gif_encode([img], pal, 4, 4))
    # grow the logical screen to 8x8 (the 4x4 frame now covers a
    # quarter of it) and point bg_index far past the 4-entry table
    raw[6:10] = np.array([8, 0, 8, 0], dtype=np.uint8).tobytes()
    raw[11] = 200
    frames, pals, _d, w, h = gif.decode_gif(bytes(raw))
    assert (w, h) == (8, 8)
    assert np.array_equal(frames[0][:4, :4], img)
    # uncovered screen area got the substituted index 0, in-range
    assert int(frames[0][4:, :].max()) < pals[0].shape[0]
    gif.decode_gif_luma(bytes(raw))  # must not raise


def test_decode_video_frames_rejects_nonpositive_stride(spark):
    """ADVICE r7: every_ms <= 0 would never advance the sample clock —
    validated at plan-construction time, before any executor spins."""
    media = spark.createDataFrame([], multimodal.MEDIA_SCHEMA)
    for bad in (0, -100):
        with pytest.raises(ValueError, match="every_ms"):
            multimodal.decode_video_frames(media, every_ms=bad)


def test_decode_video_frames_corrupt_bytes_taxonomy(spark):
    """ADVICE r7: corrupt GIF bytes inside decode_video_frames surface
    as the documented 'media decode failed' ValueError taxonomy (same
    as decode_media), not a raw decoder exception."""
    media = spark.createDataFrame(
        [(1, "video", b"GIF89a\x00\x00", "gif", 8, 8, 100)],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc:
        multimodal.decode_video_frames(media, every_ms=100).collect()
    assert "media decode failed (video/gif)" in str(exc.value)
