"""Cross-codec consistency and corrupt-byte robustness for the stdlib
media decoders (PNG / JPEG / GIF / WAV).

Two properties a 100 TB scraped-media pipeline needs from its decode
layer:

1. **Codec-independent features**: the feature contract (601-2 luma ->
   segment means) must not depend on which lossless container carried
   the pixels — PNG and GIF encodings of the same image must produce
   IDENTICAL features.
2. **Total taxonomy under garbage**: any byte-level mutation of a valid
   stream must either decode or raise ValueError /
   NotImplementedError — never hang, never escape with a raw
   IndexError/struct.error/KeyError, never return a wrong-shaped
   result. (At the decode_media level everything non-gap is already
   wrapped as ValueError; these tests pin the DIRECT decoder surface,
   which is what any future caller outside decode_media would hit.)
"""

from __future__ import annotations

import numpy as np

from mlentory_etl_pipeline_spark.operators import gif, jpeg, multimodal

# the exception classes the decoders are ALLOWED to raise on garbage
_TAXONOMY = (ValueError, NotImplementedError)


def _gray_image(w: int, h: int) -> np.ndarray:
    return np.array(
        [[(x * 7 + y * 13) % 256 for x in range(w)] for y in range(h)],
        dtype=np.uint8,
    )


def test_png_and_gif_features_identical_for_same_pixels():
    """Both PNG and GIF are lossless; a grayscale image shipped
    through either container must produce the same luminance features
    bit-for-bit (GIF maps through an identity gray palette, whose
    601-2 luma of (v, v, v) is exactly v)."""
    img = _gray_image(32, 24)
    png_bytes = multimodal.png_encode_gray(img.tobytes(), 32, 24)
    gray_pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    gif_bytes = gif.gif_encode([img], gray_pal, 32, 24)
    f_png = multimodal._decode_png(png_bytes, 8)
    f_gif = multimodal._decode_gif(gif_bytes, 8)
    assert f_png == f_gif
    # and a flat-quantizer JPEG of an even-offset constant-block image
    # is bit-exact too, so all THREE containers agree on that fixture
    blocks = np.zeros((24, 32), dtype=np.uint8)
    for k, (by, bx) in enumerate((b, x) for b in range(3) for x in range(4)):
        blocks[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (k * 22) % 256
    f_png2 = multimodal._decode_png(
        multimodal.png_encode_gray(blocks.tobytes(), 32, 24), 8
    )
    f_jpg2 = multimodal._decode_jpeg(
        jpeg.jpeg_encode_gray(blocks.tobytes(), 32, 24, quant_override=[16] * 64),
        8,
    )
    f_gif2 = multimodal._decode_gif(
        gif.gif_encode([blocks], gray_pal, 32, 24), 8
    )
    assert f_png2 == f_jpg2 == f_gif2


def _assert_mutations_stay_in_taxonomy(valid: bytes, decode, n_trials: int):
    """Flip/zero/truncate bytes of a valid stream; decode must either
    succeed or raise within the taxonomy."""
    rng = np.random.default_rng(len(valid))
    for t in range(n_trials):
        buf = bytearray(valid)
        kind = t % 3
        if kind == 0:  # flip one byte
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= int(rng.integers(1, 256))
        elif kind == 1:  # zero a window
            i = int(rng.integers(0, len(buf)))
            j = min(len(buf), i + int(rng.integers(1, 16)))
            buf[i:j] = bytes(j - i)
        else:  # truncate
            buf = buf[: int(rng.integers(1, len(buf)))]
        try:
            decode(bytes(buf))
        except _TAXONOMY:
            pass
        # any OTHER exception type propagates and fails the test


def test_jpeg_mutation_taxonomy():
    img = _gray_image(24, 16)
    seq = jpeg.jpeg_encode_gray(img.tobytes(), 24, 16, quality=80)
    prog = jpeg.jpeg_encode_gray(img.tobytes(), 24, 16, quality=80, progressive=True)
    jls = jpeg.jpeg_encode_gray_lossless(img.tobytes(), 24, 16, predictor=4)
    _assert_mutations_stay_in_taxonomy(seq, jpeg.decode_jpeg, 120)
    _assert_mutations_stay_in_taxonomy(prog, jpeg.decode_jpeg, 120)
    _assert_mutations_stay_in_taxonomy(jls, jpeg.decode_jpeg, 120)


def test_gif_mutation_taxonomy():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 16, size=(16, 24)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    valid = gif.gif_encode([img], pal, 24, 16)
    _assert_mutations_stay_in_taxonomy(valid, gif.decode_gif, 150)


def test_png_mutation_taxonomy():
    img = _gray_image(24, 16)
    valid = multimodal.png_encode_gray(img.tobytes(), 24, 16, filter_type=4)
    _assert_mutations_stay_in_taxonomy(
        valid, lambda b: multimodal._decode_png(b, 8), 150
    )


def test_wav_mutation_taxonomy():
    valid = multimodal._wav_bytes(3, n_samples=200)
    _assert_mutations_stay_in_taxonomy(
        valid, lambda b: multimodal._decode_wav(b, 8), 150
    )
