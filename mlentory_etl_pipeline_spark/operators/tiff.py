"""Baseline TIFF decoder + encoder twin — stdlib + numpy.

Fifth stdlib image path (PNG, JPEG, GIF, BMP; reference anchor
``HFDatasetManager.py:202-215`` — arbitrary HF dataset columns via
``load_dataset(...).to_pandas()``, no codec in the reference itself). TIFF carries most scientific /
satellite / medical raster data; the baseline uncompressed profile
below covers the bulk of what ML corpora ship. Lossless, so the
encoder twin gives bit-exact round-trip oracles.

Scope (TIFF 6.0 baseline):

- classic TIFF in BOTH byte orders (``II`` little / ``MM`` big);
- a single image (first IFD; multi-page files decode page 0);
- Compression 1 (none) and 32773 (PackBits RLE);
- PhotometricInterpretation 0/1 (grayscale, MinIsWhite inverted),
  2 (RGB, optional extra samples ignored), 3 (palette via ColorMap);
- BitsPerSample 8 (all modes) and 16 (grayscale, scaled to 8 for the
  luma contract); strips via StripOffsets/StripByteCounts (RowsPerStrip
  defaulting to the full image); PlanarConfiguration 1 (chunky).

BigTIFF, tiles, planar=2, other compressions (LZW, Deflate, JPEG) and
sample layouts raise ``NotImplementedError`` — the capability-gap
taxonomy; malformed structures raise ``ValueError``.
"""

from __future__ import annotations

import struct

import numpy as np

_LUMA = (299, 587, 114)

# tag ids
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_COLORMAP = 320

# field type -> (struct code, size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 6: ("b", 1), 8: ("h", 2), 9: ("i", 4)}


def _read_ifd(content: bytes, bo: str):
    """Parse the first IFD into {tag: [values]}."""
    (ifd_off,) = struct.unpack(bo + "I", content[4:8])
    if ifd_off + 2 > len(content):
        raise ValueError("TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack(bo + "H", content[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(content):
            raise ValueError("TIFF: truncated IFD entry")
        tag, ftype = struct.unpack(bo + "HH", content[e : e + 4])
        (count,) = struct.unpack(bo + "I", content[e + 4 : e + 8])
        if ftype not in _TYPES:
            continue  # RATIONAL / ASCII etc. — not needed for rasters
        code, size = _TYPES[ftype]
        total = size * count
        if total <= 4:
            raw = content[e + 8 : e + 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", content[e + 8 : e + 12])
            raw = content[off : off + total]
        if len(raw) != total:
            raise ValueError("TIFF: truncated tag value")
        tags[tag] = list(struct.unpack(bo + code * count, raw))
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE) decompression."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            if i + b + 1 > n:
                raise ValueError("TIFF: truncated PackBits literal")
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                raise ValueError("TIFF: truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF: PackBits output shorter than strip")
    return bytes(out[:expected])


def decode_tiff(content: bytes):
    """Decode the first page. Returns ``(rgb, width, height)`` with
    ``rgb`` a (height, width, 3) uint8 array (16-bit grayscale is
    scaled to 8 bits)."""
    if len(content) < 8:
        raise ValueError("not a TIFF: too short")
    if content[:2] == b"II":
        bo = "<"
    elif content[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(bo + "H", content[2:4])
    if magic == 43:
        raise NotImplementedError("real media decode: BigTIFF unsupported")
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    tags = _read_ifd(content, bo)
    if 322 in tags or 323 in tags:
        raise NotImplementedError("real media decode: tiled TIFF unsupported")
    try:
        width = tags[_T_WIDTH][0]
        height = tags[_T_HEIGHT][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
        photometric = tags[_T_PHOTOMETRIC][0]
    except KeyError as e:
        raise ValueError(f"TIFF: missing required tag {e}") from e
    if not width or not height or width < 0 or height < 0:
        raise ValueError("TIFF: invalid dimensions")
    bits = tags.get(_T_BITS, [8])
    spp = tags.get(_T_SAMPLES_PER_PIXEL, [1])[0]
    compression = tags.get(_T_COMPRESSION, [1])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [height])[0] or height
    if planar != 1:
        raise NotImplementedError(
            "real media decode: TIFF planar configuration 2 unsupported"
        )
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"real media decode: TIFF compression {compression} unsupported"
        )
    if len(set(bits)) != 1:
        raise NotImplementedError(
            "real media decode: heterogeneous TIFF BitsPerSample unsupported"
        )
    depth = bits[0]
    if photometric in (0, 1):
        if spp < 1 or depth not in (8, 16):
            raise NotImplementedError(
                f"real media decode: TIFF gray {depth}-bit x{spp} unsupported"
            )
    elif photometric == 2:
        if depth != 8 or spp < 3:
            raise NotImplementedError(
                f"real media decode: TIFF RGB {depth}-bit x{spp} unsupported"
            )
    elif photometric == 3:
        if depth != 8 or spp != 1:
            raise NotImplementedError(
                "real media decode: TIFF palette beyond 8-bit unsupported"
            )
        if _T_COLORMAP not in tags:
            raise ValueError("TIFF: palette image without ColorMap")
    else:
        raise NotImplementedError(
            f"real media decode: TIFF photometric {photometric} unsupported"
        )
    if len(offsets) != len(counts):
        raise ValueError("TIFF: strip offsets/counts length mismatch")
    row_bytes = width * spp * (depth // 8)
    data = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        strip = content[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("TIFF: truncated strip")
        rows = min(rows_per_strip, remaining_rows)
        want = rows * row_bytes
        if compression == 32773:
            strip = _unpackbits(strip, want)
        elif len(strip) < want:
            raise ValueError("TIFF: strip shorter than expected")
        data += strip[:want]
        remaining_rows -= rows
    if remaining_rows > 0:
        raise ValueError("TIFF: strips cover fewer rows than ImageLength")
    if depth == 16:
        arr = np.frombuffer(
            bytes(data), dtype=np.dtype(bo + "u2")
        ).reshape(height, width, spp)
        gray = (arr[:, :, 0] >> 8).astype(np.uint8)
        if photometric == 0:  # MinIsWhite
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2), width, height
    arr = np.frombuffer(bytes(data), dtype=np.uint8).reshape(
        height, width, spp
    )
    if photometric == 2:
        return np.ascontiguousarray(arr[:, :, :3]), width, height
    if photometric == 3:
        cmap = tags[_T_COLORMAP]
        if len(cmap) % 3:
            raise ValueError("TIFF: malformed ColorMap")
        n = len(cmap) // 3
        # ColorMap is 16-bit per channel, all reds then greens then blues
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, n).T >> 8
        ).astype(np.uint8)
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF: pixel index outside ColorMap")
        return pal[idx], width, height
    gray = arr[:, :, 0]
    if photometric == 0:
        gray = 255 - gray
    return np.repeat(gray[:, :, None], 3, axis=2), width, height


def decode_tiff_luma(content: bytes) -> np.ndarray:
    rgb, _w, _h = decode_tiff(content)
    r = rgb.astype(np.int64)
    return (r[..., 0] * _LUMA[0] + r[..., 1] * _LUMA[1] + r[..., 2] * _LUMA[2]) // 1000


def _packbits(data: bytes) -> bytes:
    """PackBits encoder (per row, as the spec recommends)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal run until the next repeat of length >= 3
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def tiff_encode(
    pixels: bytes,
    width: int,
    height: int,
    mode: str = "rgb",
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Baseline TIFF encoder — the lossless test twin. ``mode``:
    ``rgb`` (RGB triples), ``gray`` (single bytes), ``gray16``
    (big/little per byte order, 2 bytes per pixel)."""
    bo = ">" if big_endian else "<"
    spp = {"rgb": 3, "gray": 1, "gray16": 1}[mode]
    depth = 16 if mode == "gray16" else 8
    row_bytes = width * spp * (depth // 8)
    if len(pixels) != row_bytes * height:
        raise ValueError("pixels length mismatch")
    rows_per_strip = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rows_per_strip):
        rows = min(rows_per_strip, height - y0)
        chunk = pixels[y0 * row_bytes : (y0 + rows) * row_bytes]
        strips.append(_packbits(chunk) if packbits else chunk)
    photometric = 2 if mode == "rgb" else 1
    entries = [
        (_T_WIDTH, 4, [width]),
        (_T_HEIGHT, 4, [height]),
        (_T_BITS, 3, [depth] * spp),
        (_T_COMPRESSION, 3, [32773 if packbits else 1]),
        (_T_PHOTOMETRIC, 3, [photometric]),
        (_T_SAMPLES_PER_PIXEL, 3, [spp]),
        (_T_ROWS_PER_STRIP, 4, [rows_per_strip]),
    ]
    # layout: header(8) + IFD + out-of-line tag data + strips
    n_entries = len(entries) + 2  # + StripOffsets, StripByteCounts
    ifd_size = 2 + 12 * n_entries + 4
    pos = 8 + ifd_size  # next free offset for out-of-line data
    overflow = bytearray()

    def place(ftype, values):
        nonlocal pos
        code, size = _TYPES[ftype]
        raw = struct.pack(bo + code * len(values), *values)
        if len(raw) <= 4:
            return raw + bytes(4 - len(raw)), None
        off = pos
        overflow.extend(raw)
        pos += len(raw)
        return struct.pack(bo + "I", off), off

    packed = []
    for tag, ftype, values in entries:
        val4, _ = place(ftype, values)
        packed.append((tag, ftype, len(values), val4))
    # strip tables (counts then offsets — offsets need final positions)
    counts = [len(s) for s in strips]
    val4, _ = place(4, counts)
    packed.append((_T_STRIP_COUNTS, 4, len(counts), val4))
    strip_base = pos
    offsets = []
    acc = strip_base
    for c in counts:
        offsets.append(acc)
        acc += c
    val4, _ = place(4, offsets)
    # placing the offsets list itself may move data: recompute if it
    # went out-of-line (it occupies space BEFORE the strips)
    if len(offsets) > 1:
        shift = pos - strip_base
        offsets = [o + shift for o in offsets]
        raw = struct.pack(bo + "I" * len(offsets), *offsets)
        overflow[-len(raw):] = raw
    packed.append((_T_STRIP_OFFSETS, 4, len(offsets), val4))
    packed.sort(key=lambda t: t[0])  # IFD entries must be tag-ordered
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 8)
    out += struct.pack(bo + "H", n_entries)
    for tag, ftype, count, val4 in packed:
        out += struct.pack(bo + "HHI", tag, ftype, count) + val4
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
