"""Pure-stdlib image codecs: PNG (zlib), PPM (P6), BMP (24-bit) — plus
baseline + progressive JPEG in the sibling ``jpeg`` module (rounds 5-6).

The sandbox has no PIL/libjpeg/libav, but these formats need nothing
beyond ``zlib`` + ``numpy`` — so the engine's image-decode operator is
REAL for them (PNG/PPM/BMP since round 4, JPEG since round 5). The
implementations follow the public format specifications (PNG: RFC 2083
chunk layout + filter reconstruction; BMP: BITMAPINFOHEADER; PPM: netpbm
P6; JPEG: ITU-T T.81 baseline + progressive) and are round-trip tested against
hand-built pixel arrays for every PNG filter type and every JPEG mode.
Video stays honestly gated on libav.

Scale note: these decoders run inside Arrow-batched ``mapInPandas`` — one
Python call per asset. Cost model per PNG filter type: None/Up/Sub rows
reconstruct in vectorized numpy; Average/Paeth rows fall to a per-pixel
Python loop (the recurrence mixes the in-progress row through floor-div /
3-way min — inherently sequential), so real-world PNGs heavy in filters
3/4 decode at Python speed, not numpy speed. A production cluster swaps
in libpng/turbojpeg behind the same sniff+decode interface; the operator
contract (schema, partitioning, per-row error tolerance) is what the
engine defines, and it is identical for both.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type → channel count (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str | None:
    """Container format by magic bytes: 'png' | 'ppm' | 'bmp' | 'jpeg' |
    None (unknown)."""
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → (h, w, channels) uint8. Supports 8-bit depth, color types
    0/2/4/6, non-interlaced — the standard raster cases. Filter
    reconstruction per the spec (None/Sub/Up/Average/Paeth)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, channels, idat = 8, None, None, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, cur = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up — vectorized
            rec = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub — a per-lane prefix sum: rec[x] = cur[x] +
            # rec[x-bpp], i.e. cumsum over each byte lane; (a+b) mod 256
            # distributes over the int64 cumsum, so one numpy pass per lane
            rec = np.empty(stride, dtype=np.int64)
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(cur[lane::bpp], dtype=np.int64)
            rec &= 0xFF
        else:  # Average / Paeth: the recurrence mixes prev-row and the
            # in-progress row through floor-div / a 3-way min — inherently
            # sequential per lane; per-pixel loop (a production swap to
            # libpng replaces exactly this, module docstring)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 3:  # Average
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    rec[x] = (cur[x] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray, filters: list[int] | int = 0) -> bytes:
    """(h, w, channels) uint8 → PNG bytes. ``filters`` picks the per-row
    filter type (one int for all rows, or one per row) — exercising every
    reconstruction path in decode_png is the point; real encoders choose
    per-row minimal-entropy filters the same way."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if isinstance(filters, int):
        filters = [filters] * h
    flat = img.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    raw = bytearray()
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, dtype=np.int32)
        f = filters[y]
        if f == 0:
            enc = cur
        elif f == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = np.zeros(w * ch, dtype=np.int32)
            for x in range(w * ch):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    enc[x] = (cur[x] - a) & 0xFF
                elif f == 3:
                    enc[x] = (cur[x] - (a + b) // 2) & 0xFF
                elif f == 4:
                    enc[x] = (cur[x] - _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# PPM (netpbm P6) and BMP (24-bit uncompressed)
# --------------------------------------------------------------------------


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8 (maxval 255; # comments allowed)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    pos += 1  # single whitespace after maxval
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB (rows are stored
    bottom-up BGR with 4-byte padding)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rows = rows[::-1] if flip else rows
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    assert ch == 3
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = img[:, :, ::-1]
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def decode_any(payload: bytes) -> tuple[str, np.ndarray] | None:
    """Sniff + decode. Returns (format, (h, w, ch) uint8) for the
    pure-Python formats — PNG/PPM/BMP plus baseline/progressive JPEG (jpeg.py, r05-r06) —
    None for unknown/unsupported payloads (the caller decides whether to
    PIL-fall-back, null out, or raise)."""
    kind = sniff(payload)
    try:
        if kind == "png":
            return "png", decode_png(payload)
        if kind == "ppm":
            return "ppm", decode_ppm(payload)
        if kind == "bmp":
            return "bmp", decode_bmp(payload)
        if kind == "jpeg":
            from crawl4ai_llm_spark.multimodal.jpeg import decode_jpeg

            return "jpeg", decode_jpeg(payload)
    except (ValueError, zlib.error, struct.error, IndexError):
        return None  # corrupt container: per-row tolerance, never job-fatal
    return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index arithmetic — the real
    (if basic) resampler for thumbnailing in the media pipeline."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]
