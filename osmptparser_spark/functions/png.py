"""Minimal pure-python PNG codec (no imaging wheels needed).

De-stubs the multimodal image path (VERDICT r4 #7): the sandbox has no
PIL/libjpeg, but PNG needs only ``zlib`` (stdlib) plus the five
scanline filters from the PNG spec (RFC 2083 §6), so a real decode is
implementable from the published spec. Supported: 8-bit depth, color
types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced —
a loud ValueError on anything else (16-bit, palette, Adam7), never a
wrong pixel.

The encoder exists so tests can synthesize real PNGs deterministically
(any per-row filter type, to exercise every decode path); it is not a
pipeline operator.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Raises ValueError on anything that is not a PNG this codec fully
    understands — silently-wrong pixels are worse than no decode.
    """
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
            _validate_ihdr(ihdr)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, depth, color, comp, filt, interlace = ihdr
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        out[y] = _unfilter_row(
            filters[y], raw[y, 1:], out[y - 1] if y else None, ch
        )
    return out.reshape(height, width, ch)


def _validate_ihdr(ihdr) -> None:
    _, _, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")


def _unfilter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray | None, ch: int
) -> np.ndarray:
    """One scanline through the PNG filter inverse (spec §6.2-6.6).
    Up/Average/Paeth see a zero row when ``prev`` is None (first row)."""
    cur = row.astype(np.int32)
    up = prev.astype(np.int32) if prev is not None else np.zeros_like(cur)
    if ftype == 0:  # None
        return row.copy()
    if ftype == 2:  # Up
        return ((cur + up) & 0xFF).astype(np.uint8)
    out = np.empty(len(cur), dtype=np.int32)
    if ftype == 1:  # Sub — sequential in x, vectorize over the channel lanes
        for x in range(len(cur)):
            left = out[x - ch] if x >= ch else 0
            out[x] = (cur[x] + left) & 0xFF
    elif ftype == 3:  # Average
        for x in range(len(cur)):
            left = out[x - ch] if x >= ch else 0
            out[x] = (cur[x] + ((left + up[x]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for x in range(len(cur)):
            left = out[x - ch] if x >= ch else 0
            diag = up[x - ch] if x >= ch else 0
            out[x] = (cur[x] + _paeth(left, int(up[x]), diag)) & 0xFF
    else:
        raise ValueError(f"invalid PNG filter type {ftype}")
    return out.astype(np.uint8)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §6.6): nearest of left/up/up-left to
    a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, channels) uint8 -> PNG bytes, every row filtered
    with ``filter_type`` (0-4; non-zero types exist to exercise the
    decoder's inverse paths in tests)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        else:
            enc = np.empty(w * ch, dtype=np.int32)
            for x in range(w * ch):
                left = cur[x - ch] if x >= ch else 0
                diag = prev[x - ch] if x >= ch else 0
                if filter_type == 1:
                    pred = left
                elif filter_type == 3:
                    pred = (left + prev[x]) >> 1
                elif filter_type == 4:
                    pred = _paeth(left, int(prev[x]), int(diag))
                else:
                    raise ValueError(f"invalid filter type {filter_type}")
                enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_decode(payload: bytes):
    """Decoder hook for ``decode_image_features``: PNG bytes ->
    (height, width, float32 grayscale grid) — channel mean, matching
    the hook contract of ``multimodal.fake_decode``."""
    img = decode_png(payload)
    return img.shape[0], img.shape[1], img.mean(axis=2).astype(np.float32)
