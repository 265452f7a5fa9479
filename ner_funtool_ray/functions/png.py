"""Pure-python PNG codec (stdlib ``zlib`` + ``struct`` only).

Closes the "real image codec" gap for the multimodal stages
(``stages/multimodal.py``): the container has no PIL, but PNG's spec is
public and small enough to implement exactly — signature, chunk framing
with CRC-32 verification, zlib-inflated scanlines, and the five filter
types (None/Sub/Up/Average/Paeth) from the PNG specification §9
(W3C PNG, RFC 2083).  ``decode_png`` returns a numpy array; ``encode_png``
emits bit-exact-reparseable bytes for 8-bit grayscale / RGB / RGBA.

Scope (documented, loud failures outside it): 8-bit depth, color types
0 (gray), 2 (RGB), 6 (RGBA); no interlace, no palette, no 16-bit.  That
covers the sensible training-data payload formats; anything else raises
``ValueError`` with the offending field named.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (supported subset)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w) gray / (h, w, 3) RGB /
    (h, w, 4) RGBA.  Verifies the signature and every chunk CRC."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, …) are skipped after CRC check
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color} (0/2/6 only)")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_off + 1
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — sequential within the row, loop over pixels
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up — fully vectorizable
            line += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        out[y] = line
        prev = out[y]
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray, *, level: int = 6, filter_type: int = 0) -> bytes:
    """uint8 array (h,w) / (h,w,3) / (h,w,4) → PNG bytes.

    ``filter_type`` applies one filter to every row (0=None default;
    1=Sub, 2=Up supported — useful for testing the decoder's unfilter
    paths against an independent construction)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, ch = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color, ch = 6, 4
        flat = img
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    h, w = img.shape[:2]
    stride = w * ch
    rows = flat.reshape(h, stride)
    scan = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = rows[y]
        if filter_type == 0:
            scan.append(0)
            scan.extend(line.tobytes())
        elif filter_type == 1:
            shifted = np.zeros(stride, dtype=np.uint8)
            shifted[ch:] = line[:-ch]
            scan.append(1)
            scan.extend((line - shifted).tobytes())
        elif filter_type == 2:
            scan.append(2)
            scan.extend((line - prev).tobytes())
        else:
            raise ValueError(f"encode filter {filter_type} not supported")
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(bytes(scan), level)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
