"""Minimal dependency-free PNG encode/decode for the web live viewer.

The reference displays frames in a GLFW window (ray.cpp:964-984); the
web viewer (app/webview.py) streams them to a browser instead, and
browsers do not render PPM — so frames go out as 8-bit RGB PNG.  Only
what the viewer needs is implemented: truecolor 8-bit, filter 0
(None) rows, one IDAT chunk.  ``decode_png`` understands exactly what
``encode_png`` emits (plus filters 1/2 for robustness) and exists for
round-trip tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 1) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (filter 0, one IDAT).

    ``level`` trades compression for speed; the live viewer favors
    latency (level 1: a typical 1024x768 render encodes in ~40 ms,
    ~20 of which is the u8 quantize + row assembly).  Float
    frames quantize exactly like ppm.write_ppm (clip to [0,1],
    round-half-up to u8), so the live view matches screenshots."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    img = np.ascontiguousarray(img, dtype=np.uint8)
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # filter byte 0 prepended per row, then one flat buffer
    rows = np.empty((h, 1 + w * 3), np.uint8)
    rows[:, 0] = 0
    rows[:, 1:] = img.reshape(h, w * 3)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8.  Supports 8-bit RGB with row
    filters 0 (None), 1 (Sub), 2 (Up) — everything our encoder and
    common screenshot tools emit for synthetic frames."""
    assert data[:8] == _SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            assert (depth, ctype, comp, filt, inter) == (8, 2, 0, 0, 0), (
                "decode_png handles 8-bit RGB non-interlaced only"
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    assert len(raw) == h * stride, (len(raw), h, stride)
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    out = np.zeros((h, w * 3), np.int32)
    prev = np.zeros(w * 3, np.int32)
    for y in range(h):
        f, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub (bpp = 3)
            cur = line.copy()
            for x in range(3, w * 3):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, 3)
