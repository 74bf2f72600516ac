"""Native LDR background readers (BMP / TGA / general baseline PNG) —
the reference loads any FreeImagePlus FIT_BITMAP and converts to
24-bit RGB (ray.cpp:1056-1067); these dependency-free readers cover
the common containers without PIL."""

import struct
import zlib

import numpy as np
import pytest

from shader_ray_tpu.models.background import load_background
from shader_ray_tpu.models.ldr import read_bmp, read_tga
from shader_ray_tpu.utils.png import decode_png, encode_png


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)


# ---------- BMP writers (test-side) ----------

def _bmp24(img, top_down=False):
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    pix = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(pix), 2835, 2835, 0, 0,
    )
    return hdr + dib + pix


def _bmp32(img):
    h, w, _ = img.shape
    px = np.zeros((h, w, 4), np.uint8)
    px[..., :3] = img[..., ::-1]
    px[..., 3] = 255
    pix = px[::-1].tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(pix), 2835, 2835, 0, 0
    )
    return hdr + dib + pix


def _bmp8_palette(idx, pal):
    h, w = idx.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx
    pix = rows[::-1].tobytes()
    pal_bgra = np.zeros((len(pal), 4), np.uint8)
    pal_bgra[:, :3] = pal[:, ::-1]
    off = 54 + len(pal) * 4
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pix), 2835, 2835, len(pal), 0
    )
    return hdr + dib + pal_bgra.tobytes() + pix


def test_bmp24_bottom_up(tmp_path, img):
    p = tmp_path / "a.bmp"
    p.write_bytes(_bmp24(img))
    assert np.array_equal(read_bmp(str(p)), img)


def test_bmp24_top_down(tmp_path, img):
    p = tmp_path / "a.bmp"
    p.write_bytes(_bmp24(img, top_down=True))
    assert np.array_equal(read_bmp(str(p)), img)


def test_bmp32(tmp_path, img):
    p = tmp_path / "a.bmp"
    p.write_bytes(_bmp32(img))
    assert np.array_equal(read_bmp(str(p)), img)


def test_bmp8_palette(tmp_path, rng):
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    p = tmp_path / "a.bmp"
    p.write_bytes(_bmp8_palette(idx, pal))
    assert np.array_equal(read_bmp(str(p)), pal[idx])


# ---------- TGA writers (test-side) ----------

def _tga_header(w, h, img_type, bpp, top_down):
    return struct.pack(
        "<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0, w, h, bpp,
        0x20 if top_down else 0,
    )


def _tga24(img, top_down=True):
    h, w, _ = img.shape
    px = img[..., ::-1]
    if not top_down:
        px = px[::-1]
    return _tga_header(w, h, 2, 24, top_down) + px.tobytes()


def _tga32_rle(img):
    """Type-10 RLE, alternating a run packet and raw packets per row."""
    h, w, _ = img.shape
    out = [_tga_header(w, h, 10, 32, True)]
    for y in range(h):
        row = np.zeros((w, 4), np.uint8)
        row[:, :3] = img[y, :, ::-1]
        row[:, 3] = 255
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 4 and np.array_equal(
                row[x], row[x + run]
            ):
                run += 1
            if run > 1:
                out.append(bytes([0x80 | (run - 1)]) + row[x].tobytes())
                x += run
            else:
                n = min(3, w - x)
                out.append(bytes([n - 1]) + row[x : x + n].tobytes())
                x += n
    return b"".join(out)


def test_tga24_top_down(tmp_path, img):
    p = tmp_path / "a.tga"
    p.write_bytes(_tga24(img, top_down=True))
    assert np.array_equal(read_tga(str(p)), img)


def test_tga24_bottom_up(tmp_path, img):
    p = tmp_path / "a.tga"
    p.write_bytes(_tga24(img, top_down=False))
    assert np.array_equal(read_tga(str(p)), img)


def test_tga32_rle(tmp_path, rng):
    # runs + raws: stripes of repeated pixels mixed with noise
    img = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    img[:, 2:5] = img[:, 2:3]  # make some runs
    p = tmp_path / "a.tga"
    p.write_bytes(_tga32_rle(img))
    assert np.array_equal(read_tga(str(p)), img)


def test_tga_grayscale(tmp_path, rng):
    g = rng.integers(0, 256, size=(5, 8), dtype=np.uint8)
    p = tmp_path / "a.tga"
    p.write_bytes(_tga_header(8, 5, 3, 8, True) + g.tobytes())
    want = np.repeat(g[..., None], 3, axis=2)
    assert np.array_equal(read_tga(str(p)), want)


# ---------- PNG: full baseline decode ----------

def _png_chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _png_with_filters(px, ctype, filters, plte=None):
    """Test-side encoder emitting CHOSEN per-row filter types."""
    h, w, c = px.shape
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        cur = px[y].reshape(w * c).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            res = cur
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            res = (cur - left) & 0xFF
        elif f == 2:
            res = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            res = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
            upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            res = (cur - pred) & 0xFF
        raw.extend(res.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    chunks = [_png_chunk(b"IHDR", ihdr)]
    if plte is not None:
        chunks.append(_png_chunk(b"PLTE", plte.astype(np.uint8).tobytes()))
    chunks.append(_png_chunk(b"IDAT", zlib.compress(bytes(raw))))
    chunks.append(_png_chunk(b"IEND", b""))
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_rgb_all_filters(img, filters):
    got = decode_png(_png_with_filters(img, 2, filters))
    assert np.array_equal(got, img)


def test_png_rgba_drops_alpha(rng):
    px = rng.integers(0, 256, size=(7, 9, 4), dtype=np.uint8)
    got = decode_png(_png_with_filters(px, 6, [4, 2]))
    assert np.array_equal(got, px[..., :3])


def test_png_gray_and_gray_alpha(rng):
    g = rng.integers(0, 256, size=(6, 5, 1), dtype=np.uint8)
    got = decode_png(_png_with_filters(g, 0, [1, 3]))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    ga = rng.integers(0, 256, size=(6, 5, 2), dtype=np.uint8)
    got = decode_png(_png_with_filters(ga, 4, [4]))
    assert np.array_equal(got, np.repeat(ga[..., :1], 3, axis=2))


def test_png_palette(rng):
    plte = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, size=(8, 6, 1), dtype=np.uint8)
    got = decode_png(_png_with_filters(idx, 3, [0, 2], plte=plte))
    assert np.array_equal(got, plte[idx[..., 0]])


def test_png_encoder_roundtrip_still_works(img):
    assert np.array_equal(decode_png(encode_png(img)), img)


# ---------- load_background routing ----------

def test_load_background_ldr_routing(tmp_path, img):
    """Every native LDR container loads as float/255 with NO gamma
    linearization (reference ray.cpp:1056-1067)."""
    want = img.astype(np.float32) / 255.0
    for name, payload in [
        ("a.bmp", _bmp24(img)),
        ("a.tga", _tga24(img)),
        ("a.png", _png_with_filters(img, 2, [0, 1, 2, 3, 4])),
    ]:
        p = tmp_path / name
        p.write_bytes(payload)
        got = load_background(str(p))
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want)
