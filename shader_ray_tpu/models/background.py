"""Background / environment image loading.

Equivalent of the reference background pipeline (ray.cpp:330-344,
1002-1075): the background spec accepts

* ``"r, g, b"`` floats -> 1x1 constant image (ray.cpp:1004-1008);
* ``grid``             -> procedural 2048x1024 white-on-black grid,
                          8-px tiles (ray.cpp:1009-1029);
* ``rrggbb`` hex       -> 1x1 constant (ray.cpp:1030-1034);
* a file path          -> HDR (Radiance .hdr RGBE, read natively here —
                          the reference used FreeImagePlus) or LDR
                          (PNG/JPEG via PIL when available; converted
                          to float/255 WITHOUT gamma linearization,
                          matching the reference's LDR path,
                          ray.cpp:1056-1067).

Also builds the mip pyramid the GL driver produced with
glGenerateMipmap (ray.cpp:509) — needed for textureGrad-equivalent
sampling (raytracer.es.fs:146).
"""

from __future__ import annotations

import os
import re

import numpy as np

_FLOAT_SPEC = re.compile(
    r"^\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)\s*$"
)
_HEX_SPEC = re.compile(r"^([0-9a-fA-F]{2})([0-9a-fA-F]{2})([0-9a-fA-F]{2})$")


def constant_image(r: float, g: float, b: float) -> np.ndarray:
    return np.array([[[r, g, b]]], dtype=np.float32)


def grid_image(width: int = 2048, tilesize: int = 8, barsize: int = 1) -> np.ndarray:
    """Procedural white-on-black grid (ray.cpp:1009-1029)."""
    height = width // 2
    i = np.arange(width)[None, :]
    j = np.arange(height)[:, None]
    grid = ((i % tilesize) < barsize) | ((j % tilesize) < barsize)
    img = np.zeros((height, width, 3), dtype=np.float32)
    img[grid] = 1.0
    return img


def read_hdr(path: str) -> np.ndarray:
    """Radiance RGBE (.hdr) reader -> (H, W, 3) float32, scanline 0 first.

    Supports the common -Y H +X W orientation with both RLE and flat
    scanlines.  (The reference delegated to FreeImagePlus FIT_RGBF,
    ray.cpp:1048-1054.)
    """
    from shader_ray_tpu.config import get_config

    if get_config().use_native != "never":
        from shader_ray_tpu import native

        img = native.read_hdr_file(path)
        if img is not None:
            return img

    with open(path, "rb") as f:
        data = f.read()

    # header
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    pos = 0
    lines = []
    while True:
        nl = data.index(b"\n", pos)
        line = data[pos:nl]
        pos = nl + 1
        if line == b"":
            break
        lines.append(line)
    # resolution string
    nl = data.index(b"\n", pos)
    res = data[pos:nl].decode("ascii").split()
    pos = nl + 1
    if len(res) != 4 or res[0] != "-Y" or res[2] != "+X":
        raise ValueError(f"{path}: unsupported HDR orientation {' '.join(res)}")
    height = int(res[1])
    width = int(res[3])

    rgbe = np.zeros((height, width, 4), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    p = pos
    for y in range(height):
        if (
            width >= 8
            and width < 32768
            and p + 4 <= len(buf)
            and buf[p] == 2
            and buf[p + 1] == 2
            and ((int(buf[p + 2]) << 8) | int(buf[p + 3])) == width
        ):
            # adaptive RLE scanline: 4 component planes
            p += 4
            for c in range(4):
                x = 0
                while x < width:
                    code = int(buf[p]); p += 1
                    if code > 128:  # run
                        run = code - 128
                        rgbe[y, x : x + run, c] = buf[p]
                        p += 1
                        x += run
                    else:  # literal
                        rgbe[y, x : x + code, c] = buf[p : p + code]
                        p += code
                        x += code
        else:
            # flat scanline (possibly old-style RLE, not handled)
            flat = buf[p : p + width * 4].reshape(width, 4)
            if flat.shape[0] < width:
                raise ValueError(f"{path}: truncated HDR scanline")
            rgbe[y] = flat
            p += width * 4

    mant = rgbe[..., :3].astype(np.float32)
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.ldexp(1.0, exp - 136).astype(np.float32)  # 2^(e-128-8)
    img = mant * scale[..., None]
    img[exp == 0] = 0.0
    return img.astype(np.float32)


def load_background(spec: str) -> np.ndarray:
    """Parse a background spec into an (H, W, 3) float32 lat-long image.

    Row 0 is the image's top scanline (v=1 end of the lat-long map at
    sampling time handles orientation; see ops.envmap).
    """
    m = _FLOAT_SPEC.match(spec)
    if m:
        return constant_image(float(m.group(1)), float(m.group(2)), float(m.group(3)))
    if spec == "grid":
        return grid_image()
    m = _HEX_SPEC.match(spec)
    if m:
        return constant_image(
            int(m.group(1), 16) / 255.0,
            int(m.group(2), 16) / 255.0,
            int(m.group(3), 16) / 255.0,
        )
    if not os.path.exists(spec):
        raise FileNotFoundError(f"Failed to load image from {spec}")
    ext = spec.rsplit(".", 1)[-1].lower()
    if ext == "hdr":
        return read_hdr(spec)
    if ext in ("ppm", "pnm"):
        from shader_ray_tpu.utils.ppm import read_ppm

        return read_ppm(spec).astype(np.float32) / 255.0
    if ext == "npy":
        return np.load(spec).astype(np.float32)
    # native LDR readers (no PIL needed): PNG/BMP/TGA, float/255
    # WITHOUT gamma linearization like the reference's FreeImagePlus
    # FIT_BITMAP path (ray.cpp:1056-1067).  On an unsupported variant
    # (16-bit, interlaced, compressed BMP...) fall through to PIL.
    native_err = None
    try:
        if ext == "png":
            from shader_ray_tpu.utils.png import decode_png

            with open(spec, "rb") as f:
                return decode_png(f.read()).astype(np.float32) / 255.0
        if ext in ("bmp", "dib"):
            from shader_ray_tpu.models.ldr import read_bmp

            return read_bmp(spec).astype(np.float32) / 255.0
        if ext in ("tga", "icb", "vda", "vst"):
            from shader_ray_tpu.models.ldr import read_tga

            return read_tga(spec).astype(np.float32) / 255.0
        if ext in ("jpg", "jpeg", "jfif"):
            # baseline sequential only (covers the reference's own
            # golden assets, ray.cpp:1035-1074); progressive falls
            # through to PIL
            from shader_ray_tpu.utils.jpeg import read_jpeg

            return read_jpeg(spec).astype(np.float32) / 255.0
    except (ValueError, AssertionError) as e:
        native_err = e
    try:
        from PIL import Image  # type: ignore

        img = np.asarray(Image.open(spec).convert("RGB"), dtype=np.float32) / 255.0
        # LDR path does NOT linearize gamma (reference ray.cpp:1056-1067)
        return img
    except ImportError as e:
        raise ValueError(
            f"Unhandled image type for {spec} (PIL unavailable; "
            "use .hdr/.png/.bmp/.tga/.ppm/.npy)"
            + (f"; native reader said: {native_err}" if native_err else "")
        ) from e


def build_mip_pyramid(img: np.ndarray, max_levels: int | None = None) -> list[np.ndarray]:
    """Box-filter mip chain down to 1x1 (GL glGenerateMipmap analog,
    ray.cpp:509).  Non-power-of-two dims are truncated per level like
    GL (floor halving); odd trailing rows/cols are dropped."""
    levels = [np.ascontiguousarray(img, dtype=np.float32)]
    cur = levels[0]
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        h = max(1, cur.shape[0] // 2)
        w = max(1, cur.shape[1] // 2)
        src = cur[: h * 2 if cur.shape[0] > 1 else 1, : w * 2 if cur.shape[1] > 1 else 1]
        if cur.shape[0] > 1 and cur.shape[1] > 1:
            nxt = src.reshape(h, 2, w, 2, 3).mean(axis=(1, 3))
        elif cur.shape[0] > 1:
            nxt = src.reshape(h, 2, 1, 3).mean(axis=1)
        else:
            nxt = src.reshape(1, w, 2, 3).mean(axis=2)
        cur = np.ascontiguousarray(nxt, dtype=np.float32)
        levels.append(cur)
        if max_levels is not None and len(levels) >= max_levels:
            break
    return levels


def pack_mip_atlas(levels: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Pack a mip chain into one (rows, W, 3) atlas, levels stacked
    vertically, plus a (L, 3) int32 table of (row_offset, height, width).
    Keeps the env texture a single static-shaped device array."""
    W = levels[0].shape[1]
    total_rows = sum(lv.shape[0] for lv in levels)
    atlas = np.zeros((total_rows, W, 3), dtype=np.float32)
    table = np.zeros((len(levels), 3), dtype=np.int32)
    row = 0
    for i, lv in enumerate(levels):
        h, w = lv.shape[0], lv.shape[1]
        atlas[row : row + h, :w] = lv
        table[i] = (row, h, w)
        row += h
    return atlas, table
