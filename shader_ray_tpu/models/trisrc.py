"""trisrc format parser + writer.

Parser for the "trisrc" triangle-soup format consumed by the reference
(trisrc-support.cpp:43-104): repeating records of

    "texture-name" tag  sr sg sb sa shininess
    x y z  nx ny nz  r g b a  u v      (x3 vertices)

Behavior preserved from the reference:
* texture name ``"*"`` means none (:50-53); materials/texcoords are
  parsed but discarded — only position/normal/color are kept (:88);
* shininess in (0, 1) is scaled by 10 (:66-69);
* vertex colors are gamma-decoded by pow(c, 2.63) unless the
  COLORS_ARE_LINEAR env knob is set (:24, :93-97);
* positions are scaled by GEOMETRY_SCALE (:36-39, :92);
* normals are renormalized (:99).

A writer is provided as well (the reference had none) so tests and
benchmarks can generate fixtures without the external scene-data repo.
"""

from __future__ import annotations

import re

import numpy as np

from shader_ray_tpu.config import Config, get_config
from shader_ray_tpu.models.triangle_set import TriangleSet

_QUOTED = re.compile(r'"([^"]*)"')


def parse_trisrc(path: str, config: Config | None = None) -> TriangleSet:
    cfg = config or get_config()
    if cfg.use_native != "never":
        from shader_ray_tpu import native

        parsed = native.parse_trisrc_file(
            path, cfg.geometry_scale, cfg.screen_gamma, cfg.colors_are_linear
        )
        if parsed is not None:
            pos, nrm, col = parsed
            if pos.shape[0] == 0:
                return TriangleSet().finish()
            return TriangleSet.from_arrays(pos, nrm, col)
        if cfg.use_native == "require":
            raise RuntimeError("Config.use_native=require but libscene unavailable")
    with open(path, "r") as f:
        text = f.read()
    return parse_trisrc_text(text, cfg)


def parse_trisrc_text(text: str, config: Config | None = None) -> TriangleSet:
    cfg = config or get_config()

    # Tokenize: quoted strings are single tokens, rest is whitespace-split.
    # (The reference reads with fscanf; this is the same grammar.)
    tokens: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        ch = text[pos]
        if ch.isspace():
            pos += 1
            continue
        if ch == '"':
            m = _QUOTED.match(text, pos)
            if m is None:
                raise ValueError("unterminated quoted texture name in trisrc")
            tokens.append('"' + m.group(1) + '"')
            pos = m.end()
        else:
            end = pos
            while end < n and not text[end].isspace():
                end += 1
            tokens.append(text[pos:end])
            pos = end

    tri_pos = []
    tri_norm = []
    tri_color = []
    i = 0
    ntok = len(tokens)
    # Each record: quoted texture, tag, 5 specular floats, 3 x 12 floats = 43 tokens
    while i < ntok:
        tex = tokens[i]
        if not (tex.startswith('"') and tex.endswith('"')):
            raise ValueError(f"expected quoted texture name, got {tex!r}")
        i += 1
        if i >= ntok:
            raise ValueError("couldn't read tag name")
        _tag = tokens[i]
        i += 1
        if i + 5 > ntok:
            raise ValueError("couldn't read specular properties")
        spec = [float(x) for x in tokens[i : i + 5]]
        i += 5
        shininess = spec[4]
        if 0 < shininess < 1:
            shininess *= 10  # reference trisrc-support.cpp:66-69
        if i + 36 > ntok:
            raise ValueError("couldn't read Vertex")
        vals = np.array([float(x) for x in tokens[i : i + 36]], dtype=np.float64).reshape(3, 12)
        i += 36

        v = vals[:, 0:3] * cfg.geometry_scale
        nrm = vals[:, 3:6]
        c = vals[:, 6:9]
        if not cfg.colors_are_linear:
            c = np.power(np.abs(c), cfg.screen_gamma) * np.sign(c)
        length = np.linalg.norm(nrm, axis=1, keepdims=True)
        nrm = nrm / np.where(length == 0, 1.0, length)
        tri_pos.append(v.astype(np.float32))
        tri_norm.append(nrm.astype(np.float32))
        tri_color.append(c.astype(np.float32))

    T = len(tri_pos)
    if T == 0:
        return TriangleSet().finish()
    return TriangleSet.from_arrays(
        np.stack(tri_pos), np.stack(tri_norm), np.stack(tri_color)
    )


def write_trisrc(
    path: str,
    tri_pos: np.ndarray,
    tri_norm: np.ndarray | None = None,
    tri_color: np.ndarray | None = None,
    specular=(1.0, 1.0, 1.0, 1.0),
    shininess: float = 10.0,
) -> None:
    """Write (T, 3, 3) triangle arrays as a trisrc file.

    Colors are written gamma-ENcoded (pow(c, 1/2.63)) so a round-trip
    through the gamma-decoding parser reproduces the input linear
    colors (inverse of reference trisrc-support.cpp:93-97).
    """
    cfg = get_config()
    tri_pos = np.asarray(tri_pos, dtype=np.float64)
    T = tri_pos.shape[0]
    if tri_norm is None:
        e1 = tri_pos[:, 1] - tri_pos[:, 0]
        e2 = tri_pos[:, 2] - tri_pos[:, 0]
        fn = np.cross(e1, e2)
        fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)
        tri_norm = np.repeat(fn[:, None, :], 3, axis=1)
    if tri_color is None:
        tri_color = np.ones_like(tri_pos)
    enc = np.power(np.clip(tri_color, 0.0, None), 1.0 / cfg.screen_gamma)
    with open(path, "w") as f:
        for t in range(T):
            f.write('"*" default %g %g %g %g %g\n' % (*specular, shininess))
            for j in range(3):
                x, y, z = tri_pos[t, j]
                nx, ny, nz = tri_norm[t, j]
                r, g, b = enc[t, j]
                f.write(
                    f"{x:.9g} {y:.9g} {z:.9g} {nx:.9g} {ny:.9g} {nz:.9g} "
                    f"{r:.9g} {g:.9g} {b:.9g} 1 0 0\n"
                )
