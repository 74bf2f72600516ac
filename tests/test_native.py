"""Native C++ libscene vs. the numpy builder: the two scene-compile
paths must produce bit-identical flattened arrays."""

import numpy as np
import pytest

from shader_ray_tpu import native
from shader_ray_tpu.config import Config
from shader_ray_tpu.models.bvh import make_bvh
from shader_ray_tpu.models.fixtures import bunny_class_scene, uv_sphere
from shader_ray_tpu.models.flatten import flatten_bvh
from shader_ray_tpu.models.triangle_set import TriangleSet

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native libscene unavailable"
)


def _compare(ts: TriangleSet, cfg: Config):
    bvh = make_bvh(ts.tri_boxmin, ts.tri_boxmax, ts.barycenters, cfg)
    flat = flatten_bvh(bvh)
    nflat, norder, nleaves = native.build_flat_bvh(
        ts.tri_boxmin, ts.tri_boxmax, ts.barycenters,
        leaf_max=cfg.bvh_leaf_max, max_depth=cfg.bvh_max_depth,
        ctrav=cfg.sah_ctrav, cisec=cfg.sah_cisec,
    )
    assert nflat.root == flat.root
    assert nleaves == bvh.stats.leaf_count
    np.testing.assert_array_equal(norder, bvh.order)
    np.testing.assert_array_equal(nflat.boxmin, flat.boxmin)
    np.testing.assert_array_equal(nflat.boxmax, flat.boxmax)
    np.testing.assert_array_equal(nflat.start, flat.start)
    np.testing.assert_array_equal(nflat.count, flat.count)
    np.testing.assert_array_equal(nflat.children, flat.children)
    np.testing.assert_array_equal(nflat.axis, flat.axis)
    np.testing.assert_array_equal(nflat.hitmiss, flat.hitmiss)


def test_native_matches_numpy_random(rng):
    pts = rng.normal(size=(500, 3, 3)).astype(np.float32)
    ts = TriangleSet.from_arrays(pts)
    _compare(ts, Config())


def test_native_matches_numpy_sphere():
    pos, _ = uv_sphere(lat=16, lon=24)
    ts = TriangleSet.from_arrays(pos)
    _compare(ts, Config())


def test_native_matches_numpy_clustered(rng):
    """Clustered geometry stresses the large-leaf / one-side paths."""
    centers = rng.normal(size=(20, 1, 1, 3)) * 10.0
    pts = (centers + rng.normal(size=(20, 40, 3, 3)) * 0.1).reshape(-1, 3, 3)
    ts = TriangleSet.from_arrays(pts.astype(np.float32))
    _compare(ts, Config())


def test_native_matches_numpy_degenerate(rng):
    """Identical barycenters (all triangles stacked) force no-split."""
    tri = rng.normal(size=(1, 3, 3)).astype(np.float32)
    pts = np.repeat(tri, 50, axis=0)
    ts = TriangleSet.from_arrays(pts, dedup=False)
    _compare(ts, Config())


def test_native_matches_numpy_knobs():
    pos, _ = uv_sphere(lat=10, lon=14)
    ts = TriangleSet.from_arrays(pos)
    cfg = Config()
    cfg.bvh_leaf_max = 4
    cfg.bvh_max_depth = 6
    cfg.sah_cisec = 2.0
    _compare(ts, cfg)


def test_native_matches_numpy_bunny_class():
    pos, _ = bunny_class_scene(20000)
    ts = TriangleSet.from_arrays(pos)
    _compare(ts, Config())


def test_native_empty_scene():
    ts = TriangleSet.from_arrays(np.zeros((0, 3, 3), np.float32))
    _compare(ts, Config())


# --- native loaders (C4/C5 in C++, reference trisrc-support/obj-support) ---


def _write_obj(path, with_normals):
    lines = ["o thing"]
    verts = [(-0.5, -0.5, 0), (0.5, -0.5, 0), (0.5, 0.5, 0.2), (-0.5, 0.5, 0.2),
             (0.0, 0.0, 1.0)]
    for v in verts:
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    if with_normals:
        for v in verts:
            lines.append("vn 0 0 1")
        lines.append("f 1//1 2//2 3//3 4//4")  # quad -> fan
        lines.append("f 1//1 2//2 5//5")
    else:
        lines.append("f 1 2 3 4")
        lines.append("f 1 2 5")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.skipif(not native.available(), reason="libscene unavailable")
@pytest.mark.parametrize("with_normals", [True, False])
def test_native_obj_parser_matches_python(tmp_path, with_normals):
    from shader_ray_tpu.config import Config, set_config
    from shader_ray_tpu.models.obj import parse_obj, parse_obj_text

    path = str(tmp_path / "t.obj")
    _write_obj(path, with_normals)
    got = parse_obj(path)  # native path (use_native=auto)
    with open(path) as f:
        ref = parse_obj_text(f.read())
    assert got.triangle_count == ref.triangle_count == 3
    gp = got.positions[got.indices]
    rp = ref.positions[ref.indices]
    np.testing.assert_allclose(gp, rp, atol=0)
    gn = got.normals[got.indices]
    rn = ref.normals[ref.indices]
    np.testing.assert_allclose(gn, rn, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="libscene unavailable")
def test_native_trisrc_parser_matches_python(tmp_path, rng):
    from shader_ray_tpu.models.trisrc import (
        parse_trisrc,
        parse_trisrc_text,
        write_trisrc,
    )

    pos = rng.normal(size=(17, 3, 3)).astype(np.float32)
    col = rng.uniform(0.1, 1.0, size=(17, 3, 3)).astype(np.float32)
    path = str(tmp_path / "t.trisrc")
    write_trisrc(path, pos, tri_color=col)

    got = parse_trisrc(path)  # native
    with open(path) as f:
        ref = parse_trisrc_text(f.read())
    assert got.triangle_count == ref.triangle_count == 17
    np.testing.assert_allclose(
        got.positions[got.indices], ref.positions[ref.indices], atol=1e-6
    )
    np.testing.assert_allclose(
        got.normals[got.indices], ref.normals[ref.indices], atol=1e-6
    )
    np.testing.assert_allclose(
        got.colors[got.indices], ref.colors[ref.indices], rtol=1e-5, atol=1e-6
    )


@pytest.mark.skipif(not native.available(), reason="libscene unavailable")
def test_native_trisrc_rejects_garbage(tmp_path):
    from shader_ray_tpu.models.trisrc import parse_trisrc

    path = str(tmp_path / "bad.trisrc")
    with open(path, "w") as f:
        f.write('"*" default 1 1 1 1 10\n1 2 3\n')  # truncated vertex block
    with pytest.raises(ValueError):
        parse_trisrc(path)


@pytest.mark.skipif(not native.available(), reason="libscene unavailable")
def test_obj_negative_indices(tmp_path):
    """OBJ negative indices are relative to elements defined so far;
    both parsers must resolve f -3 -2 -1 to the last three vertices."""
    from shader_ray_tpu.models.obj import parse_obj, parse_obj_text

    text = "v 9 9 9\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
    path = str(tmp_path / "neg.obj")
    with open(path, "w") as f:
        f.write(text)
    got = parse_obj(path)          # native
    ref = parse_obj_text(text)     # python
    expect = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    np.testing.assert_array_equal(ref.positions[ref.indices][0], expect)
    np.testing.assert_array_equal(got.positions[got.indices][0], expect)


@pytest.mark.skipif(not native.available(), reason="libscene unavailable")
def test_native_hdr_reader_matches_python(tmp_path, rng):
    """Native RGBE reader vs the Python fallback on an RLE-written
    round-trip fixture."""
    from shader_ray_tpu.models.background import read_hdr
    from shader_ray_tpu.models.fixtures import procedural_sky
    from shader_ray_tpu.utils.hdr import write_hdr

    img = procedural_sky(64).astype(np.float32)  # (32, 64, 3), HDR sun
    path = str(tmp_path / "sky.hdr")
    write_hdr(path, img)

    got = native.read_hdr_file(path)
    cfg_env = {}
    import shader_ray_tpu.config as C
    old = C.get_config().use_native
    C.get_config().use_native = "never"
    try:
        ref = read_hdr(path)
    finally:
        C.get_config().use_native = old
    np.testing.assert_array_equal(got, ref)
    # RGBE round trip is lossy (shared exponent): ~1% relative
    np.testing.assert_allclose(got, img, rtol=2e-2, atol=2e-3)
