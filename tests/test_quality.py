"""models/quality.py — host packet-walk simulator.

The simulator is a tree-quality PROXY for walk-step/leaf-visit counts,
but its closest-hit RESULTS must be exact: these tests pin them
against a brute-force all-triangles Möller-Trumbore oracle, on both
tree builds (object splits and SBVH), plus the any-hit retirement
semantics the shadow phases rely on.
"""

import dataclasses

import numpy as np
import pytest

from shader_ray_tpu.config import get_config
from shader_ray_tpu.models.fixtures import uv_sphere
from shader_ray_tpu.models.quality import (
    BIG_T,
    MT_EPS,
    _camera_rays,
    build_wide_tree,
    simulate_frame,
    simulate_packet_walk,
)
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.utils import mat4


def _sphere_data(splits="object"):
    pos, _ = uv_sphere(12, 24)
    cfg = dataclasses.replace(get_config(), splits=splits)
    return get_shader_data(make_world(TriangleSet.from_arrays(pos), config=cfg),
                           config=cfg), cfg


def _bench_rays(w=48, h=32):
    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    return _camera_rays(w, h, fov, cam)


def _brute_force(data, P, D):
    tri = np.asarray(data.tri_positions, np.float32)
    v0 = tri[:, None, 0:3]
    e0 = tri[:, None, 3:6] - v0
    e1 = v0 - tri[:, None, 6:9]
    M = np.cross(e1, D[None])
    det = (e0 * M).sum(-1)
    ok = np.abs(det) >= MT_EPS
    inv = 1.0 / np.where(ok, det, 1.0)
    T = P[None] - v0
    Q = np.cross(T, e0)
    d = -(e1 * Q).sum(-1) * inv
    uu = (T * M).sum(-1) * inv
    vv = (D[None] * Q).sum(-1) * inv
    ok &= (d >= 0) & (uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1)
    d = np.where(ok, d, 2 * BIG_T)
    return d.min(axis=0), ok.any(axis=0)


@pytest.mark.parametrize("splits", ["object", "sbvh"])
def test_closest_hit_matches_brute_force(splits):
    data, cfg = _sphere_data(splits)
    wt = build_wide_tree(data, cfg)
    P, D = _bench_rays()
    t, which, u, v, hit = simulate_packet_walk(data, wt, P, D)
    bt, bhit = _brute_force(data, P, D)
    assert (bhit == hit).all()
    assert np.allclose(np.where(hit, t, 0.0), np.where(bhit, bt, 0.0),
                       rtol=1e-5, atol=1e-5)
    # u/v barycentrics of the accepted hit reconstruct the hit point
    tri = np.asarray(data.tri_positions, np.float32)
    w0 = np.maximum(which, 0)
    pt = (
        (1.0 - u - v)[:, None] * tri[w0, 0:3]
        + u[:, None] * tri[w0, 3:6]
        + v[:, None] * tri[w0, 6:9]
    )
    ray_pt = P + t[:, None] * D
    err = np.linalg.norm(np.where(hit[:, None], pt - ray_pt, 0.0), axis=-1)
    assert float(err.max()) < 1e-3


def test_any_hit_retires_lanes():
    data, cfg = _sphere_data()
    wt = build_wide_tree(data, cfg)
    P, D = _bench_rays()
    _, _, _, _, hit_c = simulate_packet_walk(data, wt, P, D)
    _, _, _, _, hit_a = simulate_packet_walk(data, wt, P, D, any_hit=True)
    # any-hit finds occlusion for exactly the lanes closest-hit hits
    assert (hit_a == hit_c).all()


def test_active_mask_respected():
    data, cfg = _sphere_data()
    wt = build_wide_tree(data, cfg)
    P, D = _bench_rays()
    act = np.zeros(P.shape[0], bool)
    act[::3] = True
    _, _, _, _, hit = simulate_packet_walk(data, wt, P, D, active=act)
    assert not hit[~act].any()


def test_frame_phases_and_sbvh_comparable():
    data_o, cfg_o = _sphere_data("object")
    data_s, cfg_s = _sphere_data("sbvh")
    res_o = simulate_frame(data_o, width=48, height=32, tile=512, config=cfg_o)
    res_s = simulate_frame(data_s, width=48, height=32, tile=512, config=cfg_s)
    names = [p.name for p in res_o.phases]
    assert names[:2] == ["bounce0", "shadow0"]
    # both trees see the same geometry: primary-hit work is nonzero and
    # within a sane factor of each other
    b0_o = res_o.phases[0]
    b0_s = res_s.phases[0]
    assert b0_o.leafs > 0 and b0_s.leafs > 0
    assert b0_o.steps > 0 and b0_s.steps > 0
    ratio = b0_s.leafs_per_pkt / b0_o.leafs_per_pkt
    assert 0.2 < ratio < 5.0


def test_any_hit_seed_preserves_results():
    """Seeding an any-hit walk with ANY leaf must not change the hit
    set (occlusion is order-independent), and the walk must report a
    retiring leaf that, fed back as the seed, still matches."""
    data, cfg = _sphere_data()
    wt = build_wide_tree(data, cfg)
    P, D = _bench_rays()
    out: dict = {}
    _, _, _, _, hit0 = simulate_packet_walk(
        data, wt, P, D, any_hit=True, seed_out=out
    )
    assert out["best"] is not None and out["last"] is not None
    for key in ("best", "last"):
        _, _, _, _, hit_s = simulate_packet_walk(
            data, wt, P, D, any_hit=True, seed_leaf=out[key]
        )
        assert (hit_s == hit0).all()
    # a bogus seed (empty-range leaf) is harmless too
    _, _, _, _, hit_b = simulate_packet_walk(
        data, wt, P, D, any_hit=True, seed_leaf=(0, 0)
    )
    assert (hit_b == hit0).all()
