"""Engine-parity sweep over the full material/mode matrix (VERDICT r2
next #5): wavefront (XLA) and wide-packet (production Pallas, here
interpreted) must agree for EVERY hardcoded material (ray.cpp:54-65),
the metal black-diffuse override and dielectric diffuse colors
(ray.cpp:698-704), and the debug/quality modes which in {0, 1, 5} —
and the 1-spp production frame must track the reference's own oracle,
the 5x5 supersample mode (raytracer.es.fs:654-673), away from edges.

Materials are traced UNIFORMS, so each (engine, which) pair compiles
once and sweeps all materials at run speed on the wavefront engine.
The Pallas interpreter has a ~85 s fixed cost PER FRAME regardless of
scene size, so the packet side keeps two representative frames (gold
metal at which 0 and 1, plus a colored dielectric) in the default lane
and the complete materials x which matrix in the full lane (--full).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shader_ray_tpu.app.materials import MATERIALS, resolve_material
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.engine_pallas import render_frame_packet
from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.utils import mat4

# Pallas-interpreter heavyweights: skipped at nproc=1 (conftest heavy
# tier, VERDICT r3 #3); xdist-parallel hosts and --full run them.
pytestmark = pytest.mark.heavy

SIZE = 32  # 32x32 = exactly one 1024-lane packet tile

# (material index, diffuse index): every material with the default
# diffuse, plus the dielectrics with a saturated color — the metal
# override forces black diffuse, so extra diffuse variants only matter
# for dielectrics
PARAM_MATRIX = [(m, 0) for m in range(len(MATERIALS))] + [(5, 2), (6, 2)]


@pytest.fixture(scope="module")
def scene_setup():
    pos, _ = uv_sphere(lat=12, lon=16)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    env = procedural_sky(256)
    scene = upload_scene(data, env)
    packed = pack_scene_wide(data, env, env_size=(128, 256))
    return scene, packed


def _params(mat_idx: int, diff_idx: int):
    spec, diff = resolve_material(mat_idx, diff_idx)
    return default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.2).astype(np.float32)
        ),
        specular_color=jnp.asarray(spec),
        diffuse_color=jnp.asarray(diff),
    )


def _statics(which: int) -> RenderStatics:
    return RenderStatics(
        width=SIZE, height=SIZE, tile_size=1024, which=which, env_aniso=4
    )


@functools.lru_cache(maxsize=None)
def _wavefront_fn(which: int):
    statics = _statics(which)
    return jax.jit(lambda scene, params: render_frame(scene, params, statics))


def _wavefront(scene, which: int, params) -> np.ndarray:
    return np.asarray(_wavefront_fn(which)(scene, params))


def _packet(packed, which: int, params) -> np.ndarray:
    return np.asarray(
        render_frame_packet(
            packed, params, _statics(which), tile=1024, interpret=True
        )
    )


def _assert_engines_agree(a: np.ndarray, b: np.ndarray, label: str):
    """Same tolerance family as test_golden's wide-packet gate: small
    mean drift (env sampler resolution + in-kernel normal precision),
    very few structurally-off pixels."""
    assert np.isfinite(a).all() and np.isfinite(b).all(), label
    diff = np.abs(a - b)
    assert diff.mean() < 8e-3, f"{label}: mean diff {diff.mean():.5f}"
    off = (diff.max(axis=-1) > 5e-2).mean()
    assert off < 0.02, f"{label}: {off:.2%} pixels off"


def test_wavefront_material_sweep_sane(scene_setup):
    """Every material renders finite, tonemapped-in-range, and
    materially distinct frames; metals show the black-diffuse override
    (darker unlit side than a white-diffuse dielectric)."""
    scene, _ = scene_setup
    frames = {}
    for m, d in PARAM_MATRIX:
        img = _wavefront(scene, 0, _params(m, d))
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5
        frames[(m, d)] = img
    # distinctness: gold vs silver differ, dielectric diffuse color
    # shows up (white vs green diffuse differ)
    assert np.abs(frames[(0, 0)] - frames[(1, 0)]).max() > 0.05
    assert np.abs(frames[(5, 0)] - frames[(5, 2)]).max() > 0.05


@pytest.mark.parametrize("mat_idx,diff_idx", PARAM_MATRIX)
def test_oracle_proximity_per_material(scene_setup, mat_idx, diff_idx):
    """1-spp production vs the 5x5 supersample oracle (the reference's
    only ground-truth mode): interiors agree, edges blend."""
    scene, _ = scene_setup
    params = _params(mat_idx, diff_idx)
    img1 = _wavefront(scene, 0, params)
    img5 = _wavefront(scene, 5, params)
    close = np.all(np.abs(img5 - img1) < 2e-2, axis=-1)
    name = MATERIALS[mat_idx].name
    assert close.mean() > 0.7, f"{name}: only {close.mean():.0%} close"
    assert np.abs(img5 - img1).mean() < 0.03, name


@pytest.mark.parametrize(
    "which,mat_idx,diff_idx",
    [(0, 6, 2), (1, 0, 0)],
    ids=["which0-plastic-green", "which1-gold"],
)
def test_engines_agree_representative(scene_setup, which, mat_idx, diff_idx):
    """Default-lane packet/wavefront agreement: a colored dielectric at
    which=0 plus the which=1 textureGrad quality mode (gold metal at
    which=0 is already pinned by test_golden's wide-packet golden)."""
    scene, packed = scene_setup
    params = _params(mat_idx, diff_idx)
    _assert_engines_agree(
        _wavefront(scene, which, params),
        _packet(packed, which, params),
        f"which={which} {MATERIALS[mat_idx].name}/d{diff_idx}",
    )


@pytest.mark.full
@pytest.mark.parametrize("which", [0, 1, 5])
@pytest.mark.parametrize("mat_idx,diff_idx", PARAM_MATRIX)
def test_engines_agree_full_matrix(scene_setup, which, mat_idx, diff_idx):
    scene, packed = scene_setup
    params = _params(mat_idx, diff_idx)
    _assert_engines_agree(
        _wavefront(scene, which, params),
        _packet(packed, which, params),
        f"which={which} {MATERIALS[mat_idx].name}/d{diff_idx}",
    )
