"""Golden-image regression (SURVEY.md section 4: the reference's
canonical outputs are its in-repo golden renders, bunny.jpg/bunny2.jpg
— here a committed render of the canonical sphere+sky+gold scene
guards the whole pipeline across refactors).

Both engines must stay within tolerance of the committed frame: the
wavefront engine near-exactly, the packet engine to env-resolution +
normal-precision tolerance.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from shader_ray_tpu.app.materials import resolve_material
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.engine_pallas import render_frame_packet
from shader_ray_tpu.ops.pallas.pack import pack_scene
from shader_ray_tpu.ops.render import (
    RenderStatics,
    default_frame_params,
    render_frame,
)
from shader_ray_tpu.ops.scene import upload_scene
from shader_ray_tpu.utils import mat4

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "sphere_gold_64.npy")


@pytest.fixture(scope="module")
def setup():
    pos, _ = uv_sphere(lat=12, lon=16)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    statics = RenderStatics(width=64, height=64, tile_size=1024)
    spec, diff = resolve_material(0, 0)  # gold
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(mat4.make_translation(0, 0, 3.2).astype(np.float32)),
        specular_color=jnp.asarray(spec),
        diffuse_color=jnp.asarray(diff),
    )
    return data, statics, params


def test_wavefront_matches_golden(setup):
    data, statics, params = setup
    scene = upload_scene(data, procedural_sky(256))
    img = np.asarray(render_frame(scene, params, statics))
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(img, golden, atol=2e-3)


def test_packet_matches_golden(setup):
    data, statics, params = setup
    packed = pack_scene(data, procedural_sky(256), env_size=(128, 256))
    img = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024, interpret=True)
    )
    golden = np.load(GOLDEN)
    # packet engine: env sampled at its own resolution (here equal to
    # the golden's source), normals interpolated in-kernel — small
    # numeric drift allowed, structure must match
    diff = np.abs(img - golden)
    assert diff.mean() < 5e-3, f"mean diff {diff.mean()}"
    assert (diff.max(axis=-1) > 5e-2).mean() < 0.01, "too many off pixels"


def test_wide_packet_matches_golden(setup):
    """The production (8-wide) packet engine stays on the committed
    golden frame too."""
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide

    data, statics, params = setup
    packed = pack_scene_wide(data, procedural_sky(256), env_size=(128, 256))
    img = np.asarray(
        render_frame_packet(packed, params, statics, tile=1024, interpret=True)
    )
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(img, golden, atol=3e-2)


def test_bench_golden_integrity():
    """The committed 1024x768 bench-config goldens (which=0 production
    frame + which=5 5x5 supersample oracle, box-downsampled 4x —
    scripts/make_golden.py, VERDICT r1 next #7) load, match their
    recorded checksums, and agree with each other: the supersampled
    oracle is the reference's own ground-truth mode (fs:654-673), so
    the 1-spp production frame must track it everywhere except
    edge/aliasing pixels."""
    import json
    import os

    import numpy as np

    gdir = os.path.join(os.path.dirname(__file__), "golden")
    meta_path = os.path.join(gdir, "bench_meta.json")
    if not os.path.exists(meta_path):
        import pytest

        pytest.skip("bench goldens not generated yet (scripts/make_golden.py)")
    meta = json.load(open(meta_path))
    imgs = {}
    for name, m in meta.items():
        img = np.load(os.path.join(gdir, f"{name}.npy"))
        assert list(img.shape) == m["shape"]
        np.testing.assert_allclose(float(img.sum()), m["checksum"], rtol=1e-6)
        imgs[name] = img
    a = imgs["bench_which0"]
    b = imgs["bench_which5_oracle"]
    # tonemapped 0-1 floats, 4x box-downsampled (averages edge noise);
    # measured on-chip: mean err 2.2e-4, 99.97% of pixels within 0.02
    err = np.abs(a - b)
    assert err.mean() < 0.005, err.mean()
    assert (err.max(axis=-1) < 0.04).mean() > 0.99
