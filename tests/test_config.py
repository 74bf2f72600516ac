"""Config env parsing + validation (SURVEY 5.6: the reference's
env-var tier, ray.cpp getenv sites, plus the SRT_* engine knobs).
Every knob must fail fast with a clear message at config time, never
as a Mosaic assertion deep inside kernel construction."""

import os

import pytest

from shader_ray_tpu.config import Config


def test_from_env_defaults_validate(monkeypatch):
    for k in list(os.environ):
        if k.startswith(("SRT_", "BVH_", "SAH_")):
            monkeypatch.delenv(k, raising=False)
    c = Config.from_env()
    assert c.walk_pops in (1, 2, 4)
    assert c.ray_tile % 1024 == 0


def test_from_env_parses_and_normalizes(monkeypatch):
    monkeypatch.setenv("SRT_POPS", "2")
    monkeypatch.setenv("SRT_LEAF_SCAN", "auto")
    monkeypatch.setenv("SRT_RAY_TILE", "2048")
    monkeypatch.setenv("SRT_MIN_CONTRIB", "0.0026")
    c = Config.from_env()
    assert c.walk_pops == 2
    assert c.leaf_scan == ""          # 'auto' normalizes to ''
    assert c.ray_tile == 2048
    assert c.min_contrib == pytest.approx(0.0026)


@pytest.mark.parametrize(
    "name,value,needle",
    [
        ("SRT_POPS", "3", "walk_pops"),
        ("SRT_LEAF_SCAN", "bogus", "leaf_scan"),
        ("SRT_ISECT", "nope", "leaf_isect"),
        ("SRT_COLLAPSE", "best", "collapse"),
        ("SRT_MIN_CONTRIB", "-0.5", "min_contrib"),
        ("SRT_JITTER_PACK", "0", "jitter_pack"),
        ("SRT_RAY_TILE", "1000", "ray_tile"),
        ("SRT_RAY_TILE", "3072", "ray_tile"),  # multiple but not pow2
    ],
)
def test_from_env_rejects_bad_values(monkeypatch, name, value, needle):
    monkeypatch.setenv(name, value)
    with pytest.raises(ValueError, match=needle):
        Config.from_env()


def test_validate_direct_mutation():
    c = Config()
    c.validate()                       # defaults are valid
    c.walk_pops = 3
    with pytest.raises(ValueError, match="1, 2, or 4"):
        c.validate()
    c.walk_pops = 4
    c.prog_tile = 200                  # 200//8 = 25, not a power of two
    with pytest.raises(ValueError, match="prog_tile"):
        c.validate()
    c.prog_tile = 512                  # sub-1024 pow2 multiple: valid
    c.validate()
    c.prog_tile = 64                   # the FOLD-floor block (packed only)
    c.validate()
    c.prog_tile = 32                   # below the 64 floor
    with pytest.raises(ValueError, match="prog_tile"):
        c.validate()
    c.prog_tile = 2048


def test_env_mode_env_base_flow_through_config(monkeypatch):
    """ADVICE r2: env_mode/env_base are Config fields (SRT_ENV_MODE /
    SRT_ENV_BASE parsed in from_env, validated), and a custom-config
    Renderer selects the dense env path WITHOUT mutating process env."""
    monkeypatch.setenv("SRT_ENV_MODE", "dense")
    monkeypatch.setenv("SRT_ENV_BASE", "512")
    c = Config.from_env()
    assert c.env_mode == "dense" and c.env_base == 512
    monkeypatch.setenv("SRT_ENV_MODE", "bogus")
    with pytest.raises(ValueError, match="env_mode"):
        Config.from_env()
    monkeypatch.delenv("SRT_ENV_MODE")
    monkeypatch.setenv("SRT_ENV_BASE", "1000")  # not a power of two
    with pytest.raises(ValueError, match="env_base"):
        Config.from_env()
    monkeypatch.delenv("SRT_ENV_BASE")

    # a custom-config Renderer (no env mutation) packs the dense path:
    # window mode ships an env plane pyramid, dense mode does not
    import numpy as np

    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world

    pos, _ = uv_sphere(lat=4, lon=6)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    env = procedural_sky(16)
    cfg = Config()
    cfg.env_mode = "dense"
    r = Renderer(data, env, config=cfg, engine="packet")
    assert r.packed.env_planes is None
    cfg2 = Config()
    cfg2.env_mode = "window"
    r2 = Renderer(data, env, config=cfg2, engine="packet")
    assert r2.packed.env_planes is not None


def test_kernel_module_escape_hatch(monkeypatch, tmp_path):
    """SRT_KERNEL_MODULE (the reference's SHADER env override analog,
    ray.cpp:360-364): an importable module's ``mega_kernel`` replaces
    the built-in fused kernel body at trace time."""
    import numpy as np

    from shader_ray_tpu.ops.pallas import kernel_mega, packet_mega

    # default: unset resolves to the built-in body
    monkeypatch.delenv("SRT_KERNEL_MODULE", raising=False)
    assert packet_mega._resolve_kernel_body() is kernel_mega.mega_kernel

    # custom module: a delegating wrapper that records its invocation
    (tmp_path / "alt_shader.py").write_text(
        "from shader_ray_tpu.ops.pallas.kernel_mega import mega_kernel"
        " as _real\n"
        "calls = []\n"
        "def mega_kernel(*a, **k):\n"
        "    calls.append(1)\n"
        "    return _real(*a, **k)\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv("SRT_KERNEL_MODULE", "alt_shader")
    import alt_shader

    assert packet_mega._resolve_kernel_body() is alt_shader.mega_kernel

    # functional: a minimal fused shade runs THROUGH the custom body
    # and produces the built-in result (1 bounce, no shadows — the
    # cheapest interpreted configuration)
    import jax.numpy as jnp

    from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.engine_pallas import _pack_uniforms
    from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide
    from shader_ray_tpu.ops.render import default_frame_params

    pos, _ = uv_sphere(lat=4, lon=6)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    packed = pack_scene_wide(data, procedural_sky(32), env_size=(16, 32))
    rng = np.random.default_rng(3)
    P = (rng.normal(size=(1024, 3)) * 0.1 + [0, 0, 3]).astype(np.float32)
    D = np.tile(np.array([0, 0, -1.0], np.float32), (1024, 1))
    uni = _pack_uniforms(default_frame_params())
    kw = dict(tile=1024, interpret=True, bounce_count=1,
              cast_shadows=False)
    got = packet_mega.packet_shade(
        packed, jnp.asarray(P), jnp.asarray(D), None, None, uni, **kw
    )
    assert alt_shader.calls, "custom kernel body was never traced"
    monkeypatch.delenv("SRT_KERNEL_MODULE")
    ref = packet_mega.packet_shade(
        packed, jnp.asarray(P), jnp.asarray(D), None, None, uni, **kw
    )
    np.testing.assert_array_equal(np.asarray(got.acc), np.asarray(ref.acc))
    np.testing.assert_array_equal(np.asarray(got.D), np.asarray(ref.D))
