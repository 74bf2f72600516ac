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
    c.prog_tile = 200                  # not a multiple of 128
    with pytest.raises(ValueError, match="prog_tile"):
        c.validate()
    c.prog_tile = 512                  # sub-1024 pow2 multiple: valid
    c.validate()
