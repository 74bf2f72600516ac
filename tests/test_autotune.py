"""Per-scene knob autotuner (utils/autotune.py): greedy stage search
runs each candidate through the real progressive path (interpret mode
on CPU), applies the winner to the renderer config, and persists /
reloads the result keyed on scene + statics."""

import json
import os

import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.config import Config
from shader_ray_tpu.engine import Renderer
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import get_shader_data, make_world
from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
from shader_ray_tpu.utils import mat4
from shader_ray_tpu.utils.autotune import autotune, load_tuned

SPACE = [
    [
        {"jitter_pack": 1, "prog_tile": 1024},
        {"jitter_pack": 2, "prog_tile": 1024},
    ],
    [{"leaf_scan": ""}, {"leaf_scan": "queue"}],
]


def test_autotune_searches_applies_and_persists(tmp_path, monkeypatch):
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    pos, _ = uv_sphere(lat=8, lon=12)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    cfg = Config()
    renderer = Renderer(data, procedural_sky(64), config=cfg, engine="packet")
    statics = RenderStatics(width=128, height=8, tile_size=1024)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        ),
        diffuse_color=jnp.asarray(np.array([0.8, 0.3, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32)),
    )

    best, results = autotune(
        renderer, statics, params, samples=2, frames=1,
        key="tiny", space=SPACE, verbose=False,
    )
    # every stage contributed an assignment; 4 candidates, one of
    # which (leaf_scan "" == the base default) dedups by normalized tag.
    # Pass 1 measures 3 unique combos; if pass 1 picked leaf_scan
    # "queue", the convergence pass measures the one remaining corner
    # of the 2x2 space (timing on CPU decides the winner, so both
    # outcomes are legitimate here)
    assert set(best) == {"jitter_pack", "prog_tile", "leaf_scan"}
    assert 3 <= len(results) <= 4
    # the winner was applied to the live config
    assert renderer.cfg.jitter_pack == best["jitter_pack"]
    assert renderer.cfg.leaf_scan == best["leaf_scan"]
    assert all(ms > 0 for ms in results.values())

    # persisted: a second call is a cache hit (no re-measurement)
    files = [f for f in os.listdir(tmp_path) if f.startswith("tune-tiny")]
    assert len(files) == 1
    saved = json.load(open(tmp_path / files[0]))
    assert saved["best"] == best
    assert load_tuned("tiny", statics, 2, SPACE) == best
    best2, results2 = autotune(
        renderer, statics, params, samples=2, frames=1,
        key="tiny", space=SPACE, verbose=False,
    )
    assert best2 == best and results2 == {}

    # a different statics tuple must NOT reuse the cache entry
    assert (
        load_tuned("tiny", statics._replace(which=1), 2, SPACE) is None
    )


def test_repo_tune_store_fallback(tmp_path, monkeypatch):
    """The committed <repo>/tunes store: load_tuned falls back to it
    when the user cache misses (a re-imaged host wipes ~/.cache), and
    autotune writes there only under SRT_TUNE_REPO=1."""
    import shader_ray_tpu.utils.autotune as at

    cache = tmp_path / "cache"
    repo = tmp_path / "tunes"
    cache.mkdir()
    repo.mkdir()
    monkeypatch.setenv("SRT_CACHE_DIR", str(cache))
    monkeypatch.delenv("SRT_TUNE_REPO", raising=False)
    monkeypatch.setattr(at, "_repo_tune_dir", lambda: str(repo))

    statics = RenderStatics(width=128, height=8, tile_size=1024)
    h = at._space_key(statics, 2, SPACE)
    best = {"jitter_pack": 2, "prog_tile": 1024}

    # repo store alone satisfies the read
    (repo / f"tune-k-{h}.json").write_text(json.dumps({"best": best}))
    assert load_tuned("k", statics, 2, SPACE) == best
    # user cache wins when both exist
    (cache / f"tune-k-{h}.json").write_text(
        json.dumps({"best": {"jitter_pack": 4, "prog_tile": 512}})
    )
    assert load_tuned("k", statics, 2, SPACE)["jitter_pack"] == 4

    # write gate: the persist step in autotune() must not touch the
    # repo dir unless opted in (measurement stubbed — persistence is
    # the unit under test)
    pos, _ = uv_sphere(lat=6, lon=8)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    renderer = Renderer(
        data, procedural_sky(64), config=Config(), engine="packet"
    )
    params = default_frame_params()
    monkeypatch.setattr(
        at, "_time_candidate", lambda *a, **k: 0.001
    )
    tiny_space = [[{"jitter_pack": 1, "prog_tile": 1024}]]
    autotune(renderer, statics, params, samples=2, frames=1,
             key="w", space=tiny_space, verbose=False)
    assert not list(repo.glob("tune-w-*"))
    assert list(cache.glob("tune-w-*"))
    monkeypatch.setenv("SRT_TUNE_REPO", "1")
    autotune(renderer, statics, params, samples=2, frames=1,
             key="w2", space=tiny_space, verbose=False)
    assert list(repo.glob("tune-w2-*"))

    # a search where EVERY candidate failed must persist nothing (a
    # wedged backend would otherwise poison the cache with an empty
    # best that every later run applies instead of searching)
    def boom(*a, **k):
        raise RuntimeError("backend wedged")

    monkeypatch.setattr(at, "_time_candidate", boom)
    best, results = autotune(renderer, statics, params, samples=2,
                             frames=1, key="w3", space=tiny_space,
                             verbose=False)
    assert best == {} and results == {}
    assert not list(cache.glob("tune-w3-*"))
    assert not list(repo.glob("tune-w3-*"))
    # and an empty persisted best (from an older build) reads as a miss
    h3 = at._space_key(statics, 2, tiny_space)
    (cache / f"tune-w3-{h3}.json").write_text(json.dumps({"best": {}}))
    assert load_tuned("w3", statics, 2, tiny_space) is None


def test_space_edit_falls_back_to_prior_winner(tmp_path, monkeypatch):
    """Editing the search space changes every exact-space hash, which
    used to orphan all persisted tunes (measured live, driver round 3:
    the cold bench ran terrain at its 193 ms untuned default because
    the round-9 space edit re-tuned only the bunny scene).  The apply
    path must fall back to the newest same-(scene, statics) tune under
    ANY space; the search path must NOT treat that as a cache hit."""
    import shader_ray_tpu.utils.autotune as at

    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    statics = RenderStatics(width=128, height=8, tile_size=1024)
    old_space = [[{"jitter_pack": 1}, {"jitter_pack": 4}]]
    h_old = at._space_key(statics, 2, old_space)
    best = {"jitter_pack": 4, "prog_tile": 1024}
    (tmp_path / f"tune-sc-{h_old}.json").write_text(json.dumps({
        "best": best, "samples": 2, "ts": 100.0,
        "statics_tag": at._statics_tag(statics),
    }))

    new_space = [[{"jitter_pack": 1}, {"jitter_pack": 2}]]
    # apply path: fallback finds the old-space winner
    assert load_tuned("sc", statics, 2, new_space) == best
    # search path: exact-only misses, so a search would still run
    assert load_tuned("sc", statics, 2, new_space, fallback=False) is None
    # different statics (same scene key) must not match — the bench's
    # which=1 sub-metric shares the scene key with the headline
    assert load_tuned("sc", statics._replace(which=1), 2,
                      new_space) is None
    # a record without statics_tag (older build) is skipped
    (tmp_path / f"tune-sc2-{h_old}.json").write_text(
        json.dumps({"best": best, "samples": 2, "ts": 100.0})
    )
    assert load_tuned("sc2", statics, 2, new_space) is None

    # newest wins; equal-samples records are preferred over newer
    # mismatched-samples ones
    (tmp_path / "tune-sc-aaaaaaaaaaaa.json").write_text(json.dumps({
        "best": {"jitter_pack": 8}, "samples": 4, "ts": 500.0,
        "statics_tag": at._statics_tag(statics),
    }))
    assert load_tuned("sc", statics, 2, new_space) == best  # samples=2
    (tmp_path / "tune-sc-bbbbbbbbbbbb.json").write_text(json.dumps({
        "best": {"jitter_pack": 16}, "samples": 2, "ts": 900.0,
        "statics_tag": at._statics_tag(statics),
    }))
    assert load_tuned("sc", statics, 2, new_space) == {"jitter_pack": 16}

    # retired/renamed knobs are dropped, surviving ones still apply
    (tmp_path / "tune-sc-cccccccccccc.json").write_text(json.dumps({
        "best": {"jitter_pack": 16, "leaf_mode": "gone", "no_such": 1},
        "samples": 2, "ts": 999.0,
        "statics_tag": at._statics_tag(statics),
    }))
    assert load_tuned("sc", statics, 2, new_space) == {"jitter_pack": 16}


def test_search_seeds_from_prior_space_winner(tmp_path, monkeypatch):
    """A fresh search under an edited space warm-starts from the prior
    winner: its knobs join every stage baseline, so the old optimum is
    measured (and only beaten, never silently lost)."""
    import shader_ray_tpu.utils.autotune as at

    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    statics = RenderStatics(width=128, height=8, tile_size=1024)
    old_space = [[{"walk_pops": 4}, {"walk_pops": 2}]]
    h_old = at._space_key(statics, 2, old_space)
    (tmp_path / f"tune-seed-{h_old}.json").write_text(json.dumps({
        "best": {"walk_pops": 2}, "samples": 2, "ts": 100.0,
        "statics_tag": at._statics_tag(statics),
    }))

    seen = []

    def fake_time(renderer, cfg, statics, params, samples, frames):
        seen.append((cfg.jitter_pack, cfg.walk_pops))
        return 0.001 * cfg.jitter_pack

    monkeypatch.setattr(at, "_time_candidate", fake_time)
    pos, _ = uv_sphere(lat=6, lon=8)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    renderer = Renderer(
        data, procedural_sky(64), config=Config(), engine="packet"
    )
    # new space sweeps jitter_pack only; walk_pops comes from the seed
    new_space = [[{"jitter_pack": 1}, {"jitter_pack": 2}]]
    best, results = autotune(
        renderer, statics, default_frame_params(), samples=2, frames=1,
        key="seed", space=new_space, verbose=False,
    )
    assert best["jitter_pack"] == 1
    # every candidate ran at the seeded pops=2, not the default 1
    # (conftest pins SRT_POPS=1) — proving the seed applied
    assert seen and all(p == 2 for _, p in seen)


def test_iterated_descent_escapes_stage_interaction(tmp_path, monkeypatch):
    """Interacting knob groups defeat a single greedy pass: measured
    round 9 on-chip, the pack sweep at the default walk_pops=4 picked
    32@256 over 128@128, but the true optimum was 128@128 AT pops=2
    (8.45 ms vs the single-pass 9.38).  The iterated descent must
    re-sweep earlier stages with later winners applied and land on the
    joint optimum; a converged pass must re-measure nothing."""
    import shader_ray_tpu.utils.autotune as at

    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    times = {  # (jitter_pack, walk_pops) -> s; optimum needs BOTH moves
        (1, 4): 0.010, (2, 4): 0.011,
        (1, 2): 0.009, (2, 2): 0.007,
    }
    calls = []

    def fake_time(renderer, cfg, statics, params, samples, frames):
        calls.append((cfg.jitter_pack, cfg.walk_pops))
        return times[(cfg.jitter_pack, cfg.walk_pops)]

    monkeypatch.setattr(at, "_time_candidate", fake_time)
    space = [
        [{"jitter_pack": 1}, {"jitter_pack": 2}],
        [{"walk_pops": 4}, {"walk_pops": 2}],
    ]
    pos, _ = uv_sphere(lat=6, lon=8)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    cfg = Config()
    cfg.jitter_pack, cfg.walk_pops = 1, 4
    renderer = Renderer(data, procedural_sky(64), config=cfg, engine="packet")
    statics = RenderStatics(width=128, height=8, tile_size=1024)

    best, results = autotune(
        renderer, statics, params=default_frame_params(), samples=2,
        frames=1, space=space, verbose=False,
    )
    # pass 1 alone lands (1, 2); the re-sweep finds (2, 2)
    assert best == {"jitter_pack": 2, "walk_pops": 2}
    # every distinct combo measured exactly once (tag dedup): the
    # convergence pass added zero re-measurements
    assert sorted(calls) == sorted(times)
    assert len(results) == 4


def test_renderer_traces_under_its_own_config(monkeypatch):
    """Kernel knobs read from the process config at trace time
    (walk_pops, leaf_scan) must see the RENDERER's config instance —
    a custom-config Renderer used to inherit whatever the process
    global was when the jit first executed."""
    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.ops.pallas import packet_mega, packet_wide

    pos, _ = uv_sphere(lat=8, lon=12)
    data = get_shader_data(make_world(TriangleSet.from_arrays(pos)))
    cfg = Config()
    cfg.walk_pops = 2
    assert get_config().walk_pops != 2, "ambient pops must differ (conftest pins 1)"

    seen = []
    orig = packet_wide._default_pops
    spy = lambda: (seen.append(orig()) or seen[-1])
    # patch BOTH seams: packet_mega binds the name at import time, so
    # in a full-suite run (module already imported) patching only
    # packet_wide would miss the fused path
    monkeypatch.setattr(packet_wide, "_default_pops", spy)
    monkeypatch.setattr(packet_mega, "_default_pops", spy)
    renderer = Renderer(data, procedural_sky(64), config=cfg, engine="packet")
    statics = RenderStatics(width=64, height=16, tile_size=1024)
    params = default_frame_params()._replace(
        camera_matrix=jnp.asarray(
            mat4.make_translation(0, 0, 3.0).astype(np.float32)
        )
    )
    np.asarray(renderer.make_fn(statics)(params))
    assert seen and all(p == 2 for p in seen), seen
