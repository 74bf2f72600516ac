"""Per-scene engine-knob autotuner (SURVEY 5.6 config system, extended).

The packet engine's throughput knobs — progressive pixel-block size,
jitter packing factor, hit-leaf scan strategy, multi-pop width — have
scene-dependent optima: coherent bunny-class scenes favor the ctz leaf
scan and S=2 packing at a 2048-pixel block, while divergent or
VMEM-tier scenes favor the queue scan (measured round 5).  The shipped
defaults are the bunny-class optimum; ``autotune`` measures candidate
tuples ON THE LIVE DEVICE for the actual scene and render config,
with the same fencing discipline as bench.py (device-side checksum
reduction, scalar D2H fetch — ``block_until_ready`` returns early on
the axon runtime), and persists the winner next to the scene cache.

Cost model: every candidate is one fresh XLA program (~7-260 s to
compile on the axon remote compiler, ~15 s when the persistent compile
cache hits), so the default space is a two-stage greedy descent over
the knob groups that measurably interact (block/pack first, then leaf
scan, then pops) rather than a full cross product.

No reference analog: the reference is a fixed GLSL pipeline with no
tunable schedule (raytracer.es.fs).  This is the TPU-native replacement
for hand-tuning per scene class.
"""

from __future__ import annotations

import copy
import hashlib
import json
import os
import time

import numpy as np

from shader_ray_tpu.utils.cache import default_cache_dir

# knob groups, tried as a greedy coordinate descent: each stage keeps
# the best assignment found so far and varies one group.  Stage lists
# start with the shipped default so the baseline is always measured.
DEFAULT_SPACE: list[list[dict]] = [
    # progressive pixel block x jitter packing (kernel tile = S * block
    # lanes; the packed union shrinks with the block while lane width
    # stays full).  The round-7 on-chip tune picked 8 @ 512 on ALL
    # three bench scenes — the then-edge of this list, decisively
    # (bunny 14.03 ms vs 15.87 next, terrain 84 vs 126, 340k 25.3 vs
    # 32.7) — so the deeper-packing candidates below extend the
    # frontier: at fixed lane count, more packing + smaller pixel
    # blocks kept winning (S*block >= 1024 is the only shape floor).
    # Pruned after the round-7/8/9 on-chip sweeps: every {1,2}@{512..4096},
    # 4@{512..2048}, 8@{256,512} and 16@{128..512} candidate lost on ALL
    # THREE bench scenes (see tunes/*.json results_ms), so only the
    # shipped default (the baseline is always measured) and the
    # deep-packing frontier remain — a cold-cache tune costs ~half
    # the compiles.  S-deep candidates need an S-sample batch (pack
    # must divide the batch; smaller batches degrade to the largest
    # divisor, see render_progressive_packet) — bench runs BATCH=128.
    # Round-9 frontier probe (scripts/probe_pack128.py, on-chip, bunny
    # K=128/256): 128@128 8.45 ms beat 64@128 9.68; the frontier TURNS
    # OVER past that — 256@128 10.33, 128@256 10.07, 256@64 failed to
    # compile.  128@64 measured 8.46 (== 128@128 within noise) on the
    # coherent bunny, so the tile-64 variants stay as candidates for
    # the divergent scenes, where smaller pixel blocks kept winning at
    # every depth.
    # Round-12 frontier (fully-fused kernel, see kernel_mega envfuse):
    # the per-ray HBM buffers that capped packing at 128-deep are gone,
    # and the measured optimum moved to DEEP x SMALL — terrain 13.46 ms
    # at 512@16 (vs 22.78 at the old 128@64 best), bunny probes favor
    # 128-512 deep at blocks 32-128.  Candidates above 128-deep need a
    # matching BENCH_BATCH (512 default); smaller batches degrade to
    # the largest divisor.
    # Measured round 12 (winner knobs, K=S): bunny 128@128 6.92 /
    # 256@32 5.53 / 512@16 5.22 / 1024@8 4.90 / 2048@8 5.41 (turnover);
    # terrain 256@32 17.13 / 512@16 13.46 / 1024@8 11.22 / 2048@8
    # 12.03; 340k 512@16 7.48 / 1024@8 6.86; which1 512@16 13.47 /
    # 1024@8 13.82.  The pruned list keeps the 1024@8 optimum, its
    # neighbors, and the shallow baseline.
    # NOTE the shallow {2, 2048} baseline is gone: at the 1024-sample
    # tune batch a single measuring dispatch of a ~190 ms/frame
    # untuned terrain candidate costs >3 min — {128, 128} (within 25%
    # of every scene's old record) is the safety floor instead.
    [
        {"jitter_pack": 128, "prog_tile": 128},
        {"jitter_pack": 256, "prog_tile": 32},
        {"jitter_pack": 512, "prog_tile": 16},
        {"jitter_pack": 1024, "prog_tile": 16},
        {"jitter_pack": 1024, "prog_tile": 8},
    ],
    # hit-leaf iteration ("" = auto: queue on the VMEM node tier)
    [
        {"leaf_scan": ""},
        {"leaf_scan": "ctz"},
        {"leaf_scan": "queue"},
    ],
    # stack entries popped per walk step
    [
        {"walk_pops": 4},
        {"walk_pops": 2},
    ],
    # leaf record path: double-buffered SMEM DMA vs VMEM scalar
    # extraction vs DMA + static unroll — the DMA/extract balance is
    # scene-dependent (measured EXACTLY neutral on bunny-class, r3)
    [
        {"leaf_mode": "dma2"},
        {"leaf_mode": "scalar"},
        {"leaf_mode": "dmastatic"},
    ],
]


def _space_key(statics, samples: int, space) -> str:
    """Cache key hash over everything that shapes the measurement."""
    import jax

    payload = json.dumps(
        {
            "statics": tuple(statics),
            "samples": samples,
            "space": space,
            "device": jax.devices()[0].device_kind,
        },
        sort_keys=True,
        default=str,
    )
    return hashlib.sha1(payload.encode()).hexdigest()[:12]


def _statics_tag(statics) -> str:
    """Space-independent identity of a measurement: the render statics
    + device kind.  Persisted verbatim in each tune record so a tune
    stays findable after the SEARCH SPACE is edited (the space is part
    of ``_space_key``, so any space edit orphans every exact-hash file;
    measured live in driver round 3: the round-9 space edit left
    terrain at its 193 ms untuned default on the cold driver bench)."""
    import jax

    return json.dumps(
        {"statics": tuple(statics), "device": jax.devices()[0].device_kind},
        sort_keys=True,
        default=str,
    )


def _tune_path(key: str, h: str) -> str:
    return os.path.join(default_cache_dir(), f"tune-{key}-{h}.json")


def _repo_tune_dir() -> str | None:
    """Committed tune store: ``<repo>/tunes/``.  The user cache dir is
    wiped whenever the host is re-imaged (observed between driver
    rounds), so winners measured on-chip are committed to the repo; a
    cold machine then applies them at zero search cost.  None when the
    package is installed without the repo checkout."""
    d = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "tunes",
    )
    return d if os.path.isdir(d) else None


def _repo_tune_path(key: str, h: str) -> str | None:
    d = _repo_tune_dir()
    return os.path.join(d, f"tune-{key}-{h}.json") if d else None


def load_tuned(
    key: str, statics, samples: int, space=None, fallback: bool = True,
) -> dict | None:
    """Best knobs from a previous autotune of this (scene, config), or
    None.  ``key`` is the scene-cache key (content + build knobs).
    Looks in the user cache dir first, then the repo-committed store.

    ``fallback=True`` (the apply path, e.g. BENCH_TUNE=auto): when no
    exact-space-hash file exists, fall back to the NEWEST persisted
    tune for the same (scene key, statics, device) under ANY search
    space — an edited space must not degrade a cold driver run to the
    untuned defaults.  Fallback knobs are validated against the
    current Config so a renamed/retired knob value is dropped instead
    of raising.  A search caller (``autotune``) passes fallback=False:
    a prior-space winner must not suppress a fresh search."""
    space = space if space is not None else DEFAULT_SPACE
    h = _space_key(statics, samples, space)
    for path in (_tune_path(key, h), _repo_tune_path(key, h)):
        if not path:
            continue
        try:
            with open(path) as f:
                best = json.load(f)["best"]
        except (OSError, ValueError, KeyError):
            continue
        if best:  # an empty best (failed search) is a miss, not a tune
            return best
    if not fallback:
        return None
    tag = _statics_tag(statics)
    cands: list[dict] = []
    for d in (default_cache_dir(), _repo_tune_dir()):
        if not d or not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            if not (name.startswith(f"tune-{key}-")
                    and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue
            if rec.get("statics_tag") == tag and rec.get("best"):
                cands.append(rec)
    if not cands:
        return None
    # prefer a tune measured at the same sample count (a deeper
    # jitter_pack winner than the batch silently degrades to the
    # largest divisor), then the most recent measurement
    same = [r for r in cands if r.get("samples") == samples]
    rec = max(same or cands, key=lambda r: r.get("ts", 0.0))
    return _validate_knobs(rec["best"])


def _validate_knobs(knobs: dict) -> dict | None:
    """Filter a persisted knob set down to values the CURRENT Config
    accepts (tunes outlive code: a knob may be renamed, an enum value
    retired).  Returns None when nothing survives."""
    from shader_ray_tpu.config import Config

    ok = {}
    for k, v in knobs.items():
        cfg = Config()
        if not hasattr(cfg, k):
            continue
        setattr(cfg, k, v)
        try:
            cfg.validate()
        except Exception:
            continue
        ok[k] = v
    if not ok:
        return None
    cfg = Config()
    for k, v in ok.items():
        setattr(cfg, k, v)
    try:
        cfg.validate()
    except Exception:
        return None
    return ok


def _apply(cfg, knobs: dict):
    cfg2 = copy.copy(cfg)
    for k, v in knobs.items():
        if not hasattr(cfg2, k):
            raise ValueError(f"unknown config knob {k!r}")
        setattr(cfg2, k, v)
    return cfg2


def _time_candidate(renderer, cfg, statics, params, samples, frames):
    """Median amortized per-frame seconds of a progressive batch under
    ``cfg`` (compile + warm excluded; device-fenced)."""
    r2 = copy.copy(renderer)  # shares the packed scene; swaps config
    r2.cfg = cfg
    # the renderer installs cfg as the process config around every
    # call (Renderer._cfg_wrap), so trace-time global reads
    # (walk_pops, leaf_scan) see the candidate knobs
    pfn = r2.make_progressive_fn(statics, samples, reduce_sum=True)
    if pfn is None:
        raise RuntimeError("engine has no device-batched path")
    np.asarray(pfn(params))  # compile + warm (trace under cfg)
    ts = []
    for _ in range(frames):
        t0 = time.perf_counter()
        np.asarray(pfn(params))  # scalar D2H = the honest fence
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / samples


def autotune(
    renderer,
    statics,
    params,
    samples: int = 32,
    frames: int = 3,
    key: str | None = None,
    space: list[list[dict]] | None = None,
    verbose: bool = True,
    apply: bool = True,
    use_cache: bool = True,
):
    """Greedy per-stage search for the fastest knob tuple on the live
    device.  Returns ``(best_knobs, results)`` where ``results`` maps
    ``repr(knobs) -> amortized ms/frame`` for every measured candidate.

    ``apply=True`` writes the winning knobs onto ``renderer.cfg`` (the
    App passes the process config instance through, so subsequent
    frame fns pick them up).  ``key`` (the scene-cache key) enables
    persisting/reusing the result across runs."""
    import sys

    space = space if space is not None else DEFAULT_SPACE
    if key and use_cache:
        # exact-space hits only: a prior-SPACE winner is a seed for a
        # fresh search (via load_tuned's fallback in the apply path),
        # never a reason to skip searching the edited space
        best = load_tuned(key, statics, samples, space, fallback=False)
        if best is not None:
            if verbose:
                print(f"autotune cache hit: {best}", file=sys.stderr)
            if apply:
                for k, v in best.items():
                    setattr(renderer.cfg, k, v)
            return best, {}

    base = renderer.cfg
    best_knobs: dict = {}
    if key and use_cache:
        # warm-start an edited-space search from the newest prior-space
        # winner (fallback path): its knobs enter every stage's
        # baseline, so the prior optimum is measured and only beaten
        seed = load_tuned(key, statics, samples, space)
        if seed:
            # the full seed, including knobs from stages the edited
            # space no longer sweeps: they are constant across every
            # candidate of this search, so dedup tags (normalized over
            # the space's own knobs) stay collision-free
            best_knobs = dict(seed)
            if verbose:
                print(f"autotune seed (prior space): {seed}",
                      file=sys.stderr)
    results: dict[str, float] = {}
    # tags are normalized over every knob the space touches (defaults
    # filled from the base config), so a stage's no-op candidate (e.g.
    # the baseline re-listed in a later stage) dedups instead of
    # re-measuring the same effective program
    all_keys = sorted({k for st in space for cand in st for k in cand})
    # ITERATED descent: a single pass sweeps each stage at the knobs
    # chosen SO FAR, which mispicks when stages interact — measured
    # round 9 on the bunny headline: the pack sweep at the default
    # walk_pops=4 picked 32@256 (10.15 ms) over 128@128 (10.35), but
    # once pops=2 landed the true optimum was 128@128 @ pops 2
    # (8.45 ms vs the single-pass 9.38).  Later passes re-sweep every
    # stage with the current winners applied; tag dedup makes a
    # converged pass nearly free (only never-measured combos compile).
    failed: set[str] = set()  # don't re-attempt a failing compile
    # (e.g. a VMEM-oversubscribed deep-pack candidate) on later passes
    for pass_n in range(3):
        pass_start = dict(best_knobs)
        for stage in space:
            stage_best, stage_t = None, np.inf
            for cand in stage:
                knobs = {**best_knobs, **cand}
                tag = json.dumps(
                    {k: knobs.get(k, getattr(base, k, None))
                     for k in all_keys},
                    sort_keys=True,
                )
                if tag in failed:
                    continue
                if tag in results:
                    t = results[tag] / 1e3
                else:
                    try:
                        # candidate failures are expected and handled —
                        # no per-candidate kernel-failure dump
                        from shader_ray_tpu.utils import kerneldiag

                        with kerneldiag.suppress():
                            t = _time_candidate(
                                renderer, _apply(base, knobs), statics,
                                params, samples, frames,
                            )
                    except Exception as e:  # an invalid combo must not
                        # sink the search (e.g. no packed path for a mode)
                        failed.add(tag)
                        if verbose:
                            print(f"autotune: {knobs} failed: {e}",
                                  file=sys.stderr)
                        continue
                    results[tag] = round(t * 1e3, 3)
                    if verbose:
                        print(
                            f"autotune[{pass_n}]: {knobs} -> "
                            f"{t * 1e3:.2f} ms/frame",
                            file=sys.stderr,
                        )
                if t < stage_t:
                    stage_best, stage_t = cand, t
            if stage_best is not None:
                best_knobs.update(stage_best)
        if best_knobs == pass_start:  # converged: nothing moved
            break
    if verbose:
        print(f"autotune best: {best_knobs}", file=sys.stderr)
    if not results:
        # every candidate failed (e.g. the backend wedged mid-search):
        # persisting the empty result would make every FUTURE run
        # cache-hit an empty tune and never search again
        print("autotune: no candidate measured; nothing persisted",
              file=sys.stderr)
        return best_knobs, results
    if key:
        h = _space_key(statics, samples, space)
        payload = {"best": best_knobs, "results_ms": results,
                   "samples": samples, "ts": time.time(),
                   "statics_tag": _statics_tag(statics)}
        # user cache + (opt-in, SRT_TUNE_REPO=1) the committed store —
        # reads always consult both, but writes into the checkout must
        # not happen from arbitrary user runs / tests
        paths = [_tune_path(key, h)]
        if os.environ.get("SRT_TUNE_REPO"):
            paths.append(_repo_tune_path(key, h))
        for path in paths:
            if not path:
                continue
            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(payload, f, indent=1)
                os.replace(tmp, path)
            except OSError:
                pass
    if apply:
        for k, v in best_knobs.items():
            setattr(renderer.cfg, k, v)
    return best_knobs, results
