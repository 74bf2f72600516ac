#!/usr/bin/env python
"""Headline benchmark: Mrays/s on a bunny-class scene.

Workload mirrors the reference's canonical frame (SURVEY.md section 6):
~69k-triangle mesh (bunny-class; the bunny.trisrc asset lives in an
external repo we cannot fetch) + HDR lat-long environment, 3 bounces +
3 hard-shadow rays per pixel (raytracer.es.fs:550,445), filmic tonemap,
at the driver north-star resolution 1024x768 on one chip, on the
production engine for the backend (Pallas packet engine on TPU).

Ray accounting matches BASELINE.md's derivation: W*H*(3 bounce +
3 shadow) potential rays per frame; rays actually cast are reported
alongside.  Timing fences each frame on a DEVICE-SIDE CHECKSUM
(scalar D2H fetch): on the axon runtime block_until_ready returns
before execution finishes, so a D2H fetch is the only honest fence,
and fetching the full frame would time the ~25 MB/s tunnel instead of
the chip (~360 ms for a 9 MB frame).  This matches the reference
benchmark's semantics — its loop renders + swaps with no readback
(ray.cpp:1104-1113; glReadPixels happens only on screenshot).

Prints ONE JSON line:
  {"metric": "mrays_per_s", "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is value / 200 (the >=200 Mrays/s/chip v5e target —
the reference itself publishes no numbers, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

WIDTH = int(os.environ.get("BENCH_WIDTH", "1024"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "768"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "5"))
# frames per dispatch for the headline: a progressive-accumulation
# batch (the REPL's `prog N`) renders N jittered frames in ONE device
# dispatch, amortizing the ~40 ms axon host round-trip that otherwise
# dominates a 1024x768 frame.  BENCH_BATCH=1 times bare single frames.
# Default 1024 admits the measured deep jitter-packing optimum the
# fully fused kernel unlocked (round 12: per-ray HBM buffers crossed
# 2^31 bytes at S=256 and killed the compile; with raygen+env
# in-kernel, bunny measured 4.90 ms at 1024@8 vs 8.37 at the old
# 128-deep best, terrain 11.22 vs 22.78; 2048-deep turns over).  The
# round-9 "frontier turns over past 128" verdict was an artifact of
# that buffer wall, not of packing itself.
BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
TARGET_MRAYS = 200.0


def build_scene_data(tris: int | None = None):
    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.models.fixtures import bunny_class_scene, procedural_sky
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.utils.cache import cached_scene_data

    # BENCH_TRIS scales the scene (e.g. 340000 exercises the VMEM
    # node-row large-scene tier); default is the canonical bunny-class
    if tris is None:
        tris = int(os.environ.get("BENCH_TRIS", "69000"))

    def builder():
        pos, _ = bunny_class_scene(tris)
        ts = TriangleSet.from_arrays(pos)
        world = make_world(ts)
        return get_shader_data(world)

    cfg = get_config()
    key = (
        f"bench-bunny-class-{tris // 1000}k"
        f"-l{cfg.bvh_leaf_max}-d{cfg.bvh_max_depth}"
        + (f"-{cfg.splits}" if cfg.splits != "object" else "")
        + (f"-opt{cfg.bvh_opt}" if cfg.bvh_opt else "")
    )
    data = cached_scene_data(key, builder, verbose=True)
    return data, procedural_sky(2048), key


def _last_good_path() -> str:
    from shader_ray_tpu.utils.cache import default_cache_dir

    return os.path.join(default_cache_dir(), "bench_last_good.json")


def _repo_last_good_path() -> str:
    """Committed copy: a re-imaged host has an empty cache dir, so a
    tunnel outage on a fresh machine would otherwise have nothing to
    report.  Lives next to the committed tune store."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tunes", "bench_last_good.json",
    )


def _record_last_good(out: dict) -> None:
    """Persist a successful headline JSON so a later infra outage can
    report the last real measurement instead of reading as a perf
    collapse (VERDICT r2 weak #5).  SRT_TUNE_REPO=1 (the tune-store
    harvest discipline) also refreshes the committed repo copy."""
    try:
        rec = dict(out)
        rec["captured_unix"] = time.time()
        rec["captured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        )
        paths = [_last_good_path()]
        if os.environ.get("SRT_TUNE_REPO") == "1":
            paths.append(_repo_last_good_path())
        for path in paths:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump(rec, f)
    except Exception as e:  # bookkeeping must never sink the benchmark
        print(f"last-good record failed: {e}", file=sys.stderr)


def _load_last_good() -> dict | None:
    """Local cache first (freshest), then the committed repo copy."""
    for path, source in (
        (_last_good_path(), "local cache"),
        (_repo_last_good_path(), "committed repo store"),
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            rec["source"] = source
            return rec
        except Exception:
            continue
    return None


def _emit_backend_down(attempt: int, reason: str | None = None) -> None:
    """One honest JSON line for a down tunnel: value 0 + error field,
    PLUS the last driver-visible good measurement (clearly labeled
    with its capture time) so an infra failure is distinguishable from
    a perf collapse at a glance."""
    out = {
        "metric": "mrays_per_s", "value": 0.0, "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "error": (reason or
                  "jax backend unavailable (axon tunnel down) after "
                  f"{attempt} probes / BENCH_WAIT_S deadline")
                 + " — value 0.0 means NO MEASUREMENT, not zero "
                 "performance",
    }
    lg = _load_last_good()
    if lg is not None:
        out["last_good"] = lg
    print(json.dumps(out))
    sys.exit(2)


# adaptive probe schedule: short probes first (a healthy backend with a
# warm compile cache answers in seconds, and a brief tunnel flap is
# caught by the next short probe) growing toward long ones (axon cold
# compiles run 7-260 s).  The old fixed 420 s budget burned the whole
# 900 s deadline in two probes.
_PROBE_BUDGETS = (60.0, 90.0, 120.0, 180.0, 240.0, 300.0, 420.0)

# consecutive TIMEOUT kills escalate straight to the max budget: a
# killed probe restarts its remote compile from scratch (nothing
# partial persists), so stepping 60->90->120->180 against a ~250 s
# cold compile is a livelock that burns the deadline without ever
# letting one compile finish (measured round 11: probe dispatch took
# 248 s under compiler contention; budgets 1-4 all failed).
_TIMEOUT_ESCALATE_AFTER = 2


def _run_probe(code: str, budget: float) -> tuple[bool, str]:
    """One killable subprocess probe; (ok, reason)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=budget,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired as e:
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        if "DEVICES_OK" in out:
            # the tunnel is UP (device init + enumeration finished);
            # only the dispatch ran out of budget — i.e. the remote
            # compiler is congested, not down
            return False, f"congested: devices up, dispatch > {budget:.0f}s"
        return False, f"timed out ({budget:.0f}s)"
    if "PROBE_OK" in r.stdout:
        return True, ""
    return False, (r.stderr.strip().splitlines() or ["?"])[-1][:200]


def _wait_for_backend() -> None:
    """Block until the JAX backend initializes, probing in SUBPROCESSES.

    The axon TPU tunnel sporadically goes down in a way that blocks
    ``import jax`` (or the first ``jax.devices()``) in-process for
    minutes with no recovery path (CLAUDE.md "axon TPU platform").
    When that happens mid-bench the whole run hangs and the round
    records nothing.  Probing in a killable subprocess keeps THIS
    process clean: only after a probe succeeds do we import jax here.
    BENCH_WAIT_S bounds the total wait (default 900 s; 0 disables).
    On deadline with the backend still down we EXIT after printing a
    fallback JSON line (``_emit_backend_down``): ``import jax`` would
    block unrecoverably in this process (axon rule: nothing in-process
    can recover a down tunnel), and a hung bench records nothing at
    all for the round.
    """
    wait_s = float(os.environ.get("BENCH_WAIT_S", "900"))
    if wait_s <= 0:  # disabled: skip probing, let the import just run
        return
    deadline = time.monotonic() + wait_s
    # the probe ENABLES the persistent compile cache.  A down tunnel
    # blocks in import/device init long before any dispatch, so a kill
    # there is safe — but the CONGESTED path below kills a probe
    # MID-DISPATCH (devices enumerated, tiny dispatch in flight),
    # which leaves dispatched-but-unfetched device work: the
    # tunnel-wedging pattern of axon rule 3.  Before the main process
    # runs its unprotected in-process ``import jax``, that path takes
    # a short settle delay plus one quick killable re-probe to confirm
    # the tunnel still answers (ADVICE r3).
    code = (
        "from shader_ray_tpu.utils.compcache import "
        "enable_compilation_cache; "
        "import jax, numpy as np, jax.numpy as jnp; "
        "enable_compilation_cache(); "
        "d = jax.devices(); "
        "print('DEVICES_OK', d[0].platform, flush=True); "
        "print('PROBE_OK', d[0].platform, "
        "float(np.asarray(jnp.sum(jnp.ones((8, 8))))))"
    )
    attempt = 0
    timeouts = 0
    while time.monotonic() < deadline:
        idx = min(attempt, len(_PROBE_BUDGETS) - 1)
        if timeouts >= _TIMEOUT_ESCALATE_AFTER:
            idx = len(_PROBE_BUDGETS) - 1
        budget = _PROBE_BUDGETS[idx]
        # clamp to the actual remaining deadline (a floor of 5 s keeps
        # the last probe meaningful without overrunning by ~30 s as
        # the old max(30, remaining) clamp could — ADVICE r3)
        budget = min(budget, max(5.0, deadline - time.monotonic()))
        attempt += 1
        ok, reason = _run_probe(code, budget)
        if ok:
            if attempt > 1:
                print(f"backend up after {attempt} probes", file=sys.stderr)
            return
        if reason.startswith("congested"):
            # tunnel up, remote compiler congested (measured round 11:
            # the probe's cached tiny dispatch took 248-450+ s under
            # contention).  PROCEED: the main process queues like any
            # other client and the driver's own timeout backstops it —
            # whereas more probe kills abandon in-flight compiles and
            # a deadline abort would grade an up-but-slow tunnel 0.0.
            # The kill just abandoned an IN-FLIGHT dispatch, though —
            # settle briefly and confirm the tunnel still answers with
            # one quick killable probe before this process touches jax
            # (a wedged tunnel blocks ``import jax`` unrecoverably).
            print(f"backend probe {attempt}: {reason} — tunnel up, "
                  "remote compiler congested; settling", file=sys.stderr)
            time.sleep(min(10.0, max(0.0, deadline - time.monotonic())))
            ok2, reason2 = _run_probe(
                code, min(45.0, max(5.0, deadline - time.monotonic()))
            )
            if ok2 or reason2.startswith("congested"):
                print("backend answered post-settle; proceeding",
                      file=sys.stderr)
                return
            # the tunnel stopped answering after the mid-dispatch kill
            # (possibly wedged): fall through to keep probing rather
            # than hanging the main process in ``import jax``
            print(f"post-settle re-probe failed: {reason2}; resuming "
                  "probe loop", file=sys.stderr)
            continue
        timeouts = timeouts + 1 if reason.startswith("timed out") else 0
        print(f"backend probe {attempt} failed: {reason}", file=sys.stderr)
        time.sleep(min(20.0, max(0.0, deadline - time.monotonic())))
    print("backend unavailable after deadline; aborting", file=sys.stderr)
    _emit_backend_down(attempt)


def main() -> None:
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.ops.render import RenderStatics, default_frame_params
    from shader_ray_tpu.utils import mat4

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", file=sys.stderr)

    data, env, scene_key = build_scene_data()
    print(
        f"scene: {data.triangle_count} tris, {data.group_count} bvh nodes",
        file=sys.stderr,
    )
    renderer = Renderer(data, env)
    print(f"engine: {renderer.engine}", file=sys.stderr)

    # from_config so production sampler knobs (env_aniso=4 GL probes for
    # which=1) flow into the statics — a bare RenderStatics(...) left
    # env_aniso at the NamedTuple default 1, so the which1 sub-metric
    # silently measured the isotropic path (ADVICE r2)
    statics = RenderStatics.from_config(
        width=WIDTH,
        height=HEIGHT,
        tile_size=int(os.environ.get("BENCH_TILE", "65536")),
        # perf-attribution knobs (default = the canonical workload)
        cast_shadows=os.environ.get("BENCH_SHADOWS", "1") != "0",
        bounce_count=int(os.environ.get("BENCH_BOUNCES", "3")),
        which=int(os.environ.get("BENCH_WHICH", "0")),
    )
    # camera framing like the reference default: zoom = extent/2/sin(fov/2)
    # (ray.cpp:1079); the bunny-class sphere has extent ~2.6
    fov = np.deg2rad(40.0)
    zoom = 2.6 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        diffuse_color=jnp.asarray(np.array([0.8, 0.2, 0.2], np.float32)),
        specular_color=jnp.asarray(np.array([0.05, 0.05, 0.05], np.float32)),
    )

    # BENCH_TUNE=1: autotune the engine schedule for this scene first
    # (results persist in the cache dir, so re-runs are free); the
    # headline then measures the tuned knobs.
    _maybe_tune(renderer, statics, params, scene_key)

    # kick the table upload NOW so it streams while the frame kernel
    # compiles remotely (VERDICT r4 #7 cold-start overlap)
    prewarm = _start_upload_prewarm(renderer)

    fn = renderer.make_fn(statics)
    # device-side checksum: fences the frame without fetching it (the
    # scene threads through as a jit argument — see make_checksum_fn)
    fsum = renderer.make_checksum_fn(statics)

    t0 = time.perf_counter()
    try:
        img = np.asarray(fn(params))  # compile + first frame + full fetch
    except Exception as e:
        # Seen live: the tiny-jit backend probe passes but the first
        # REAL program fails (FAILED_PRECONDITION after a tunnel wedge
        # — residual state from an aborted AOT compile).  In-process
        # retries inherit the poisoned client, so re-exec ONCE: the
        # fresh process re-waits for the backend and every cache
        # (scene, tune, XLA) is warm, making the retry cheap.
        if os.environ.get("BENCH_RETRIED") != "1":
            print(f"first frame failed ({e}); re-exec retry",
                  file=sys.stderr)
            os.environ["BENCH_RETRIED"] = "1"
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        print(f"first frame failed after retry: {e}", file=sys.stderr)
        _emit_backend_down(0, f"first frame failed even after a "
                              f"process re-exec retry: {e}")
    print(f"compile+first frame: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    if prewarm is not None:
        prewarm.join()  # its fetch is its fence; frame already landed
    _golden_gate(img)
    np.asarray(fsum(params))  # compile checksum program + warm

    times = []
    for _ in range(FRAMES):
        t0 = time.perf_counter()
        np.asarray(fsum(params))
        times.append(time.perf_counter() - t0)
    t_single = float(np.median(times))

    # headline: BATCH progressive samples per dispatch (real workload:
    # REPL `prog N`), amortizing the per-dispatch host round-trip
    t = t_single
    if BATCH > 1:
        # the batch fn returns its own device-side checksum: ONE
        # dispatch per timed batch
        pfn = renderer.make_progressive_fn(statics, BATCH, reduce_sum=True)
        if pfn is not None:
            np.asarray(pfn(params))
            btimes = []
            for _ in range(FRAMES):
                t0 = time.perf_counter()
                np.asarray(pfn(params))
                btimes.append(time.perf_counter() - t0)
            t = float(np.median(btimes)) / BATCH

    assert np.isfinite(img).all(), "non-finite pixels in benchmark frame"
    rays = WIDTH * HEIGHT * 6  # 3 bounce + 3 shadow (BASELINE.md accounting)
    # honest accounting: rays actually cast this frame (dead lanes at
    # bounces 2/3 cast nothing) — computed once, outside the timed loop
    try:
        rays_cast = int(np.asarray(renderer.make_count_fn(statics)(params)))
    except Exception as e:  # accounting must never sink the benchmark
        print(f"cast-ray accounting failed: {e}", file=sys.stderr)
        rays_cast = None
    mrays = rays / t / 1e6
    print(
        f"frame: {t * 1e3:.2f} ms amortized over batch={BATCH} "
        f"({t_single * 1e3:.2f} ms single-dispatch, min {min(times) * 1e3:.2f}, "
        f"max {max(times) * 1e3:.2f})",
        file=sys.stderr,
    )
    out = {
        # headline metric: potential rays (W*H*6) per second, the
        # BASELINE.md derivation; *_cast is the honest measured count
        "metric": "mrays_per_s",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        "rays_potential": rays,
        "frame_ms": round(t * 1e3, 2),
        "frame_ms_single_dispatch": round(t_single * 1e3, 2),
        "frames_per_dispatch": BATCH,
    }
    if rays_cast is not None:
        out["rays_cast"] = rays_cast
        out["mrays_per_s_cast"] = round(rays_cast / t / 1e6, 2)

    # second metric (VERDICT r1 next #8): an occlusion-HEAVY scene —
    # ridged terrain under a grazing light, where shadow rays hit real
    # occluders (the blob's shadows are ~all unoccluded) — so shadow
    # early-exit and BVH-quality work is measured on geometry shaped
    # like the canonical bunny workload's cavities.  Nested inside the
    # single headline JSON line (the driver parses exactly one).
    if os.environ.get("BENCH_OCCLUDED", "1") != "0":
        try:
            out["occluded"] = bench_occluded(statics, fov)
        except Exception as e:  # the headline must never sink with it
            print(f"occluded bench failed: {e}", file=sys.stderr)
    # extra nested metrics for the round record (compile-cached and
    # scene-cached after the first run; BENCH_EXTRAS=0 skips): the
    # which=1 textureGrad quality mode and the 340k-tri VMEM node tier
    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        try:
            # own tune key (the statics tuple differs by `which`, so the
            # space hash differs): the quality mode's knob optimum need
            # not match the which=0 winner — env-window DMA shifts the
            # pack/block balance.  Headline timing is already recorded,
            # so re-tuning this renderer's cfg is safe.
            s1 = statics._replace(which=1)
            _maybe_tune(renderer, s1, params, scene_key)
            out["which1"] = _time_progressive(renderer, s1, params)
        except Exception as e:
            print(f"which1 bench failed: {e}", file=sys.stderr)
        try:
            data340, env340, key340 = build_scene_data(340000)
            r340 = Renderer(data340, env340)
            _maybe_tune(r340, statics, params, key340)
            out["large_340k"] = _time_progressive(r340, statics, params)
        except Exception as e:
            print(f"340k bench failed: {e}", file=sys.stderr)
    print(json.dumps(out))
    _record_last_good(out)


def _start_upload_prewarm(renderer):
    """Overlap the scene-table H2D upload with the first frame's remote
    compile (VERDICT r4 #7: a congested cold start serialized compile
    -> upload -> first frame).  A daemon thread dispatches ONE tiny
    checksum program over every device table of the packed scene (a
    single compile, persisted in the committed stable cache like every
    other program) and fetches its scalar — the only honest transfer
    fence on axon.  While the main thread blocks in the frame kernel's
    remote compile (GIL released in the RPC), the thread's dispatch
    streams the ~125 MB of tables through the tunnel, so the first
    frame finds them resident.  BENCH_OVERLAP_UPLOAD=0 disables.

    The thread is never joined with a deadline that would abandon an
    in-flight dispatch (the axon tunnel-wedge pattern): main() joins it
    before timing starts, and its own fetch IS its fence."""
    if os.environ.get("BENCH_OVERLAP_UPLOAD", "1") == "0":
        return None
    if getattr(renderer, "packed", None) is None:
        return None
    import threading

    def work():
        try:
            import time as _t

            t0 = _t.perf_counter()
            import jax
            import jax.numpy as jnp

            @jax.jit
            def _touch(p):
                leaves = [x for x in jax.tree_util.tree_leaves(p)
                          if hasattr(x, "dtype")]
                return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

            val = float(np.asarray(_touch(renderer.packed)))
            print(f"upload prewarm: tables resident in "
                  f"{_t.perf_counter() - t0:.1f}s (checksum {val:.3g})",
                  file=sys.stderr)
        except Exception as e:  # prewarm must never sink the benchmark
            print(f"upload prewarm failed (continuing): {e}",
                  file=sys.stderr)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    return t


def _golden_gate(img: np.ndarray) -> None:
    """Correctness gate BEFORE the timed loop (VERDICT r4 weak #2 /
    next #2): the driver-captured bench must never post a fast-but-
    WRONG number (e.g. a tune or packing knob silently corrupting
    output).  The first rendered frame — which already runs under the
    tuned production config — is box-downsampled 4x and compared
    against the committed golden (tests/golden/bench_which0.npy, made
    by scripts/make_golden.py on the real chip), on the same 0-1-scale
    tolerances make_golden --verify uses (measured on-chip drift:
    mean err 2.2e-4).  On mismatch the bench aborts with a DISTINCT
    error instead of timing the wrong frame.  Mirrors the reference's
    own golden-image contract (README.md:3: bunny.jpg/bunny2.jpg).

    Applies only to the canonical configuration the golden was
    rendered at; BENCH_GOLDEN=0 disables (e.g. for perf experiments
    with output-changing knobs)."""
    if os.environ.get("BENCH_GOLDEN", "1") == "0":
        print("golden gate: skipped (BENCH_GOLDEN=0)", file=sys.stderr)
        return
    canonical = (
        WIDTH == 1024 and HEIGHT == 768
        and int(os.environ.get("BENCH_TRIS", "69000")) == 69000
        and int(os.environ.get("BENCH_WHICH", "0")) == 0
        and os.environ.get("BENCH_SHADOWS", "1") != "0"
        and int(os.environ.get("BENCH_BOUNCES", "3")) == 3
    )
    if not canonical:
        print("golden gate: skipped (non-canonical bench config)",
              file=sys.stderr)
        return
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "golden", "bench_which0.npy",
    )
    try:
        ref = np.load(path)
    except Exception as e:
        print(f"golden gate: skipped (golden unreadable: {e})",
              file=sys.stderr)
        return
    down = 4
    got = (
        img.astype(np.float32)
        .reshape(HEIGHT // down, down, WIDTH // down, down, 3)
        .mean(axis=(1, 3))
    )
    if got.shape != ref.shape:
        _emit_golden_fail(f"shape {got.shape} vs golden {ref.shape}")
    err = np.abs(got - ref)
    mean_err = float(err.mean())
    off_share = float((err.max(axis=-1) > 0.02).mean())
    line = f"mean err {mean_err:.5f}, off pixels (>0.02) {off_share:.4%}"
    if mean_err > 0.005 or off_share > 0.01:
        _emit_golden_fail(line)
    print(f"golden gate: ok ({line})", file=sys.stderr)


def _emit_golden_fail(detail: str) -> None:
    """Distinct, loud failure: JSON error line + nonzero exit.  The
    value is 0.0 so the round record reads as NO MEASUREMENT rather
    than a perf number for a wrong frame."""
    msg = (f"GOLDEN GATE FAILED: rendered frame does not match the "
           f"committed golden ({detail}) — refusing to time a wrong "
           f"frame; run scripts/make_golden.py --verify to diagnose")
    print(f"golden gate: FAILED ({detail})", file=sys.stderr)
    print(json.dumps({
        "metric": "mrays_per_s", "value": 0.0, "unit": "Mrays/s",
        "vs_baseline": 0.0, "error": msg,
    }))
    sys.exit(3)


def _maybe_tune(renderer, statics, params, scene_key) -> None:
    """Per-scene knob autotune before the measurement.  BENCH_TUNE
    modes: "1" = run the greedy on-device search (persisted next to
    the scene cache; re-runs are cache hits); "auto" (default) = apply
    a previously persisted tune if one exists but never search (zero
    cost — so a pre-tuned cache benefits every later bench run,
    including the driver's, without risking a multi-compile search on
    a cold cache); "0" = shipped defaults only.  Each renderer's
    config instance is tuned independently, so the winner applies only
    to its own sub-benchmark."""
    import copy

    mode = os.environ.get("BENCH_TUNE", "auto")
    if mode == "0" or BATCH <= 1:
        return
    from shader_ray_tpu.utils.autotune import autotune, load_tuned

    # give each sub-benchmark its own config so a tuned knob set does
    # not leak into the others (Renderer defaults to the process one),
    # starting every sub-benchmark from the renderer's PRE-TUNE config:
    # the bench reuses the headline renderer for the which=1 sub-metric,
    # and inheriting the headline's deep-pack winner OOMs the grad env
    # path (measured live, driver round 3: which1 at the headline's
    # 128x128-tile tune asks 130 MB of VMEM and the compile fails;
    # the untuned defaults measure fine at 27.9 ms)
    if not hasattr(renderer, "_pretune_cfg"):
        renderer._pretune_cfg = copy.copy(renderer.cfg)
    renderer.cfg = copy.copy(renderer._pretune_cfg)
    samples = min(BATCH, 1024)
    if mode != "1":
        best = load_tuned(scene_key, statics, samples)
        if best:
            print(f"applying cached tune: {best}", file=sys.stderr)
            for k, v in best.items():
                setattr(renderer.cfg, k, v)
        return
    # frames=2: at the 1024-sample batch each measuring dispatch is
    # 5-50 s, so per-dispatch timing noise is far below the knob deltas
    autotune(renderer, statics, params, samples=samples, frames=2,
             key=scene_key)


def _time_progressive(renderer, statics, params, batch=None, frames=3) -> dict:
    """Median amortized frame time of a progressive batch (the same
    methodology as the headline), as a nested metric dict."""
    # match the tune's sample count (a smaller batch would silently
    # degrade a deep jitter_pack winner to the largest divisor)
    batch = batch or min(BATCH, 1024)
    pfn = renderer.make_progressive_fn(statics, batch, reduce_sum=True)
    if pfn is None:
        raise RuntimeError("no device-batched progressive path")
    np.asarray(pfn(params))  # compile + warm
    ts = []
    for _ in range(frames):
        t0 = time.perf_counter()
        np.asarray(pfn(params))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts)) / batch
    rays = statics.width * statics.height * 6
    return {
        "value": round(rays / t / 1e6, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(rays / t / 1e6 / TARGET_MRAYS, 4),
        "frame_ms": round(t * 1e3, 2),
        "frames_per_dispatch": batch,
    }


def bench_occluded(statics, fov) -> dict:
    import jax.numpy as jnp

    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.fixtures import procedural_sky, terrain_scene
    from shader_ray_tpu.models.triangle_set import TriangleSet
    from shader_ray_tpu.models.world import get_shader_data, make_world
    from shader_ray_tpu.ops.render import default_frame_params
    from shader_ray_tpu.utils import mat4
    from shader_ray_tpu.utils.cache import cached_scene_data

    tris = int(os.environ.get("BENCH_TRIS", "69000"))

    def builder():
        pos, _ = terrain_scene(tris)
        return get_shader_data(make_world(TriangleSet.from_arrays(pos)))

    cfg = get_config()
    key = (
        f"bench-terrain-{tris // 1000}k"
        f"-l{cfg.bvh_leaf_max}-d{cfg.bvh_max_depth}"
        + (f"-{cfg.splits}" if cfg.splits != "object" else "")
        + (f"-opt{cfg.bvh_opt}" if cfg.bvh_opt else "")
    )
    data = cached_scene_data(key, builder, verbose=True)
    renderer = Renderer(data, procedural_sky(2048))
    # grazing light: valleys shadow themselves (vs the default (0,0,1))
    light = np.array([0.78, 0.5, 0.37], np.float32)
    light /= np.linalg.norm(light)
    zoom = 2.9 / 2.0 / np.sin(fov / 2.0)
    cam = mat4.make_translation(0.0, 0.0, zoom).astype(np.float32)
    params = default_frame_params(fov=fov)._replace(
        camera_matrix=jnp.asarray(cam),
        light_dir=jnp.asarray(light),
        diffuse_color=jnp.asarray(np.array([0.7, 0.6, 0.45], np.float32)),
        specular_color=jnp.asarray(np.array([0.04, 0.04, 0.04], np.float32)),
    )
    _maybe_tune(renderer, statics, params, key)
    fsum = renderer.make_checksum_fn(statics)
    np.asarray(fsum(params))  # compile + warm
    t = None
    if BATCH > 1:
        pfn = renderer.make_progressive_fn(statics, BATCH, reduce_sum=True)
        if pfn is not None:
            np.asarray(pfn(params))
            bt = []
            for _ in range(FRAMES):
                t0 = time.perf_counter()
                np.asarray(pfn(params))
                bt.append(time.perf_counter() - t0)
            t = float(np.median(bt)) / BATCH
    if t is None:
        ts = []
        for _ in range(FRAMES):
            t0 = time.perf_counter()
            np.asarray(fsum(params))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
    rays = WIDTH * HEIGHT * 6
    out = {
        "metric": "mrays_per_s_occluded",
        "value": round(rays / t / 1e6, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(rays / t / 1e6 / TARGET_MRAYS, 4),
        "frame_ms": round(t * 1e3, 2),
        "frames_per_dispatch": BATCH,
    }
    try:
        cast = int(np.asarray(renderer.make_count_fn(statics)(params)))
        out["rays_cast"] = cast
        out["mrays_per_s_cast"] = round(cast / t / 1e6, 2)
    except Exception as e:
        print(f"occluded cast accounting failed: {e}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
