"""bench.py backend-outage behavior (VERDICT r2 #3): a down tunnel
must emit ONE honest JSON line with an ``error`` field plus the
last-known-good measurement (clearly labeled), exit nonzero, and probe
adaptively through the whole BENCH_WAIT_S budget instead of burning it
in two fixed 420 s probes."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench


def test_last_good_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    out = {"metric": "mrays_per_s", "value": 216.0, "unit": "Mrays/s",
           "vs_baseline": 1.08}
    bench._record_last_good(out)
    lg = bench._load_last_good()
    assert lg is not None
    assert lg["value"] == 216.0
    assert "captured_at" in lg and "captured_unix" in lg


def test_down_tunnel_emits_error_and_last_good(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    bench._record_last_good({"metric": "mrays_per_s", "value": 216.0,
                             "unit": "Mrays/s", "vs_baseline": 1.08})
    monkeypatch.setenv("BENCH_WAIT_S", "0.5")
    monkeypatch.setattr(bench, "_run_probe",
                        lambda code, budget: (False, "simulated down"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as exc:
        bench._wait_for_backend()
    assert exc.value.code != 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] == 0.0
    assert "NO MEASUREMENT" in out["error"]
    assert out["last_good"]["value"] == 216.0
    assert "captured_at" in out["last_good"]


def test_down_tunnel_without_history_still_emits_error(
    tmp_path, monkeypatch, capsys
):
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(  # a truly fresh machine: no repo copy either
        bench, "_repo_last_good_path",
        lambda: str(tmp_path / "absent.json"))
    monkeypatch.setenv("BENCH_WAIT_S", "0.5")
    monkeypatch.setattr(bench, "_run_probe",
                        lambda code, budget: (False, "simulated down"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as exc:
        bench._wait_for_backend()
    assert exc.value.code != 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 0.0 and "error" in out
    assert "last_good" not in out  # no fabricated history


def test_down_tunnel_on_reimaged_host_reports_committed_last_good(
    tmp_path, monkeypatch, capsys
):
    """A re-imaged host has an EMPTY cache dir; the committed repo copy
    (tunes/bench_last_good.json, refreshed under SRT_TUNE_REPO=1) must
    back the last_good block so the driver outage record still shows
    the last verified on-chip measurement."""
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))  # empty = fresh
    repo = tmp_path / "repo_last_good.json"
    monkeypatch.setattr(bench, "_repo_last_good_path", lambda: str(repo))
    monkeypatch.setenv("SRT_TUNE_REPO", "1")
    bench._record_last_good({"metric": "mrays_per_s", "value": 501.85,
                             "unit": "Mrays/s", "vs_baseline": 2.5092})
    assert repo.exists()
    # wipe the local cache copy: only the committed store remains
    (tmp_path / "bench_last_good.json").unlink()
    monkeypatch.setenv("BENCH_WAIT_S", "0.5")
    monkeypatch.setattr(bench, "_run_probe",
                        lambda code, budget: (False, "simulated down"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        bench._wait_for_backend()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["last_good"]["value"] == 501.85
    assert out["last_good"]["source"] == "committed repo store"


def test_maybe_tune_starts_from_pretune_config(tmp_path, monkeypatch):
    """Each sub-benchmark's tune must start from the renderer's
    PRE-TUNE config: the bench reuses the headline renderer for the
    which=1 sub-metric, and inheriting the headline's deep-pack winner
    OOMs the which1 grad env path when which1 itself has no tune
    (measured live, driver round 3: 130 MB VMEM ask at the headline's
    128x128 tune; the defaults compile fine)."""
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("BENCH_TUNE", "auto")
    from shader_ray_tpu.config import Config
    from shader_ray_tpu.ops.render import RenderStatics

    class R:
        pass

    r = R()
    r.cfg = Config()
    r.cfg.walk_pops = 2  # deliberate pre-bench knob (e.g. SRT_POPS)
    statics = RenderStatics(width=64, height=8, tile_size=1024)

    # no tune persisted anywhere: knobs keep their pre-tune values
    bench._maybe_tune(r, statics, None, "scene-x")
    assert r.cfg.walk_pops == 2

    # the headline tune mutates the live config; the next sub-metric
    # (same renderer, different statics, still no tune) must NOT
    # inherit the winner — and must keep the pre-tune knobs
    r.cfg.jitter_pack, r.cfg.prog_tile = 128, 128
    bench._maybe_tune(r, statics._replace(which=1), None, "scene-x")
    assert (r.cfg.jitter_pack, r.cfg.prog_tile) == (2, 2048)
    assert r.cfg.walk_pops == 2


def test_probe_schedule_is_adaptive(monkeypatch):
    """Budgets grow through _PROBE_BUDGETS; many probes fit one budget
    window (the old schedule managed 2 in 900 s)."""
    budgets = []

    def probe(code, budget):
        budgets.append(budget)
        return (False, "down")

    monkeypatch.setenv("BENCH_WAIT_S", "1.0")
    monkeypatch.setattr(bench, "_run_probe", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        bench._wait_for_backend()
    assert len(budgets) >= 3
    # early probes are short (capped at 30s floor by the tiny deadline)
    assert all(b <= bench._PROBE_BUDGETS[-1] for b in budgets)
    # the uncapped schedule itself is increasing and starts small
    assert bench._PROBE_BUDGETS[0] <= 90.0
    assert list(bench._PROBE_BUDGETS) == sorted(bench._PROBE_BUDGETS)


def test_probe_timeouts_escalate_to_max_budget(monkeypatch):
    """Two consecutive TIMEOUT kills jump straight to the max budget: a
    killed probe restarts its remote compile from scratch, so stepping
    through the short budgets against a slow compile (measured 248 s
    for the probe program under compiler contention, round 11) is a
    livelock.  Non-timeout failures (e.g. UNAVAILABLE) keep the short
    schedule — those return fast and the tunnel may recover any time."""
    budgets = []

    def probe(code, budget):
        budgets.append(budget)
        return (False, f"timed out ({budget:.0f}s)")

    monkeypatch.setenv("BENCH_WAIT_S", "100000")
    monkeypatch.setattr(bench, "_run_probe", probe)
    sleeps = {"n": 0}

    def fake_sleep(s):
        sleeps["n"] += 1
        if sleeps["n"] >= 5:
            raise KeyboardInterrupt  # stop the loop after 5 probes

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    with pytest.raises(KeyboardInterrupt):
        bench._wait_for_backend()
    assert budgets[0] == bench._PROBE_BUDGETS[0]
    assert budgets[1] == bench._PROBE_BUDGETS[1]
    # probes 3+ run at the max budget, not the stepped schedule
    assert all(b == bench._PROBE_BUDGETS[-1] for b in budgets[2:])

    # a non-timeout failure between timeouts resets the escalation
    budgets.clear()
    sleeps["n"] = 0
    flavors = ["timed out (60s)", "UNAVAILABLE: tunnel",
               "timed out (90s)", "timed out (120s)", "timed out (420s)"]

    def probe2(code, budget):
        budgets.append(budget)
        return (False, flavors[min(len(budgets) - 1, len(flavors) - 1)])

    monkeypatch.setattr(bench, "_run_probe", probe2)
    with pytest.raises(KeyboardInterrupt):
        bench._wait_for_backend()
    # after the reset at probe 2, two MORE timeouts are needed before
    # the jump — probe 4 still follows the schedule, probe 5 is maxed
    assert budgets[3] == bench._PROBE_BUDGETS[3]
    assert budgets[4] == bench._PROBE_BUDGETS[-1]


def test_congested_tunnel_proceeds_instead_of_aborting(monkeypatch, capsys):
    """Devices enumerated but the dispatch ran out of budget = the
    tunnel is UP and the remote compiler congested (measured 248-450 s
    for the cached probe dispatch, round 11).  The bench must PROCEED —
    more probe kills abandon in-flight compiles, and a deadline abort
    would grade an up-but-slow tunnel as 0.0."""
    monkeypatch.setenv("BENCH_WAIT_S", "900")
    monkeypatch.setattr(
        bench, "_run_probe",
        lambda code, budget: (False, "congested: devices up, dispatch > 60s"))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_backend()  # returns (no SystemExit)
    assert "proceeding" in capsys.readouterr().err


def test_probe_detects_devices_ok_in_partial_output(monkeypatch):
    """_run_probe classifies a timeout WITH the DEVICES_OK marker in
    the killed subprocess's partial stdout as congestion, and one
    without it (blocked in import/device init = tunnel down) as a
    plain timeout."""
    import subprocess as sp

    def fake_run(*a, **kw):
        raise sp.TimeoutExpired(
            cmd="probe", timeout=kw["timeout"], output=b"DEVICES_OK tpu\n")

    # _run_probe does ``import subprocess`` locally; patch the module
    monkeypatch.setattr(sp, "run", fake_run)
    ok, reason = bench._run_probe("code", 60.0)
    assert not ok and reason.startswith("congested")

    def fake_run2(*a, **kw):
        raise sp.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    monkeypatch.setattr(sp, "run", fake_run2)
    ok, reason = bench._run_probe("code", 60.0)
    assert not ok and reason.startswith("timed out")


def test_probe_recovery_returns(monkeypatch):
    """A probe success mid-schedule returns normally (no exit)."""
    calls = {"n": 0}

    def probe(code, budget):
        calls["n"] += 1
        return (calls["n"] >= 3, "down")

    monkeypatch.setenv("BENCH_WAIT_S", "60")
    monkeypatch.setattr(bench, "_run_probe", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_backend()  # must not raise
    assert calls["n"] == 3


def test_compilation_cache_is_host_keyed_on_cpu(tmp_path, monkeypatch):
    """The CPU persistent-cache dir embeds a host fingerprint: a cache
    built on another machine's CPU must be invisible here (XLA loads
    foreign CPU AOT results with only an error log and a SIGILL
    risk).  TPU backends keep the shared ``xla`` dir (device
    executables are host-independent, and the warm on-chip cache from
    earlier rounds must survive)."""
    import os

    import jax

    from shader_ray_tpu.utils import compcache

    k1 = compcache.host_cache_key()
    assert k1 == compcache.host_cache_key()
    assert len(k1) == 10
    # this suite runs on the CPU backend → host-keyed subdir
    assert compcache.cache_subdir() == f"xla-cpu-{k1}"
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(compcache, "_enabled", False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = compcache.enable_compilation_cache()
        assert k1 in path
        assert os.path.isdir(path)
    finally:
        # don't leave the process-global cache pointed at the tmpdir
        jax.config.update("jax_compilation_cache_dir", prev)


def test_stable_program_key_ignores_compile_options(monkeypatch):
    """The stable seed key hashes program identity only: perturbing the
    compile_options hash (what the axon tunnel effectively does across
    reconnects) must not change it, and repeated lowerings of the same
    program must agree."""
    import jax
    import jax.numpy as jnp

    from jax._src import cache_key as ck
    from shader_ray_tpu.utils import compcache

    def f(x):
        return jnp.cos(x) * 2.0

    backend = jax.local_devices()[0].client
    m1 = jax.jit(f).lower(jnp.zeros((4,), jnp.float32)).compiler_ir("stablehlo")
    m2 = jax.jit(f).lower(jnp.zeros((4,), jnp.float32)).compiler_ir("stablehlo")
    k1 = compcache._stable_program_key(m1, backend)
    k2 = compcache._stable_program_key(m2, backend)
    assert k1 == k2 and len(k1) == 64

    orig = ck._hash_serialized_compile_options

    def noisy(h, co, strip=False):
        orig(h, co, strip)
        h.update(b"session-noise")

    monkeypatch.setattr(ck, "_hash_serialized_compile_options", noisy)
    assert compcache._stable_program_key(m1, backend) == k1

    def g(x):
        return jnp.cos(x) * 3.0  # different program -> different key

    m3 = jax.jit(g).lower(jnp.zeros((4,), jnp.float32)).compiler_ir("stablehlo")
    assert compcache._stable_program_key(m3, backend) != k1


def test_stable_seed_survives_compile_options_noise(tmp_path):
    """End-to-end cross-process seed: run 1 (NONCE=A, harvest on)
    compiles and files the executable under its stable key in the repo
    store; run 2 (NONCE=B — a different jax cache key, empty local
    cache) must seed from the stable store instead of recompiling.
    This is the exact axon failure mode: repo entries harvested in one
    tunnel session missed in the next (13:33 harvest -> 13:37 miss,
    2026-08-19) because compile_options bytes vary per session."""
    import os
    import subprocess
    import sys as _sys

    helper = os.path.join(os.path.dirname(__file__), "helper_stable_seed.py")
    store = str(tmp_path / "repostore")

    def run(nonce, cache_dir, harvest):
        env = dict(os.environ, NONCE=nonce, SRT_CACHE_DIR=cache_dir,
                   JAX_PLATFORMS="cpu")
        env["SRT_CCACHE_REPO"] = "1" if harvest else "0"
        env.pop("XLA_FLAGS", None)
        return subprocess.run(
            [_sys.executable, helper, store], env=env, text=True,
            capture_output=True, timeout=240, cwd="/root/repo")

    r1 = run("A", str(tmp_path / "user1"), harvest=True)
    assert r1.returncode == 0, r1.stderr
    assert "RESULT=" in r1.stdout
    from shader_ray_tpu.utils import compcache

    stable_dir = os.path.join(store, compcache.cache_subdir() + "-stable")
    assert os.path.isdir(stable_dir) and len(os.listdir(stable_dir)) >= 1

    r2 = run("B", str(tmp_path / "user2"), harvest=False)
    assert r2.returncode == 0, r2.stderr
    assert "compcache: seeded" in r2.stdout, r2.stdout
    # same numeric result through the seeded executable
    res1 = [l for l in r1.stdout.splitlines() if l.startswith("RESULT=")]
    res2 = [l for l in r2.stdout.splitlines() if l.startswith("RESULT=")]
    assert res1 == res2
    # run 2's local dir holds the seeded entry under ITS key (B), which
    # differs from run 1's (A) — proving the key-translation happened
    e1 = {l for l in r1.stdout.splitlines() if l.startswith("ENTRY=")}
    e2 = {l for l in r2.stdout.splitlines() if l.startswith("ENTRY=")}
    ours1 = {e for e in e1 if "jit_f-" in e}
    ours2 = {e for e in e2 if "jit_f-" in e}
    assert ours1 and ours2 and ours1.isdisjoint(ours2)


def test_compilation_cache_seeds_from_repo_store(tmp_path, monkeypatch):
    """A re-imaged host wipes the user cache; enable_compilation_cache
    copies the committed <repo>/xla_cache entries in (missing files
    only — a fresher local entry is never clobbered)."""
    import jax

    from shader_ray_tpu.utils import compcache

    repo = tmp_path / "store" / compcache.cache_subdir()
    repo.mkdir(parents=True)
    (repo / "jit__fn-aaaa-cache").write_bytes(b"committed")
    (repo / "jit__fn-bbbb-cache").write_bytes(b"committed2")
    (repo / ".gitkeep").write_text("")
    monkeypatch.setattr(
        compcache, "_repo_cache_dir",
        lambda subdir: str(tmp_path / "store" / subdir),
    )
    monkeypatch.setenv("SRT_CACHE_DIR", str(tmp_path / "user"))
    monkeypatch.setattr(compcache, "_enabled", False)
    # a pre-existing local entry must survive the seed
    local = tmp_path / "user" / compcache.cache_subdir()
    local.mkdir(parents=True)
    (local / "jit__fn-aaaa-cache").write_bytes(b"local-newer")
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = compcache.enable_compilation_cache()
        assert (local / "jit__fn-bbbb-cache").read_bytes() == b"committed2"
        assert (local / "jit__fn-aaaa-cache").read_bytes() == b"local-newer"
        assert not (local / ".gitkeep").exists()
        assert path == str(local)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_congested_then_wedged_resumes_probing(monkeypatch, capsys):
    """The congested path's mid-dispatch kill can wedge the tunnel
    (axon rule 3).  After settling, one quick re-probe must confirm
    the tunnel still answers; if it stops answering (plain timeout),
    the bench resumes the probe loop instead of walking into an
    unrecoverable in-process ``import jax`` (ADVICE r3)."""
    monkeypatch.setenv("BENCH_WAIT_S", "900")
    calls = []

    def probe(code, budget):
        calls.append(budget)
        if len(calls) == 1:
            return False, "congested: devices up, dispatch > 60s"
        if len(calls) == 2:
            return False, "timed out (45s)"  # post-settle: wedged
        return True, ""  # loop resumed; tunnel recovered

    monkeypatch.setattr(bench, "_run_probe", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_backend()
    err = capsys.readouterr().err
    assert "resuming" in err
    assert len(calls) == 3  # congested, wedge-check, recovery


def test_probe_budget_clamps_to_remaining_deadline(monkeypatch):
    """A probe launched near the deadline gets the ACTUAL remaining
    time (>= 5 s floor), not a 30 s overrun (ADVICE r3)."""
    monkeypatch.setenv("BENCH_WAIT_S", "20")
    budgets = []

    def probe(code, budget):
        budgets.append(budget)
        return False, "timed out"

    monkeypatch.setattr(bench, "_run_probe", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        bench, "_emit_backend_down",
        lambda *a, **k: (_ for _ in ()).throw(SystemExit(2)))
    with pytest.raises(SystemExit):
        bench._wait_for_backend()
    assert all(b <= 20.0 + 1e-6 for b in budgets)
