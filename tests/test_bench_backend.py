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
