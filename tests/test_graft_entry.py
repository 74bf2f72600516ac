"""Driver-contract checks: entry() compile + dryrun_multichip on the
virtual CPU mesh, plus the VERDICT-r2 regression set: the dryrun must
NEVER initialize a jax backend in the parent process (an in-process
backend init blocks unrecoverably when the axon tunnel is down — the
MULTICHIP_r02 rc=124 failure)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

REPO = os.path.dirname(os.path.abspath(ge.__file__))


def test_entry_jits():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    # under conftest the parent already has 8 initialized CPU devices,
    # so this exercises the in-process branch
    ge.dryrun_multichip(8)


def test_cpu_mesh_env_replaces_device_count(monkeypatch):
    """A parent pinned to 8 virtual devices must provision a 16-device
    child: the count flag is REPLACED, not skipped."""
    monkeypatch.setenv(
        "XLA_FLAGS", "--foo=1 --xla_force_host_platform_device_count=8"
    )
    env = ge._cpu_mesh_env(16)
    assert "--xla_force_host_platform_device_count=16" in env["XLA_FLAGS"]
    assert "device_count=8" not in env["XLA_FLAGS"]
    assert "--foo=1" in env["XLA_FLAGS"]
    assert env["JAX_PLATFORMS"] == "cpu"


def test_peek_never_initializes_backend():
    """_initialized_device_count in a FRESH process (no backend up)
    must return -1 instantly without initializing any backend — the
    exact property whose absence hung the round-2 driver run.  Runs in
    a real subprocess because this pytest process already has a live
    CPU backend."""
    code = (
        "import __graft_entry__ as g\n"
        "n = g._initialized_device_count()\n"
        "assert n == -1, n\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'backend was initialized'\n"
        "print('PEEK_OK')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=120,
    )
    assert "PEEK_OK" in r.stdout, (r.stdout, r.stderr)


def test_dryrun_too_few_devices_takes_subprocess_path(monkeypatch):
    """When no (sufficient) backend is initialized, dryrun_multichip
    must go straight to the provisioned-CPU subprocess WITHOUT querying
    jax devices in-process."""
    calls = {}

    def fake_run(cmd, **kw):
        calls["cmd"] = cmd
        calls["env"] = kw.get("env", {})
        calls["timeout"] = kw.get("timeout")

        class R:
            returncode = 0

        return R()

    def boom(*a, **kw):  # the parent must never query devices
        raise AssertionError("in-process jax.devices() call")

    monkeypatch.setattr(ge, "_initialized_device_count", lambda: -1)
    monkeypatch.setattr(ge.subprocess, "run", fake_run)
    monkeypatch.setattr(jax, "devices", boom)
    ge.dryrun_multichip(16)
    assert "--xla_force_host_platform_device_count=16" in (
        calls["env"]["XLA_FLAGS"]
    )
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert calls["timeout"] is not None  # bounded, not hangable


def test_dryrun_subprocess_timeout_is_bounded_error(monkeypatch):
    """A hanging child becomes a clean RuntimeError (bounded by
    DRYRUN_TIMEOUT_S), never a silent parent hang."""

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd=cmd, timeout=kw.get("timeout"))

    monkeypatch.setattr(ge, "_initialized_device_count", lambda: -1)
    monkeypatch.setattr(ge.subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="timed out"):
        ge.dryrun_multichip(16)


@pytest.mark.full
def test_dryrun_multichip_16_real_subprocess():
    """The real too-few-devices branch end-to-end: the parent's 8-device
    mesh is too small, so a 16-device virtual CPU child runs the full
    sharded step (slow: fresh compiles at 16 devices)."""
    ge.dryrun_multichip(16)
