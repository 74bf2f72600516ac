"""bench.py golden-gate unit tests (VERDICT r4 #2): the gate must
pass on the committed golden itself, abort loudly on a corrupted
frame, and skip on non-canonical configs — without touching a device
(pure numpy paths)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "golden", "bench_which0.npy")


def _upsample(img4):
    """Invert the gate's 4x box downsample exactly (nearest blow-up)."""
    return np.repeat(np.repeat(img4, 4, axis=0), 4, axis=1)


def test_gate_passes_on_golden(monkeypatch, capsys):
    for var in ("BENCH_GOLDEN", "BENCH_TRIS", "BENCH_WHICH",
                "BENCH_SHADOWS", "BENCH_BOUNCES"):
        monkeypatch.delenv(var, raising=False)
    img = _upsample(np.load(GOLD))
    bench._golden_gate(img)  # must not raise/exit
    assert "golden gate: ok" in capsys.readouterr().err


def test_gate_fails_loudly_on_corruption(monkeypatch, capsys):
    """A fast-but-wrong frame (e.g. a knob silently corrupting output)
    must abort with the distinct error JSON and exit code 3."""
    for var in ("BENCH_GOLDEN", "BENCH_TRIS", "BENCH_WHICH",
                "BENCH_SHADOWS", "BENCH_BOUNCES"):
        monkeypatch.delenv(var, raising=False)
    img = _upsample(np.load(GOLD))
    img[100:200, 300:500] += 0.2  # a visibly wrong region
    with pytest.raises(SystemExit) as e:
        bench._golden_gate(img)
    assert e.value.code == 3
    out = capsys.readouterr()
    assert "golden gate: FAILED" in out.err
    payload = json.loads(out.out.strip().splitlines()[-1])
    assert payload["value"] == 0.0
    assert "GOLDEN GATE FAILED" in payload["error"]


def test_gate_skips_non_canonical_and_optout(monkeypatch, capsys):
    img = np.zeros((768, 1024, 3), np.float32)  # totally wrong frame
    monkeypatch.setenv("BENCH_WHICH", "1")
    bench._golden_gate(img)  # non-canonical: skipped, no abort
    assert "skipped (non-canonical" in capsys.readouterr().err
    monkeypatch.delenv("BENCH_WHICH")
    monkeypatch.setenv("BENCH_GOLDEN", "0")
    bench._golden_gate(img)
    assert "skipped (BENCH_GOLDEN=0)" in capsys.readouterr().err
