"""Kernel-failure diagnostics — the CheckShaderCompile analog (C24).

The reference compiles its device program at startup and, on failure,
dumps the shader source plus the GL info log before aborting
(ray.cpp:187-235) — the operator sees WHICH program failed and WHY in
one screen.  Our device programs are Pallas kernels compiled inside
``jax.jit``: a Mosaic lowering error (bad knob combination, VMEM
oversubscription, unsupported op) otherwise surfaces as a raw XLA
traceback with no record of which kernel or engine configuration
produced it.

``report_failure`` renders the analog dump: the failing kernel (from
the deepest ops/pallas frame in the traceback), the engine knobs that
shaped the program, the scene-table shapes, and a matched actionable
hint (e.g. VMEM exhaustion -> shrink ``jitter_pack * prog_tile``).
The Renderer wraps every frame fn it hands out (engine._cfg_wrap), so
compile AND launch failures of any production kernel get the dump.
"""

from __future__ import annotations

import contextlib
import os
import sys
import traceback

_suppressed = 0


@contextlib.contextmanager
def suppress():
    """Silence reports inside a scope that EXPECTS failures and handles
    them itself (the autotuner probes invalid knob combos on purpose)."""
    global _suppressed
    _suppressed += 1
    try:
        yield
    finally:
        _suppressed -= 1


def _kernel_frames(exc: BaseException) -> list[str]:
    """ops/pallas frames on the exception's traceback, outermost first."""
    frames = []
    for f, lineno in traceback.walk_tb(exc.__traceback__):
        path = f.f_code.co_filename.replace("\\", "/")
        if "/ops/pallas/" in path or "/ops/engine_pallas" in path:
            frames.append(
                f"{os.path.basename(path)}:{lineno} ({f.f_code.co_name})"
            )
    return frames


# (substring of the error text, actionable hint) — first match wins
_HINTS = [
    ("tpu_compile_helper", "remote compile-helper crash: known causes "
     "are a single buffer over 2^31 bytes (superframe per-ray arrays "
     "at deep jitter_pack — use the fused raygen+envfuse path, which "
     "has none) and ~128 MB scoped-VMEM kernels (grad env at lane "
     "width 2048: shrink jitter_pack * prog_tile).  See ROUND12.md."),
    ("vmem", "VMEM oversubscription: shrink the kernel tile "
             "(jitter_pack * prog_tile lanes) or ray_tile, or use "
             "leaf_mode=dma2 so leaf records stay out of vector memory"),
    ("smem", "SMEM overflow: the scene's node tables exceed the scalar "
             "memory tier — pack with node_src=vmem (large scenes) or "
             "reduce walk_pops (stack scales with pops)"),
    ("scoped", "scoped-memory overflow: shrink the kernel tile "
               "(jitter_pack * prog_tile) or lower walk_pops"),
    ("resource_exhausted", "device memory exhausted: reduce the "
                           "progressive batch, jitter_pack, or frame "
                           "size — the packed superframe materializes "
                           "jitter_pack * W * H rays"),
    ("mosaic", "Mosaic lowering rejected the kernel: the knob "
               "combination produced an unsupported op/layout — see "
               "CLAUDE.md 'Mosaic lowering gotchas'"),
    ("worker process crashed", "the TPU worker killed a long-running "
     "dispatch (measured round 13: ~38 s of device time survives, "
     "~150 s crashes; million-triangle hbm-leaf progressive batches "
     "cross the line — at 2M tris use jitter_pack<=128 and prog "
     "batches <=256, measured stable at 147 ms/frame; wider tiles' "
     "per-superframe walks also exceed it).  The tunnel needs "
     "minutes to recover; re-probe jax.devices() in a fresh process"),
    ("unavailable", "backend unavailable: the TPU tunnel is down; "
                    "retry jax.devices() in a fresh process"),
]


def _hint(text: str) -> str | None:
    low = text.lower()
    for needle, hint in _HINTS:
        if needle in low:
            return hint
    return None


_KNOBS = (
    "engine", "packet_kernel", "packet_fused", "ray_tile", "prog_tile",
    "jitter_pack", "walk_pops", "leaf_scan", "leaf_mode", "node_src",
    "leaf_isect", "packet_interleave", "packet_max_steps", "min_contrib",
    "env_mode", "env_res", "env_mip_res", "collapse",
)


def describe_failure(
    exc: BaseException,
    cfg=None,
    packed=None,
    statics=None,
    label: str = "frame fn",
) -> str:
    """One-screen diagnostic for a kernel compile/launch failure."""
    lines = [
        "=== kernel failure"
        f" ({label}) ===",
        f"error: {type(exc).__name__}: {str(exc).strip()[:500]}",
    ]
    frames = _kernel_frames(exc)
    if frames:
        lines.append(f"kernel: {frames[-1]}"
                     + (f"  (via {frames[0]})" if len(frames) > 1 else ""))
    if cfg is not None:
        knobs = {k: getattr(cfg, k) for k in _KNOBS if hasattr(cfg, k)}
        lines.append("config: " + ", ".join(
            f"{k}={v!r}" for k, v in knobs.items() if v not in (None, "")
        ))
    if packed is not None:
        shapes = []
        for name in ("leaves", "nodes_vmem", "boxes_smem", "cmeta_smem",
                     "tribase_smem", "env", "env_atlas"):
            arr = getattr(packed, name, None)
            if arr is not None and hasattr(arr, "shape"):
                shapes.append(f"{name}{tuple(arr.shape)}")
        for name in ("n_wide", "stack_depth", "max_count", "node_src"):
            v = getattr(packed, name, None)
            if v is not None:
                shapes.append(f"{name}={v}")
        if shapes:
            lines.append("scene: " + " ".join(shapes))
    if statics is not None:
        lines.append(f"statics: {tuple(statics)}")
    hint = _hint(str(exc))
    if hint:
        lines.append(f"hint: {hint}")
    lines.append("=" * 40)
    return "\n".join(lines)


def report_failure(
    exc: BaseException,
    cfg=None,
    packed=None,
    statics=None,
    label: str = "frame fn",
) -> None:
    """Print the diagnostic to stderr unless suppressed (SRT_KERNEL_DIAG=0
    or an active ``suppress()`` scope).  Never raises."""
    if _suppressed or os.environ.get("SRT_KERNEL_DIAG", "1") == "0":
        return
    try:
        print(describe_failure(exc, cfg, packed, statics, label),
              file=sys.stderr, flush=True)
    except Exception:  # diagnostics must never mask the real error
        pass
