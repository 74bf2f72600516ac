"""ctypes bindings for the native C++ scene compiler (native/libscene.cpp).

The native path replaces the numpy BVH build + hitmiss flattening —
the host-side hot loops (reference bvh.cpp:288-358, world.cpp:145-288).
It is bit-compatible with the numpy builder (cross-checked in
tests/test_native.py), selected via ``Config.use_native``:

* ``auto``    — use it when the shared library is present or a
                toolchain can build it; fall back to numpy silently;
* ``never``   — numpy only;
* ``require`` — raise if the native library is unavailable.

Bindings use ctypes (no pybind11 in this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "libscene.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libscene.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
        "-shared", "-fPIC", "-o", _SO, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        print(f"libscene build failed:\n{r.stderr}", file=sys.stderr)
        return False
    return True


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        stale = (
            not os.path.exists(_SO)
            or (os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO))
        )
        if stale and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib_failed = True
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i32 = ctypes.c_int32
        lib.srt_bvh_build.restype = ctypes.c_void_p
        lib.srt_bvh_build.argtypes = [
            f32p, f32p, f32p, i32, i32, i32,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(i32), ctypes.POINTER(i32), i32p,
        ]
        lib.srt_bvh_fill.restype = i32
        lib.srt_bvh_fill.argtypes = [
            ctypes.c_void_p, f32p, f32p, i32p, i32p, i32p, i32p, i32p,
        ]
        lib.srt_bvh_leaf_count.restype = i32
        lib.srt_bvh_leaf_count.argtypes = [ctypes.c_void_p]
        lib.srt_bvh_free.restype = None
        lib.srt_bvh_free.argtypes = [ctypes.c_void_p]

        i64 = ctypes.c_int64
        lib.srt_trisrc_count.restype = i64
        lib.srt_trisrc_count.argtypes = [ctypes.c_char_p]
        lib.srt_trisrc_parse.restype = i64
        lib.srt_trisrc_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_double, ctypes.c_double, i32,
            f32p, f32p, f32p,
        ]
        lib.srt_obj_count.restype = i64
        lib.srt_obj_count.argtypes = [ctypes.c_char_p]
        lib.srt_obj_parse.restype = i64
        lib.srt_obj_parse.argtypes = [ctypes.c_char_p, f32p, f32p]
        lib.srt_hdr_size.restype = i32
        lib.srt_hdr_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(i32), ctypes.POINTER(i32)
        ]
        lib.srt_hdr_read.restype = i32
        lib.srt_hdr_read.argtypes = [ctypes.c_char_p, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_flat_bvh(
    tri_boxmin: np.ndarray,
    tri_boxmax: np.ndarray,
    barycenters: np.ndarray,
    leaf_max: int = 10,
    max_depth: int = 30,
    ctrav: float = 1.0,
    cisec: float = 4.0,
):
    """Native BVH build + flatten.

    Returns (FlatBVH, order) matching models.bvh.make_bvh +
    models.flatten.flatten_bvh output exactly.
    """
    from shader_ray_tpu.models.flatten import FlatBVH

    lib = _load()
    if lib is None:
        raise RuntimeError("native libscene unavailable")

    T = int(barycenters.shape[0])
    bmin = np.ascontiguousarray(tri_boxmin, np.float32)
    bmax = np.ascontiguousarray(tri_boxmax, np.float32)
    bary = np.ascontiguousarray(barycenters, np.float32)
    order = np.empty(T, np.int32)
    node_count = ctypes.c_int32()
    root = ctypes.c_int32()

    handle = lib.srt_bvh_build(
        bmin, bmax, bary, T, leaf_max, max_depth,
        ctypes.c_float(ctrav), ctypes.c_float(cisec),
        ctypes.byref(node_count), ctypes.byref(root), order,
    )
    try:
        if root.value < 0:
            raise RuntimeError("native BVH build failed (index assignment)")
        n = node_count.value
        boxmin = np.empty((n, 3), np.float32)
        boxmax = np.empty((n, 3), np.float32)
        start = np.empty(n, np.int32)
        count = np.empty(n, np.int32)
        children = np.empty((n, 2), np.int32)
        axis = np.empty(n, np.int32)
        hitmiss = np.empty((8, n, 2), np.int32)
        rc = lib.srt_bvh_fill(
            handle, boxmin, boxmax, start, count,
            children.reshape(-1), axis, hitmiss.reshape(-1),
        )
        if rc != 0:
            raise RuntimeError(f"native BVH fill failed (code {rc})")
        leaf_count = lib.srt_bvh_leaf_count(handle)
    finally:
        lib.srt_bvh_free(handle)

    flat = FlatBVH(
        boxmin=boxmin, boxmax=boxmax, start=start, count=count,
        children=children, axis=axis, hitmiss=hitmiss, root=int(root.value),
    )
    return flat, order, int(leaf_count)


def parse_trisrc_file(
    path: str, geometry_scale: float, screen_gamma: float,
    colors_are_linear: bool,
):
    """Native trisrc parser (reference trisrc-support.cpp:43-104).
    Returns (pos, nrm, col) each (T, 3, 3) f32, or None if the native
    library is unavailable.  Raises ValueError on malformed input (the
    Python parser's contract)."""
    lib = _load()
    if lib is None:
        return None
    bpath = os.fsencode(path)
    T = lib.srt_trisrc_count(bpath)
    if T == -1:
        raise FileNotFoundError(path)
    if T < 0:
        raise ValueError(f"malformed trisrc file: {path}")
    pos = np.empty((T, 9), np.float32)
    nrm = np.empty((T, 9), np.float32)
    col = np.empty((T, 9), np.float32)
    rc = lib.srt_trisrc_parse(
        bpath, float(geometry_scale), float(screen_gamma),
        1 if colors_are_linear else 0, pos.reshape(-1), nrm.reshape(-1),
        col.reshape(-1),
    )
    if rc != T:
        raise ValueError(f"malformed trisrc file: {path}")
    return pos.reshape(T, 3, 3), nrm.reshape(T, 3, 3), col.reshape(T, 3, 3)


def parse_obj_file(path: str):
    """Native OBJ parser (reference obj-support.cpp:226-350).  Returns
    (pos, nrm) each (T, 3, 3) f32, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    bpath = os.fsencode(path)
    T = lib.srt_obj_count(bpath)
    if T == -1:
        raise FileNotFoundError(path)
    if T < 0:
        raise ValueError(f"malformed OBJ file: {path}")
    pos = np.empty((T, 9), np.float32)
    nrm = np.empty((T, 9), np.float32)
    rc = lib.srt_obj_parse(bpath, pos.reshape(-1), nrm.reshape(-1))
    if rc != T:
        raise ValueError(f"malformed OBJ file: {path}")
    return pos.reshape(T, 3, 3), nrm.reshape(T, 3, 3)


def read_hdr_file(path: str):
    """Native Radiance RGBE reader (reference FreeImagePlus FIT_RGBF
    analog, ray.cpp:1048-1054).  Returns (H, W, 3) float32 or None if
    the native library is unavailable; raises ValueError on malformed
    files (matching the Python reader's contract)."""
    lib = _load()
    if lib is None:
        return None
    bpath = os.fsencode(path)
    H = ctypes.c_int32()
    W = ctypes.c_int32()
    rc = lib.srt_hdr_size(bpath, ctypes.byref(H), ctypes.byref(W))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        raise ValueError(f"{path}: not a Radiance HDR file")
    if rc != 0:
        raise ValueError(f"{path}: unsupported HDR orientation")
    out = np.empty((H.value, W.value, 3), np.float32)
    rc = lib.srt_hdr_read(bpath, out.reshape(-1))
    if rc != 0:
        raise ValueError(f"{path}: corrupt HDR pixel data (code {rc})")
    return out
