"""Compiled-scene cache (SURVEY.md section 5.4).

The reference recomputes parse + BVH + hitmiss on every launch
(world.cpp:124); here the flattened device arrays are cached to an
``.npz`` keyed by content hash + build knobs so interactive relaunch
and benchmarking skip the host build.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable

import numpy as np

from shader_ray_tpu.models.world import SceneData

_CACHE_VERSION = 2  # v2: + node_children (wide-BVH packing needs it)


def default_cache_dir() -> str:
    return os.environ.get(
        "SRT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "shader_ray_tpu"),
    )


def _path(key: str) -> str:
    return os.path.join(default_cache_dir(), f"scene-{key}-v{_CACHE_VERSION}.npz")


def save_scene_data(key: str, data: SceneData) -> str:
    path = _path(key)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # pid-unique temp name: concurrent same-key builders (parallel
    # pytest workers) sharing one temp path would interleave writes and
    # os.replace a corrupt archive
    tmp = f"{path}.tmp.{os.getpid()}.npz"
    np.savez_compressed(
        tmp,
        tri_positions=data.tri_positions,
        tri_normals=data.tri_normals,
        tri_colors=data.tri_colors,
        node_boxes=data.node_boxes,
        node_objects=data.node_objects,
        hitmiss=data.hitmiss,
        tree_root=np.int32(data.tree_root),
        triangle_count=np.int32(data.triangle_count),
        group_count=np.int32(data.group_count),
        # when absent, save an empty marker (a full -1 placeholder would
        # defeat pack_scene_wide's "rebuild your cache" assert on load)
        node_children=(
            data.node_children
            if data.node_children is not None
            else np.zeros((0, 2), np.int32)
        ),
    )
    os.replace(tmp, path)
    return path


def load_scene_data(key: str) -> SceneData | None:
    path = _path(key)
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        return SceneData(
            tri_positions=z["tri_positions"],
            tri_normals=z["tri_normals"],
            tri_colors=z["tri_colors"],
            node_boxes=z["node_boxes"],
            node_objects=z["node_objects"],
            hitmiss=z["hitmiss"],
            tree_root=int(z["tree_root"]),
            triangle_count=int(z["triangle_count"]),
            group_count=int(z["group_count"]),
            node_children=(
                z["node_children"]
                if "node_children" in z and z["node_children"].size
                else None
            ),
        )
    except Exception:
        return None


def cached_scene_data(
    key: str, builder: Callable[[], SceneData], verbose: bool = False
) -> SceneData:
    """Load SceneData by cache key, or build + store it."""
    data = load_scene_data(key)
    if data is not None:
        if verbose:
            print(f"scene cache hit: {key}", file=sys.stderr)
        return data
    then = time.monotonic()
    data = builder()
    if verbose:
        print(
            f"scene compile: {time.monotonic() - then:.2f}s (cache miss: {key})",
            file=sys.stderr,
        )
    try:
        save_scene_data(key, data)
    except OSError:
        pass
    return data
