"""World: scene load orchestration and device-data compile.

Equivalent of the reference world layer (world.cpp:46-134, world.h:28-95):
``load_world`` dispatches on file extension (trisrc/obj), computes the
scene center (whole-set AABB center, world.cpp:106) and extent (2x the
max vertex distance from center, world.cpp:108-117), builds the BVH,
and ``get_shader_data`` flattens everything into the device SoA
contract (world.cpp:298-347).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from dataclasses import dataclass, field

import numpy as np

from shader_ray_tpu.config import Config, get_config
from shader_ray_tpu.models.bvh import BVH, make_bvh
from shader_ray_tpu.models.flatten import FlatBVH, flatten_bvh
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.utils import mat4


@dataclass
class Camera:
    """Reference world.h camera: just a field of view (radians)."""

    fov: float = mat4.to_radians(40.0)  # ray.cpp:1078


@dataclass
class World:
    triangles: TriangleSet
    bvh: BVH | None  # None when the native builder produced `flat`
    scene_center: np.ndarray
    scene_extent: float
    triangle_count: int
    flat: "FlatBVH | None" = None   # native-path pre-flattened BVH
    order: np.ndarray | None = None  # native-path triangle permutation
    cam: Camera = field(default_factory=Camera)
    # view matrices, set by app.camera.update_view_params
    # (reference world.h:44-59)
    camera_matrix: np.ndarray = field(default_factory=mat4.identity)
    camera_normal_matrix: np.ndarray = field(default_factory=mat4.identity)
    object_matrix: np.ndarray = field(default_factory=mat4.identity)
    object_inverse: np.ndarray = field(default_factory=mat4.identity)
    object_normal_matrix: np.ndarray = field(default_factory=mat4.identity)
    object_normal_inverse: np.ndarray = field(default_factory=mat4.identity)

    @property
    def tri_order(self) -> np.ndarray:
        """BVH triangle permutation, whichever builder produced it."""
        return self.order if self.order is not None else self.bvh.order


@dataclass
class SceneData:
    """Device-ready scene arrays (reference scene_shader_data,
    world.h:68-93), int32-indexed and padded for TPU tiling.

    Triangle arrays are in BVH order (leaf ranges index directly) and
    unindexed — 3 vertices per triangle (world.cpp:303-317) packed as
    (T, 9) so one gather fetches a whole triangle.
    """

    tri_positions: np.ndarray   # (T, 9) f32: v0 v1 v2
    tri_normals: np.ndarray     # (T, 9) f32: n0 n1 n2
    tri_colors: np.ndarray      # (T, 9) f32: c0 c1 c2
    node_boxes: np.ndarray      # (N, 8) f32: boxmin(3) boxmax(3) pad(2)
    node_objects: np.ndarray    # (N, 2) i32: (start, count); (0,0) for branch
    hitmiss: np.ndarray         # (8, N, 2) i32
    tree_root: int
    triangle_count: int
    group_count: int
    # host-only extras for tests/debug (reference uploads
    # group_children/directions too though the shader never reads them,
    # world.cpp:195-199 — kept here host-side only)
    node_children: np.ndarray | None = None
    node_axis: np.ndarray | None = None


def load_world(
    filename: str,
    config: Config | None = None,
    verbose: bool = True,
    build_bvh: bool = True,
) -> World:
    """Load + compile a scene (reference load_world, world.cpp:46-134).

    ``build_bvh=False`` skips the BVH build (used when the flattened
    SceneData comes from the scene cache — the World is then only
    needed for center/extent and view matrices)."""
    cfg = config or get_config()

    ext = filename.rsplit(".", 1)[-1] if "." in filename else ""
    then = time.monotonic()
    if ext == "trisrc":
        from shader_ray_tpu.models.trisrc import parse_trisrc

        triangles = parse_trisrc(filename, cfg)
    elif ext == "obj":
        from shader_ray_tpu.models.obj import parse_obj

        triangles = parse_obj(filename)
    else:
        raise ValueError(
            f"This program doesn't know how to load a file with extension {ext}"
        )
    if verbose:
        print(f"Parsing: {time.monotonic() - then:f} seconds", file=sys.stderr)

    return make_world(triangles, cfg, verbose=verbose, build_bvh=build_bvh)


def make_world(
    triangles: TriangleSet,
    config: Config | None = None,
    verbose: bool = False,
    build_bvh: bool = True,
) -> World:
    """Build a World from an already-loaded TriangleSet."""
    cfg = config or get_config()
    tcount = triangles.triangle_count
    if verbose:
        print(f"{tcount} triangles.", file=sys.stderr)
        print(f"{triangles.vertex_count} independent vertices.", file=sys.stderr)
        if tcount:
            print(
                f"{triangles.vertex_count / tcount:.2f} vertices per triangle.",
                file=sys.stderr,
            )

    then = time.monotonic()
    scene_center = triangles.box_center()
    if tcount > 0:
        tri_pos = triangles.positions[triangles.indices]  # (T, 3, 3)
        d = scene_center[None, None, :] - tri_pos
        scene_extent = float(np.sqrt((d * d).sum(axis=-1).max())) * 2.0
    else:
        scene_extent = 1.0
    if verbose:
        print(
            f"Finding scene center and extent: {time.monotonic() - then:f} seconds",
            file=sys.stderr,
        )

    then = time.monotonic()
    bvh = flat = order = None
    if not build_bvh:
        return World(
            triangles=triangles,
            bvh=None,
            scene_center=scene_center,
            scene_extent=scene_extent,
            triangle_count=tcount,
        )
    if cfg.splits == "sbvh":
        # spatial-split build (models/sbvh.py): Python-only — the
        # native builder implements the reference's object-split
        # algorithm bit-compatibly and stays that way
        from shader_ray_tpu.models.sbvh import make_sbvh

        bvh = make_sbvh(
            triangles.positions[triangles.indices] if tcount else
            np.zeros((0, 3, 3), np.float32),
            cfg, verbose=verbose,
        )
        if verbose:
            print(f"SBVH: {time.monotonic() - then:f} seconds", file=sys.stderr)
        if cfg.bvh_opt == "reinsert":
            from shader_ray_tpu.models.optimize import optimize_bvh

            bvh = optimize_bvh(bvh, cfg, verbose=verbose)
        return World(
            triangles=triangles,
            bvh=bvh,
            scene_center=scene_center,
            scene_extent=scene_extent,
            triangle_count=tcount,
        )
    # the reinsertion optimizer needs the BVHNode list; the native
    # builder flattens during build, so force the (bit-compatible)
    # Python builder when it's on
    if cfg.use_native != "never" and cfg.bvh_opt != "reinsert":
        from shader_ray_tpu import native

        if native.available():
            flat, order, leaf_count = native.build_flat_bvh(
                triangles.tri_boxmin,
                triangles.tri_boxmax,
                triangles.barycenters,
                leaf_max=cfg.bvh_leaf_max,
                max_depth=cfg.bvh_max_depth,
                ctrav=cfg.sah_ctrav,
                cisec=cfg.sah_cisec,
            )
            if verbose:
                print(
                    f"BVH (native): {time.monotonic() - then:f} seconds",
                    file=sys.stderr,
                )
                print(f"{flat.node_count} bvh nodes", file=sys.stderr)
                print(f"{leaf_count} of those are leaves", file=sys.stderr)
        elif cfg.use_native == "require":
            raise RuntimeError("Config.use_native=require but libscene unavailable")
    if flat is None:
        bvh = make_bvh(
            triangles.tri_boxmin, triangles.tri_boxmax, triangles.barycenters, cfg,
            verbose=verbose,
        )
        if verbose:
            print(f"BVH: {time.monotonic() - then:f} seconds", file=sys.stderr)
            bvh.stats.print()
        if cfg.bvh_opt == "reinsert":
            from shader_ray_tpu.models.optimize import optimize_bvh

            bvh = optimize_bvh(bvh, cfg, verbose=verbose)

    return World(
        triangles=triangles,
        bvh=bvh,
        scene_center=scene_center,
        scene_extent=scene_extent,
        triangle_count=tcount,
        flat=flat,
        order=order,
    )


def get_shader_data(world: World, config: Config | None = None, verbose: bool = False) -> SceneData:
    """Flatten World into SceneData (reference get_shader_data,
    world.cpp:298-347)."""
    then = time.monotonic()
    if world.flat is not None:
        flat = world.flat  # native path flattened during build
        order = world.order
    else:
        flat = flatten_bvh(world.bvh)
        order = world.bvh.order  # BVH-permuted triangle order
    if verbose:
        print(f"hitmiss: {time.monotonic() - then:f} seconds", file=sys.stderr)

    ts = world.triangles
    # R == T for the reference (permutation) builds; the SBVH build
    # (models/sbvh.py) may duplicate references, so triangle tables and
    # SceneData.triangle_count are sized by the REFERENCE count
    T = len(order) if order is not None else world.triangle_count
    if T > 0:
        idx = ts.indices[order]              # (R, 3)
        tri_positions = ts.positions[idx].reshape(T, 9)
        tri_normals = ts.normals[idx].reshape(T, 9)
        tri_colors = ts.colors[idx].reshape(T, 9)
    else:
        tri_positions = np.zeros((1, 9), np.float32)
        tri_normals = np.zeros((1, 9), np.float32)
        tri_colors = np.zeros((1, 9), np.float32)

    n = flat.node_count
    node_boxes = np.zeros((n, 8), np.float32)
    node_boxes[:, 0:3] = flat.boxmin
    node_boxes[:, 3:6] = flat.boxmax
    node_objects = np.stack([flat.start, flat.count], axis=1).astype(np.int32)

    return SceneData(
        tri_positions=np.ascontiguousarray(tri_positions, np.float32),
        tri_normals=np.ascontiguousarray(tri_normals, np.float32),
        tri_colors=np.ascontiguousarray(tri_colors, np.float32),
        node_boxes=node_boxes,
        node_objects=node_objects,
        hitmiss=flat.hitmiss,
        tree_root=flat.root,
        triangle_count=T,
        group_count=n,
        node_children=flat.children,
        node_axis=flat.axis,
    )


def scene_fingerprint(filename: str, config: Config | None = None) -> str:
    """Content hash for the scene cache (SURVEY.md 5.4): file bytes +
    the build knobs that change the compiled arrays."""
    cfg = config or get_config()
    h = hashlib.sha256()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    key = (
        f"{cfg.bvh_leaf_max}|{cfg.bvh_max_depth}|{cfg.sah_ctrav}|{cfg.sah_cisec}"
        f"|{cfg.colors_are_linear}|{cfg.geometry_scale}|{cfg.splits}|v1"
        + (f"|opt={cfg.bvh_opt}" if cfg.bvh_opt else "")
    )
    h.update(key.encode())
    return h.hexdigest()[:24]
