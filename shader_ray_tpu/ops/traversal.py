"""Wavefront stackless BVH traversal + Moller-Trumbore intersection.

Device equivalent of the GLSL traversal/intersection kernels
(raytracer.es.fs:198-443), redesigned for a vector machine:

* The per-pixel ``group_intersect`` loop (fs:386-443) becomes a
  batched ``lax.while_loop`` over a whole ray tile: every iteration,
  each lane either advances one BVH node (slab test + hit/miss link
  follow) or tests one triangle of its current leaf.  Unlike the GLSL
  inner leaf loop (fs:410-424) which tests up to ``max_leaf_tests``
  triangles per node iteration, leaf tests here are unrolled into the
  outer loop — one gather per lane per iteration, no 10x gather
  amplification for lanes sitting at branch nodes.
* Node indices are int32 (the reference float-encodes them and stops
  at the f32 mantissa limit, fs:384); the stop sentinel is -1.
* The 8-octant link-bank select (fs:389-392) is a per-lane index
  offset ``node + octant * N`` into the flattened (8N, 2) bank array.
* Traversal-budget overflow marks the lane "bad" exactly like
  ``set_bad_hit`` (fs:436-438): t = -1, debug color (1, 0, 0).

All math follows the GLSL kernels: slab test with IEEE inf semantics
(fs:200-217), Moller-Trumbore with det epsilon 1e-7 and the reordered
early-out structure (fs:297-345) — vectorized, the "early outs" are
lane masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from shader_ray_tpu.ops.scene import DeviceScene
from shader_ray_tpu.ops.vecmath import cross, dot

INFINITELY_FAR = 1.0e7       # fs:115
RANGE_T1 = 1.0e8             # make_range(0, 1e8), fs:463,491
MT_EPSILON = 1.0e-7          # fs:312


class SurfaceHit(NamedTuple):
    """Batched surface_hit (fs:108-113). ``bad`` lanes carry t = -1
    and uvw = (1,0,0) like set_bad_hit (fs:162-166)."""

    t: jnp.ndarray       # (R,) f32
    which: jnp.ndarray   # (R,) i32, -1 = none
    u: jnp.ndarray       # (R,) f32 barycentric (uvw = (1-u-v, u, v))
    v: jnp.ndarray       # (R,) f32
    bad: jnp.ndarray     # (R,) bool


def ray_octant(D: jnp.ndarray) -> jnp.ndarray:
    """Octant code from direction signs (fs:389-391): bit0 = x>0,
    bit1 = y>0, bit2 = z>0."""
    return (
        (D[..., 0] > 0.0).astype(jnp.int32)
        + 2 * (D[..., 1] > 0.0).astype(jnp.int32)
        + 4 * (D[..., 2] > 0.0).astype(jnp.int32)
    )


def _slab_test(boxes: jnp.ndarray, P: jnp.ndarray, D: jnp.ndarray):
    """range_intersect_box (fs:200-217) against prevr = (0, 1e8).

    boxes: (R, 8) with boxmin in [:, 0:3], boxmax in [:, 3:6].
    Division by a zero direction component produces +-inf which the
    min/max logic absorbs (same IEEE semantics the GL shader relies on).
    """
    bmin = boxes[:, 0:3]
    bmax = boxes[:, 3:6]
    ta = (bmin - P) / D
    tb = (bmax - P) / D
    lo = jnp.minimum(ta, tb)
    hi = jnp.maximum(ta, tb)
    t0 = jnp.maximum(lo.max(axis=-1), 0.0)
    t1 = jnp.minimum(hi.min(axis=-1), RANGE_T1)
    return t0, t1


def _tri_intersect(
    tri: jnp.ndarray,
    P: jnp.ndarray,
    D: jnp.ndarray,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    hit_t: jnp.ndarray,
    mt_eps: float,
):
    """Batched triangle_intersect (fs:297-345).

    tri: (R, 9) packed v0 v1 v2. Returns (accept, d, u, v).
    """
    v0 = tri[:, 0:3]
    v1 = tri[:, 3:6]
    v2 = tri[:, 6:9]
    e0 = v1 - v0
    e1 = v0 - v2
    M = cross(e1, D)
    det = dot(e0, M)
    ok = jnp.abs(det) >= mt_eps  # fs:313 rejects (-eps, eps)
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    T = P - v0
    Q = cross(T, e0)
    d = -dot(e1, Q) * inv_det
    ok = ok & (d <= hit_t) & (d >= t0) & (d <= t1)  # fs:324-329
    u = dot(T, M) * inv_det
    ok = ok & (u >= 0.0) & (u <= 1.0)               # fs:331-334
    v = dot(D, Q) * inv_det
    ok = ok & (v >= 0.0) & (u + v <= 1.0)           # fs:336-339
    return ok, d, u, v


def traverse(
    scene: DeviceScene,
    P: jnp.ndarray,
    D: jnp.ndarray,
    max_bvh_iterations: int = 400,
    max_leaf_tests: int = 10,
    mt_eps: float = MT_EPSILON,
    active: jnp.ndarray | None = None,
) -> SurfaceHit:
    """Trace a batch of object-space rays through the scene BVH.

    P, D: (R, 3) float32 (D need not be normalized — the reference
    traverses with the rotation-transformed, unnormalized object ray).
    ``active`` masks lanes out of the walk entirely (they return a
    miss) — used for dead bounce lanes and gated shadow rays.
    Returns the closest SurfaceHit per ray.
    """
    R = P.shape[0]
    n_nodes = scene.num_nodes
    i32 = jnp.int32

    octant_offset = ray_octant(D) * n_nodes  # (R,)
    root = jnp.full((R,), scene.tree_root, i32)
    if active is not None:
        root = jnp.where(active, root, -1)

    class _State(NamedTuple):
        g: jnp.ndarray            # current node, -1 done
        visits: jnp.ndarray       # node visit budget counter
        leaf_left: jnp.ndarray    # triangle tests remaining in leaf
        cursor: jnp.ndarray       # next triangle index
        leaf_t0: jnp.ndarray
        leaf_t1: jnp.ndarray
        hit_t: jnp.ndarray
        hit_which: jnp.ndarray
        hit_u: jnp.ndarray
        hit_v: jnp.ndarray
        bad: jnp.ndarray

    state = _State(
        g=root,
        visits=jnp.zeros((R,), i32),
        leaf_left=jnp.zeros((R,), i32),
        cursor=jnp.zeros((R,), i32),
        leaf_t0=jnp.zeros((R,), jnp.float32),
        leaf_t1=jnp.zeros((R,), jnp.float32),
        hit_t=jnp.full((R,), INFINITELY_FAR, jnp.float32),
        hit_which=jnp.full((R,), -1, i32),
        hit_u=jnp.zeros((R,), jnp.float32),
        hit_v=jnp.zeros((R,), jnp.float32),
        bad=jnp.zeros((R,), jnp.bool_),
    )

    # hard cap: every node visit can enqueue at most max_leaf_tests
    # triangle iterations, so the loop can't run past this
    iter_cap = max_bvh_iterations * (1 + max_leaf_tests)

    def cond(carry):
        i, s = carry
        return (i < iter_cap) & jnp.any((s.g >= 0) | (s.leaf_left > 0))

    def body(carry):
        i, s = carry
        in_leaf = s.leaf_left > 0

        # --- leaf lanes: test one triangle (fs:412-417, unrolled) ----
        tri = jnp.take(
            scene.tri_positions, jnp.maximum(s.cursor, 0), axis=0, mode="clip"
        )
        acc, d, u, v = _tri_intersect(
            tri, P, D, s.leaf_t0, s.leaf_t1, s.hit_t, mt_eps
        )
        take = in_leaf & acc
        hit_t = jnp.where(take, d, s.hit_t)
        hit_which = jnp.where(take, s.cursor, s.hit_which)
        hit_u = jnp.where(take, u, s.hit_u)
        hit_v = jnp.where(take, v, s.hit_v)
        cursor = jnp.where(in_leaf, s.cursor + 1, s.cursor)
        leaf_left = jnp.where(in_leaf, s.leaf_left - 1, s.leaf_left)

        # --- node lanes: advance one BVH node (fs:399-429) -----------
        node_active = (~in_leaf) & (s.g >= 0)
        safe_g = jnp.maximum(s.g, 0)
        boxes = jnp.take(scene.node_boxes, safe_g, axis=0, mode="clip")
        links = jnp.take(
            scene.hitmiss, safe_g + octant_offset, axis=0, mode="clip"
        )
        objects = jnp.take(scene.node_objects, safe_g, axis=0, mode="clip")
        t0, t1 = _slab_test(boxes, P, D)
        box_hit = (t0 < t1) & (t0 < hit_t)  # fs:403
        count = objects[:, 1]
        enter_leaf = node_active & box_hit & (count > 0)

        leaf_left = jnp.where(
            enter_leaf, jnp.minimum(count, max_leaf_tests), leaf_left
        )
        cursor = jnp.where(enter_leaf, objects[:, 0], cursor)
        leaf_t0 = jnp.where(enter_leaf, t0, s.leaf_t0)
        leaf_t1 = jnp.where(enter_leaf, t1, s.leaf_t1)

        next_g = jnp.where(box_hit, links[:, 0], links[:, 1])
        g = jnp.where(node_active, next_g, s.g)
        visits = s.visits + node_active.astype(i32)

        # traversal budget exhausted while still walking -> bad hit
        # (fs:436-438)
        overflow = (visits >= max_bvh_iterations) & (g >= 0)
        bad = s.bad | overflow
        hit_t = jnp.where(overflow, -1.0, hit_t)
        g = jnp.where(overflow, -1, g)
        leaf_left = jnp.where(overflow, 0, leaf_left)

        return (
            i + 1,
            _State(
                g=g,
                visits=visits,
                leaf_left=leaf_left,
                cursor=cursor,
                leaf_t0=leaf_t0,
                leaf_t1=leaf_t1,
                hit_t=hit_t,
                hit_which=hit_which,
                hit_u=hit_u,
                hit_v=hit_v,
                bad=bad,
            ),
        )

    _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), state))

    return SurfaceHit(
        t=final.hit_t,
        which=jnp.where(final.bad, -1, final.hit_which),
        u=final.hit_u,
        v=final.hit_v,
        bad=final.bad,
    )
