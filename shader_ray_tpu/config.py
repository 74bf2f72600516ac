"""Configuration for scene build and render.

The reference scatters knobs over three tiers (SURVEY.md section 5.6):
argv, env vars read in __attribute__((constructor)) initializers
(reference bvh.cpp:60-79, trisrc-support.cpp:29-40, ray.cpp:360-364),
and compile-time constants (raytracer.es.fs:380-384,550; ray.cpp:326).
Here they live in one dataclass; the env-var names are preserved
verbatim so existing workflows port unchanged.
"""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v is not None else default


def _env_float(name: str, default: float) -> float:
    v = os.environ.get(name)
    return float(v) if v is not None else default


@dataclasses.dataclass
class Config:
    # --- BVH build knobs (reference bvh.cpp:28,32,57-58; env 60-79) ---
    bvh_leaf_max: int = 10          # leaf size at/below which a leaf is made
    bvh_max_depth: int = 30         # no nodes below this depth
    sah_ctrav: float = 1.0          # SAH traversal cost
    sah_cisec: float = 4.0          # SAH intersection cost

    # --- loader knobs (reference trisrc-support.cpp:24-40) ---
    colors_are_linear: bool = False  # skip pow(c, 2.63) gamma decode
    geometry_scale: float = 1.0      # positions scaled at parse time
    screen_gamma: float = 2.63       # reference trisrc-support.cpp:24

    # --- render kernel constants (reference raytracer.es.fs) ---
    bounce_count: int = 3            # fs:550
    max_bvh_iterations: int = 400    # fs:381 (node visits per traversal)
    max_leaf_tests: int = 10         # fs:382 (triangle tests per leaf visit)
    cast_shadows: bool = True        # fs:445
    use_filmic: bool = True          # fs:524
    do_tonemap: bool = True          # fs:525
    mt_epsilon: float = 1e-7         # Moller-Trumbore det epsilon, fs:312
    infinitely_far: float = 1e7      # fs:115
    surface_fudge: float = 1e-4      # reflect origin offset, fs:87

    # --- app defaults (reference ray.cpp) ---
    window_width: int = 512          # ray.cpp:969
    window_height: int = 512
    fov_degrees: float = 40.0        # ray.cpp:1078

    # --- TPU engine knobs (new; no reference analog) ---
    engine: str = "auto"             # "packet" | "wavefront" | "auto"
    packet_kernel: str = "wide"      # "wide" (8-ary short-stack) | "binary"
    leaf_mode: str = "dma2"          # wide-kernel leaf data path: "dma2"
                                     # double-buffered SMEM leaf groups
                                     # (28.6 vs scalar's 32.4 ms r2) |
                                     # "scalar" | "dma" | "dmastatic"
    node_src: str = ""               # wide node tables: "" auto | "smem" | "vmem"
    leaf_scan: str = ""              # hit-leaf iteration: "" auto (queue on
                                     # the vmem node tier where it measured
                                     # ~2.5% faster, ctz otherwise) | "ctz"
                                     # per-visit bit-scan | "queue" SMEM meta
                                     # queues filled during the push pass
    leaf_isect: str = "woop"         # leaf intersector/record format:
                                     # "woop" precomputed unit-tri affine
                                     # (measured 38.1 vs 39.9 ms r2) |
                                     # "mt" raw-vertex Moller-Trumbore
    collapse: str = "sah"            # wide collapse: "sah" DP | "greedy"
    splits: str = "object"           # binary build: "object" (reference
                                     # algorithm, bit-compatible with
                                     # native libscene) | "sbvh" spatial
                                     # splits (Stich 2009; duplicated
                                     # clipped refs, models/sbvh.py)
    bvh_opt: str = ""                # post-build topology optimizer:
                                     # "" none (reference-exact tree) |
                                     # "reinsert" Bittner-2013 insertion
                                     # optimization (models/optimize.py);
                                     # leaf contents unchanged, internal
                                     # topology re-arranged for lower SAH
    env_mode: str = "window"         # packet-engine env sampler: "window"
                                     # per-tile footprint windows over the
                                     # full-res plane pyramid (envwin.py) |
                                     # "dense" MXU one-hot over a
                                     # downsampled table (envmxu.py)
    env_base: int = 1024             # windowed-sampler pyramid base height
                                     # (level-0 rows; W = 2H)
    env_res: int = 256               # mode-0 env sampling height (W = 2H);
                                     # dense-MXU cost scales with H*W
    env_mip_res: int = 512           # mode-1 (textureGrad) atlas base height
    env_aniso: int = 4               # which=1 anisotropy probes (GL
                                     # MAX_ANISOTROPY 4, ray.cpp:505-508);
                                     # 1 = isotropic trilinear
    ray_tile: int = 4096             # rays per Pallas grid step (best with
                                     # multi-pop walks; 2048 was best at pops=1)
    jitter_pack: int = 2             # progressive batches: jitter samples of
                                     # the SAME pixel block packed per kernel
                                     # tile (their BVH footprints coincide, so
                                     # walk/leaf fixed costs amortize over S
                                     # frames; bunny bench 27.8 -> 21.8 ms at
                                     # S=2; S=4 measured worse, 23.2)
    prog_tile: int = 2048            # pixel-block size for progressive
                                     # batches (kernel tile = jitter_pack *
                                     # prog_tile lanes): the packed union
                                     # shrinks with the block while lane
                                     # width stays full — 2048 beats 4096 on
                                     # every scene (bunny 21.4 -> 19.5,
                                     # terrain 241 -> 194, 340k 56 -> 47 ms);
                                     # single frames keep ray_tile (2048
                                     # measured worse unpacked).  0 = ray_tile
    packet_fused: bool = True        # fuse bounce+shadow pipeline into ONE
                                     # pallas_call (kernel_mega); wide only
    kernel_raygen: bool = True       # packed progressive: generate primary
                                     # rays INSIDE the megakernel from
                                     # closed-form pixel coords (no
                                     # superframe ray arrays in HBM —
                                     # required for deep jitter packing,
                                     # S*W*H rays would be GBs at S>=256)
    kernel_envfuse: bool = True      # packed progressive: sample the env,
                                     # combine, and reduce jitter copies
                                     # IN-KERNEL (kernel_mega envfuse) —
                                     # no per-ray outputs either; a single
                                     # (S*W*H, 3) output crosses 2^31
                                     # bytes at S=256 and crashes the TPU
                                     # compile helper
    packet_interleave: int = 1       # interleaved sub-packet walks per step
                                     # (unfused kernels only)
    walk_pops: int = 4               # stack entries popped per walk step
                                     # (1/2/4); one scalar sync serves all
                                     # their children (4 measured best)
    min_contrib: float = 0.0         # throughput cutoff (fused megakernel):
                                     # retire bounce lanes whose Schlick
                                     # modulation max-component falls at/
                                     # below this — their env term then uses
                                     # the current direction (the escape-now
                                     # result), so the per-pixel error is
                                     # bounded by min_contrib * max radiance.
                                     # The reference always runs 3 bounces
                                     # (fs:550); 0 = reference-exact.  Lane
                                     # retirement shrinks the packet's
                                     # traversal union, so dielectric scenes
                                     # (mod ~ F0^2 ~ 0.0025 by bounce 2) skip
                                     # most bounce-2 walk/leaf work at
                                     # thresholds far below 8-bit visibility
    packet_max_steps: int = 0        # packet walk budget; 0 = 2*nodes+2
    debug_nans: bool = False         # jax_debug_nans (SURVEY 5.2 sanitizer)
    validate_scene: bool = False     # structural index-bounds sanitizer
                                     # at scene upload (SURVEY 5.2)
    scene_cache: bool = True         # cache compiled scenes (SURVEY 5.4)
    use_native: str = "auto"         # "auto" | "never" | "require" C++ libscene

    # choice sets shared by from_env and live edits (App.set_knob)
    _CHOICES = {
        "engine": ("auto", "packet", "wavefront"),
        "packet_kernel": ("wide", "binary"),
        "leaf_mode": ("", "scalar", "dma", "dma2", "dmastatic"),
        "node_src": ("", "smem", "vmem"),
        "leaf_scan": ("", "ctz", "queue"),
        "leaf_isect": ("mt", "woop"),
        "collapse": ("sah", "greedy"),
        "env_mode": ("window", "dense"),
        "splits": ("object", "sbvh"),
        "bvh_opt": ("", "reinsert"),
        "use_native": ("auto", "never", "require"),
    }

    def validate(self) -> "Config":
        """Normalize + range/choice-check every knob.  Shared by
        from_env and live edits (App.set_knob) so a type-valid but
        out-of-range value fails here with a clear message instead of
        as a Mosaic assertion deep inside kernel construction."""
        if self.leaf_scan == "auto":
            self.leaf_scan = ""
        for name, choices in self._CHOICES.items():
            v = getattr(self, name)
            if v not in choices:
                raise ValueError(f"{name}={v!r}: use one of {choices}")
        if self.walk_pops not in (1, 2, 4):
            raise ValueError(
                f"walk_pops={self.walk_pops} invalid: the wide walker "
                "pops 1, 2, or 4 stack entries per step"
            )
        if self.min_contrib < 0.0:
            raise ValueError(
                f"min_contrib={self.min_contrib} invalid: need >= 0"
            )
        if self.jitter_pack < 1:
            raise ValueError(
                f"jitter_pack={self.jitter_pack} invalid: need >= 1"
            )
        if self.env_base < 16 or self.env_base & (self.env_base - 1):
            raise ValueError(
                f"env_base={self.env_base} invalid: the plane pyramid "
                "needs a power-of-two base height >= 16"
            )
        c = self.ray_tile // 8
        if self.ray_tile % 1024 or c & (c - 1):
            raise ValueError(
                f"ray_tile={self.ray_tile} invalid: the packet kernels "
                "need a power-of-two multiple of 1024"
            )
        if self.prog_tile:
            c = self.prog_tile // 8
            if self.prog_tile % 8 or c & (c - 1) or self.prog_tile < 64:
                raise ValueError(
                    f"prog_tile={self.prog_tile} invalid: need a "
                    "power-of-two multiple of 8, >= 64 (the engine's "
                    "FOLD-sublane floor; sub-1024 blocks only take "
                    "effect jitter-packed — unpacked dispatches round "
                    "up to the 1024-lane kernel minimum)"
                )
        return self

    @staticmethod
    def from_env() -> "Config":
        c = Config()
        c.bvh_max_depth = _env_int("BVH_MAX_DEPTH", c.bvh_max_depth)
        c.bvh_leaf_max = _env_int("BVH_LEAF_MAX", c.bvh_leaf_max)
        c.sah_ctrav = _env_float("SAH_CTRAV", c.sah_ctrav)
        c.max_leaf_tests = _env_int("SRT_MAX_LEAF_TESTS", c.max_leaf_tests)
        c.sah_cisec = _env_float("SAH_CISEC", c.sah_cisec)
        c.colors_are_linear = os.environ.get("COLORS_ARE_LINEAR") is not None
        c.geometry_scale = _env_float("GEOMETRY_SCALE", c.geometry_scale)
        if os.environ.get("SRT_ENGINE"):
            c.engine = os.environ["SRT_ENGINE"]
        if os.environ.get("SRT_PACKET_KERNEL"):
            c.packet_kernel = os.environ["SRT_PACKET_KERNEL"]
        if os.environ.get("SRT_LEAF_MODE"):
            c.leaf_mode = os.environ["SRT_LEAF_MODE"]
        if os.environ.get("SRT_NODE_SRC"):
            c.node_src = os.environ["SRT_NODE_SRC"]
        c.leaf_scan = os.environ.get("SRT_LEAF_SCAN", c.leaf_scan)
        c.leaf_isect = os.environ.get("SRT_ISECT", c.leaf_isect)
        c.collapse = os.environ.get("SRT_COLLAPSE", c.collapse)
        c.splits = os.environ.get("SRT_SPLITS", c.splits)
        c.bvh_opt = os.environ.get("SRT_BVH_OPT", c.bvh_opt)
        c.env_mode = os.environ.get("SRT_ENV_MODE", c.env_mode)
        c.env_base = _env_int("SRT_ENV_BASE", c.env_base)
        c.env_res = _env_int("SRT_ENV_RES", c.env_res)
        c.env_mip_res = _env_int("SRT_ENV_MIP_RES", c.env_mip_res)
        c.env_aniso = _env_int("SRT_ENV_ANISO", c.env_aniso)
        c.ray_tile = _env_int("SRT_RAY_TILE", c.ray_tile)
        c.jitter_pack = _env_int("SRT_JITTER_PACK", c.jitter_pack)
        c.prog_tile = _env_int("SRT_PROG_TILE", c.prog_tile)
        c.packet_fused = _env_int("SRT_FUSED", int(c.packet_fused)) != 0
        c.kernel_raygen = (
            _env_int("SRT_KERNEL_RAYGEN", int(c.kernel_raygen)) != 0
        )
        c.kernel_envfuse = (
            _env_int("SRT_KERNEL_ENVFUSE", int(c.kernel_envfuse)) != 0
        )
        c.packet_interleave = _env_int("SRT_INTERLEAVE", c.packet_interleave)
        c.walk_pops = _env_int("SRT_POPS", c.walk_pops)
        c.min_contrib = _env_float("SRT_MIN_CONTRIB", c.min_contrib)
        c.packet_max_steps = _env_int("SRT_MAX_STEPS", c.packet_max_steps)
        c.debug_nans = os.environ.get("SRT_DEBUG_NANS") is not None
        c.validate_scene = os.environ.get("SRT_VALIDATE") is not None
        if os.environ.get("SRT_NATIVE"):
            c.use_native = os.environ["SRT_NATIVE"]
        return c.validate()


_config: Config | None = None


def get_config() -> Config:
    """Process-wide config, initialized from env on first use."""
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config


def set_config(c: Config) -> None:
    global _config
    _config = c


@contextmanager
def use_config(c: Config):
    """Install ``c`` as the process config for the duration.  The
    Renderer wraps every returned frame fn with this so kernel knobs
    that are read from the global config at TRACE time (walk_pops,
    leaf_scan — they live below several layers of call plumbing) honor
    the renderer's own config instance, not whatever the process
    global happens to be when the jit first executes."""
    global _config
    old = _config
    _config = c
    try:
        yield
    finally:
        _config = old
