"""Engine facade: picks the device render path and builds frame fns.

Two engines, one contract (``fn(params) -> (H, W, 3)``):

* ``wavefront`` — pure-XLA per-lane engine (ops/render.py).  Exact
  GL-parity feature set including the debug/supersample modes.  Uses
  XLA gathers, which the axon TPU runtime compiles/executes
  pathologically — so it is the CPU/test engine.
* ``packet``    — Pallas packet megakernels + MXU env sampling
  (ops/engine_pallas.py).  The production TPU engine: the 8-wide
  short-stack kernel by default (binary hitmiss kept for A/B), full
  debug-mode set including textureGrad trilinear mips (which = 1).

``auto`` resolves per backend: tpu -> packet, else wavefront.
"""

from __future__ import annotations

import numpy as np

from shader_ray_tpu.config import Config, get_config
from shader_ray_tpu.models.world import SceneData
from shader_ray_tpu.ops.render import RenderStatics


def select_engine(cfg: Config | None = None) -> str:
    import jax

    cfg = cfg or get_config()
    if cfg.engine not in ("auto", ""):
        return cfg.engine
    return "packet" if jax.default_backend() == "tpu" else "wavefront"


class Renderer:
    """Owns the device-resident scene for the chosen engine and hands
    out jitted frame functions per static render config."""

    def __init__(
        self,
        data: SceneData,
        background: np.ndarray,
        config: Config | None = None,
        engine: str | None = None,
        mesh=None,
    ) -> None:
        import jax

        from shader_ray_tpu.utils.compcache import enable_compilation_cache

        cfg = config or get_config()
        self.cfg = cfg
        self.engine = engine or select_engine(cfg)
        self.mesh = mesh
        enable_compilation_cache()
        if cfg.debug_nans:
            # SURVEY 5.2: NaN sanitizer mode (the XLA analog of the
            # reference's -ffinite-math-only "NaNs are UB" posture,
            # inverted into a detector)
            jax.config.update("jax_debug_nans", True)
        if cfg.validate_scene:
            # SURVEY 5.2: structural index-bounds sanitizer — the
            # gather-free kernels are table-driven, so bounds are
            # checked where violations are attributable (pack time)
            from shader_ray_tpu.models.validate import validate_scene_data

            validate_scene_data(data)
        if self.engine == "packet":
            pack_kwargs = dict(
                env_size=(cfg.env_res, 2 * cfg.env_res),
                env_atlas_base=(cfg.env_mip_res, 2 * cfg.env_mip_res),
                # honor the configured leaf-test budget (reference
                # max_leaf_tests, fs:382) at pack time too — larger
                # BVH_LEAF_MAX builds need matching slot capacity
                max_leaf_tests=cfg.max_leaf_tests,
            )
            if cfg.packet_kernel == "wide":
                from shader_ray_tpu.ops.pallas.pack_wide import pack_scene_wide

                self.packed = pack_scene_wide(
                    data, background,
                    node_src=cfg.node_src or None,
                    collapse=cfg.collapse,
                    isect=cfg.leaf_isect,
                    env_mode=cfg.env_mode,
                    env_base=cfg.env_base,
                    **pack_kwargs,
                )
            else:
                from shader_ray_tpu.ops.pallas.pack import pack_scene

                self.packed = pack_scene(data, background, **pack_kwargs)
            self.scene = None
        elif self.engine == "wavefront":
            from shader_ray_tpu.ops.scene import upload_scene

            self.scene = upload_scene(data, background)
            self.packed = None
            if mesh is not None:
                from shader_ray_tpu.parallel import replicate_scene

                self.scene = replicate_scene(self.scene, mesh)
        else:
            raise ValueError(f"unknown engine {self.engine!r}")

    def _cfg_wrap(self, fn, label: str = "frame fn", statics=None):
        """Run ``fn`` with this renderer's config installed as the
        process config: kernel knobs read from the global at TRACE
        time (walk_pops, leaf_scan) must honor ``self.cfg`` even when
        it is not the process instance (autotune candidates, custom
        Renderer configs).  A compile/launch failure gets the C24
        CheckShaderCompile-analog dump (utils/kerneldiag.py) — kernel
        name, knobs, table shapes, actionable hint — before re-raising
        (ray.cpp:187-235 dumps source + info log on failure)."""
        from shader_ray_tpu.config import use_config
        from shader_ray_tpu.utils.kerneldiag import report_failure

        def wrapped(*a, **k):
            with use_config(self.cfg):
                try:
                    return fn(*a, **k)
                except Exception as e:
                    report_failure(
                        e, cfg=self.cfg, packed=self.packed,
                        statics=statics, label=label,
                    )
                    raise

        return wrapped

    def make_fn(self, statics: RenderStatics):
        if self.engine == "packet":
            import jax

            from shader_ray_tpu.ops.engine_pallas import make_packet_render_fn

            return self._cfg_wrap(make_packet_render_fn(
                self.packed, statics,
                tile=self.cfg.ray_tile,
                # Mosaic is TPU-only; elsewhere (CPU test meshes) the
                # kernel runs under the Pallas interpreter
                interpret=jax.default_backend() != "tpu",
                interleave=self.cfg.packet_interleave,
                max_steps=self.cfg.packet_max_steps or None,
                mesh=self.mesh,
                leaf_mode=self.cfg.leaf_mode or None,
                fused=self.cfg.packet_fused,
            ), label="packet frame fn", statics=statics)
        if self.mesh is not None:
            from shader_ray_tpu.parallel import make_sharded_render_fn

            return make_sharded_render_fn(self.scene, statics, self.mesh)
        from shader_ray_tpu.ops.render import make_render_fn

        return make_render_fn(self.scene, statics)

    def make_checksum_fn(self, statics: RenderStatics):
        """Jitted ``fn(params) -> scalar frame checksum`` — the honest
        benchmark fence on the axon runtime (block_until_ready lies and
        full-frame D2H times the tunnel).  The scene is threaded as a
        jit ARGUMENT (re-jitting over make_fn's wrapper would capture
        the device arrays as closure constants feeding a pallas_call —
        the documented axon compile-stall pattern)."""
        import functools

        import jax
        import jax.numpy as jnp

        if self.engine == "packet":
            from shader_ray_tpu.ops.engine_pallas import render_frame_packet

            interpret = jax.default_backend() != "tpu"

            @functools.partial(jax.jit, static_argnames=("statics_",))
            def _fn(packed_, params, statics_):
                return jnp.sum(render_frame_packet(
                    packed_, params, statics_,
                    tile=self.cfg.ray_tile, interpret=interpret,
                    interleave=self.cfg.packet_interleave,
                    max_steps=self.cfg.packet_max_steps or None,
                    mesh=self.mesh,
                    leaf_mode=self.cfg.leaf_mode or None,
                    fused=self.cfg.packet_fused,
                ))

            return self._cfg_wrap(
                lambda params: _fn(self.packed, params, statics),
                label="packet checksum fn", statics=statics,
            )

        from shader_ray_tpu.ops.render import render_frame

        @functools.partial(jax.jit, static_argnames=("statics_",))
        def _fn(scene_, params, statics_):
            return jnp.sum(render_frame(scene_, params, statics_))

        return lambda params: _fn(self.scene, params, statics)

    def make_progressive_fn(
        self, statics: RenderStatics, samples: int, reduce_sum: bool = False
    ):
        """Jitted ``fn(params) -> (H, W, 3)`` averaging ``samples``
        Halton-jittered frames.  On the packet engine the whole batch
        runs in ONE dispatch (device scan) — the per-dispatch host
        round-trip is paid once per batch, not once per sample.
        ``reduce_sum`` returns the frame checksum instead (benchmark
        fencing without a second dispatch).  Returns None when the
        engine has no device-batched path (the caller falls back to a
        host loop)."""
        if self.engine != "packet":
            return None
        import functools

        import jax
        import jax.numpy as jnp

        from shader_ray_tpu.ops.engine_pallas import render_progressive_packet
        from shader_ray_tpu.utils.halton import halton

        jitters = jnp.asarray(
            [[halton(s + 1, 2) - 0.5, halton(s + 1, 3) - 0.5]
             for s in range(samples)],
            jnp.float32,
        )
        interpret = jax.default_backend() != "tpu"
        kernel_kwargs = dict(
            tile=self.cfg.prog_tile or self.cfg.ray_tile,
            interpret=interpret,
            interleave=self.cfg.packet_interleave,
            max_steps=self.cfg.packet_max_steps or None,
            leaf_mode=self.cfg.leaf_mode or None,
            fused=self.cfg.packet_fused,
            jitter_pack=self.cfg.jitter_pack,
        )

        if self.mesh is not None and samples % self.mesh.devices.size == 0:
            # SAMPLE-parallel scale-out: shard the jitter batch over
            # the mesh — each chip renders K/n full frames on the fast
            # single-chip path (laned raygen + jitter packing stay
            # enabled, unlike ray sharding which disables prefolding),
            # then ONE pmean of the (H*W, 3) linear accumulation rides
            # ICI.  Communication per chip is a single frame buffer
            # per BATCH (vs per frame for ray sharding's output
            # all-gather), and traversal work shards perfectly since
            # samples are independent (SURVEY.md 5.7).
            from jax.sharding import PartitionSpec as P

            from shader_ray_tpu.ops.shading import tonemap_and_gamma

            axis = self.mesh.axis_names[0]
            inner = statics._replace(do_tonemap=False)

            def _shard_body(packed_, jitters_, params):
                acc = render_progressive_packet(
                    packed_, params, inner, jitters_, mesh=None,
                    **kernel_kwargs,
                )
                # per-device mean over K/n samples -> global mean
                return jax.lax.pmean(acc, axis)

            sharded = jax.shard_map(
                _shard_body,
                mesh=self.mesh,
                in_specs=(P(), P(axis), P()),
                out_specs=P(),
                check_vma=False,
            )

            @functools.partial(jax.jit, static_argnames=("rsum",))
            def _sfn(packed_, jitters_, params, rsum):
                acc = sharded(packed_, jitters_, params)
                if statics.do_tonemap:
                    acc = tonemap_and_gamma(acc, statics.use_filmic)
                return jnp.sum(acc) if rsum else acc

            return self._cfg_wrap(lambda params: _sfn(
                self.packed, jitters, params, reduce_sum
            ), label=f"sample-sharded progressive fn (K={samples})",
               statics=statics)

        @functools.partial(jax.jit, static_argnames=("statics_", "rsum"))
        def _fn(packed_, jitters_, params, statics_, rsum):
            out = render_progressive_packet(
                packed_, params, statics_, jitters_,
                mesh=self.mesh,
                **kernel_kwargs,
            )
            return jnp.sum(out) if rsum else out

        return self._cfg_wrap(lambda params: _fn(
            self.packed, jitters, params, statics, reduce_sum
        ), label=f"progressive fn (K={samples})", statics=statics)

    def make_stats_fn(self, statics: RenderStatics):
        """Jitted ``fn(params) -> (n_tiles, 13)`` per-phase walk
        counters from the fused megakernel (col 0 cast rays; cols
        1+2p / 2+2p = phase p's walk steps / leaf visits — SURVEY 5.5
        observability).  None when the engine has no fused path."""
        import functools

        import jax

        from shader_ray_tpu.ops.pallas.pack_wide import PackedSceneWide

        if self.engine != "packet" or not isinstance(
            self.packed, PackedSceneWide
        ):
            return None

        from shader_ray_tpu.ops.engine_pallas import _pack_uniforms
        from shader_ray_tpu.ops.pallas.packet_mega import packet_shade
        from shader_ray_tpu.ops.render import generate_rays

        interpret = jax.default_backend() != "tpu"

        @functools.partial(jax.jit, static_argnames=("statics_",))
        def _fn(packed_, params, statics_):
            rays, _ = generate_rays(statics_, params)
            res = packet_shade(
                packed_, rays.P, rays.D, None, None,
                _pack_uniforms(params),
                tile=self.cfg.ray_tile,
                max_steps=self.cfg.packet_max_steps or None,
                mt_eps=statics_.mt_eps,
                bounce_count=statics_.bounce_count,
                cast_shadows=statics_.cast_shadows,
                enable_diffuse=statics_.enable_diffuse,
                surface_fudge=statics_.surface_fudge,
                leaf_mode=self.cfg.leaf_mode or "scalar",
                interpret=interpret,
            )
            return res.stats

        return self._cfg_wrap(
            lambda params: _fn(self.packed, params, statics),
            label="stats fn", statics=statics,
        )

    def make_count_fn(self, statics: RenderStatics):
        """Jitted ``fn(params) -> rays actually cast`` for one frame:
        the honest Mrays/s denominator (alive bounce rays + shadow rays
        from lit hits), vs the W*H*6 potential-ray upper bound."""
        import functools

        import jax

        from shader_ray_tpu.ops.render import generate_rays

        if self.engine == "packet":
            from shader_ray_tpu.ops.engine_pallas import trace_rays_packet

            interpret = jax.default_backend() != "tpu"

            @functools.partial(jax.jit, static_argnames=("statics_",))
            def _fn(packed_, params, statics_):
                rays, _ = generate_rays(statics_, params)
                _, cast = trace_rays_packet(
                    packed_, rays, params, statics_,
                    tile=self.cfg.ray_tile, interpret=interpret,
                    interleave=self.cfg.packet_interleave,
                    max_steps=self.cfg.packet_max_steps or None,
                    with_counts=True,
                    leaf_mode=self.cfg.leaf_mode or None,
                    fused=self.cfg.packet_fused,
                )
                return cast

            return self._cfg_wrap(
                lambda params: _fn(self.packed, params, statics),
                label="cast-count fn", statics=statics,
            )

        from shader_ray_tpu.ops.render import trace_rays

        @functools.partial(jax.jit, static_argnames=("statics_",))
        def _fn(scene_, params, statics_):
            rays, _ = generate_rays(statics_, params)
            _, cast = trace_rays(
                scene_, rays, params, statics_, with_counts=True
            )
            return cast

        return lambda params: _fn(self.scene, params, statics)
