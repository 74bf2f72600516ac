"""Interaction state machine + frame dispatch.

The TPU-native counterpart of the reference's GLFW app state
(ray.cpp:719-943, 1076-1148): the same keyboard/mouse semantics drive
a jitted frame function instead of a GL draw.  Damage-driven exactly
like the reference (`redraw_window` flag, ray.cpp:1132-1142): state
changes mark the frame dirty; ``render()`` recomputes only then.

Per-frame dynamic state (matrices, light, material colors, fov) feeds
the jitted function as traced arguments, so no interaction path ever
recompiles — matching the GL program compiled once at init
(ray.cpp:408-433) with uniforms set per draw (ray.cpp:648-704).
Changing ``which`` (debug render mode) swaps to a differently-shaped
program, so it jits per mode — the cache below keeps each compiled
mode alive.
"""

from __future__ import annotations

import sys
import time
from enum import Enum

import jax.numpy as jnp
import numpy as np

from shader_ray_tpu.app import camera as cam
from shader_ray_tpu.app.materials import DIFFUSE_COLORS, MATERIALS, resolve_material
from shader_ray_tpu.config import Config, get_config
from shader_ray_tpu.models.world import World
from shader_ray_tpu.ops.render import FrameParams, RenderStatics
from shader_ray_tpu.ops.scene import DeviceScene
from shader_ray_tpu.utils import mat4
from shader_ray_tpu.utils.ppm import write_ppm


class MotionTarget(Enum):
    """What a mouse drag moves (reference enum ray.cpp:724-727)."""

    OBJECT = 0
    LIGHT = 1


class App:
    def __init__(
        self,
        world: World,
        renderer,
        config: Config | None = None,
        width: int | None = None,
        height: int | None = None,
    ) -> None:
        cfg = config or get_config()
        self.cfg = cfg
        self.world = world
        if isinstance(renderer, DeviceScene):
            # accept a raw uploaded scene: wrap in a wavefront renderer
            from shader_ray_tpu.engine import Renderer

            shim = Renderer.__new__(Renderer)
            shim.cfg = cfg
            shim.engine = "wavefront"
            shim.mesh = None
            shim.scene = renderer
            shim.packed = None
            renderer = shim
        self.renderer = renderer
        self.width = width or cfg.window_width
        self.height = height or cfg.window_height

        # interaction state (reference globals, ray.cpp:35-74,724-727)
        self.fov = mat4.to_radians(cfg.fov_degrees)
        self.zoom = cam.initial_zoom(world.scene_extent, self.fov)
        self.object_rotation = np.zeros(4, dtype=np.float32)
        self.object_position = np.zeros(3, dtype=np.float32)
        self.light_rotation = cam.initial_light_rotation()
        self.light_dir = np.zeros(3, dtype=np.float32)
        self.which = 0
        self.which_material = 0
        self.which_diffuse_color = 0
        self.motion_target = MotionTarget.OBJECT
        self.redraw = True
        self.quit = False
        self.do_benchmark = False

        # mouse state (ray.cpp:862-918)
        self._button_pressed = False
        self._shift_pressed = False
        self._ox = 0.0
        self._oy = 0.0
        self._motion_reported = False

        self._fn_cache: dict[int, object] = {}
        self._frame: np.ndarray | None = None

        cam.update_view_params(
            self.world, self.zoom, self.object_rotation, self.object_position
        )
        self.light_dir = cam.update_light(self.light_rotation)

    # --- frame dispatch (reference DrawFrame, ray.cpp:591-717) --------

    def _statics(self) -> RenderStatics:
        return RenderStatics.from_config(
            self.cfg,
            width=self.width,
            height=self.height,
            which=self.which,
        )

    def _render_fn(self):
        key = (self.which, self.width, self.height)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self.renderer.make_fn(self._statics())
            self._fn_cache[key] = fn
        return fn

    def frame_params(self) -> FrameParams:
        spec, diff = resolve_material(self.which_material, self.which_diffuse_color)
        w = self.world
        return FrameParams(
            camera_matrix=jnp.asarray(w.camera_matrix),
            camera_normal_matrix=jnp.asarray(w.camera_normal_matrix),
            object_matrix=jnp.asarray(w.object_matrix),
            object_normal_matrix=jnp.asarray(w.object_normal_matrix),
            object_normal_inverse=jnp.asarray(w.object_normal_inverse),
            light_dir=jnp.asarray(self.light_dir),
            specular_color=jnp.asarray(spec),
            diffuse_color=jnp.asarray(diff),
            image_plane_width=jnp.asarray(
                2.0 * np.tan(self.fov / 2.0), jnp.float32
            ),
        )

    def draw_frame(self) -> np.ndarray:
        out = self._render_fn()(self.frame_params())
        out.block_until_ready()
        self._frame = np.asarray(out)
        return self._frame

    def render(self) -> np.ndarray | None:
        """Damage-driven render: computes a frame only if state changed
        since the last one (ray.cpp:1132-1142)."""
        if not self.redraw and self._frame is not None:
            return None
        frame = self.draw_frame()
        self.redraw = False
        return frame

    def render_progressive(self, samples: int = 4) -> np.ndarray:
        """Progressive accumulation: average ``samples`` sub-pixel
        jittered frames in linear space, tonemap once (SURVEY.md 5.7
        progressive-refinement design; the reference renders 1 spp).
        Uses a Halton (2,3) jitter sequence for even coverage."""
        import jax.numpy as jnp

        # device-batched path: the packet engine renders the whole
        # sample batch in one dispatch (engine.make_progressive_fn)
        if hasattr(self.renderer, "make_progressive_fn"):
            key = ("progressive-batch", samples, self.which, self.width, self.height)
            bfn = self._fn_cache.get(key)
            if bfn is None and key not in self._fn_cache:
                bfn = self.renderer.make_progressive_fn(self._statics(), samples)
                self._fn_cache[key] = bfn
            if bfn is not None:
                self._frame = np.asarray(bfn(self.frame_params()))
                self.redraw = False
                return self._frame

        from shader_ray_tpu.utils.halton import halton

        statics = self._statics()._replace(do_tonemap=False)
        key = ("progressive", self.which, self.width, self.height)
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self.renderer.make_fn(statics)
            self._fn_cache[key] = fn

        acc = None
        base = self.frame_params()
        for s in range(samples):
            jx = halton(s + 1, 2) - 0.5
            jy = halton(s + 1, 3) - 0.5
            params = base._replace(
                pixel_jitter=jnp.asarray([jx, jy], jnp.float32)
            )
            frame = np.asarray(fn(params))
            acc = frame if acc is None else acc + frame
        linear = acc / samples
        from shader_ray_tpu.ops.shading import tonemap_and_gamma

        self._frame = np.asarray(
            tonemap_and_gamma(jnp.asarray(linear), self.cfg.use_filmic)
        )
        self.redraw = False
        return self._frame

    # --- screenshot (reference ray.cpp:730-787, 's' key) --------------

    def walk_stats(self, file=sys.stdout) -> np.ndarray | None:
        """Render once with the megakernel's per-phase counters and
        print steps / leaf visits per packet for each bounce and
        shadow walk (SURVEY 5.5 observability; no reference analog —
        the GL driver has no traversal introspection)."""
        fn = self.renderer.make_stats_fn(self._statics())
        if fn is None:
            print("walk stats need the fused packet engine", file=file)
            return None
        from shader_ray_tpu.ops.pallas.packet_mega import stats_phases

        s = np.asarray(fn(self.frame_params()))
        n = s.shape[0]
        statics = self._statics()
        # phase labels mirror the kernel's emission condition exactly
        # (shadow phases exist iff cast_shadows AND enable_diffuse)
        phases = stats_phases(
            statics.bounce_count, statics.cast_shadows,
            statics.enable_diffuse,
        )
        print(f"packets={n} rays_cast={s[:, 0].sum()}", file=file)
        for p, name in enumerate(phases):
            st, lf = s[:, 1 + 2 * p], s[:, 2 + 2 * p]
            print(
                f"{name}: steps/pkt {st.mean():6.1f} (max {st.max():4d})"
                f"  leafs/pkt {lf.mean():6.1f} (max {lf.max():4d})",
                file=file,
            )
        return s

    def tune(self, samples: int = 32, file=sys.stdout) -> dict | None:
        """Autotune the packet engine's schedule knobs for THIS scene
        on the live device (utils/autotune.py) and apply the winner to
        the session config; results persist next to the scene cache
        (``scene_key``).  No reference analog — the GL pipeline has no
        tunable schedule."""
        if self.renderer.engine != "packet":
            print("autotune needs the packet engine", file=file)
            return None
        from shader_ray_tpu.utils.autotune import autotune

        best, results = autotune(
            self.renderer, self._statics(), self.frame_params(),
            samples=samples, key=getattr(self, "scene_key", None),
        )
        for tag, ms in sorted(results.items(), key=lambda kv: kv[1]):
            print(f"{ms:9.2f} ms/frame  {tag}", file=file)
        print(f"applied: {best}", file=file)
        # tuned knobs change the compiled programs — drop cached fns
        self._fn_cache.clear()
        return best

    # knobs consumed when the scene is PACKED (Renderer construction) —
    # setting them live cannot affect the already-packed session
    _PACK_TIME_KNOBS = frozenset({
        "bvh_leaf_max", "bvh_max_depth", "sah_ctrav", "sah_cisec",
        "colors_are_linear", "geometry_scale", "screen_gamma",
        "collapse", "splits", "bvh_opt", "leaf_isect", "env_res",
        "env_mip_res", "node_src",
        "engine", "packet_kernel", "use_native", "scene_cache",
    })

    def set_knob(self, name: str, value: str, file=sys.stdout) -> bool:
        """Set a Config knob on the live session by field name (REPL
        ``set NAME VALUE``), coercing the string to the field's type.
        Trace-time knobs (walk_pops, leaf_mode, min_contrib, ...) take
        effect on the next render — cached frame fns are dropped, like
        ``tune`` — while pack-time knobs only warn (they need a scene
        reload).  No reference analog beyond its env-var tier
        (SURVEY.md section 5.6); this is the interactive face of the
        same config system."""
        import dataclasses

        fields = {f.name for f in dataclasses.fields(type(self.cfg))}
        if name not in fields:
            print(
                f"unknown knob {name!r}; knobs: {', '.join(sorted(fields))}",
                file=file,
            )
            return False
        cur = getattr(self.cfg, name)
        typ = bool if isinstance(cur, bool) else type(cur)
        try:
            if typ is bool:
                low = value.lower()
                if low in ("1", "true", "on", "yes"):
                    val = True
                elif low in ("0", "false", "off", "no"):
                    val = False
                else:
                    raise ValueError(value)
            else:
                val = typ(value)
        except ValueError:
            print(f"cannot parse {value!r} as {typ.__name__}", file=file)
            return False
        setattr(self.cfg, name, val)
        try:
            # same range/choice checks as env parsing — a type-valid
            # but invalid value must fail HERE, not as a Mosaic
            # assertion deep in kernel construction
            self.cfg.validate()
        except ValueError as e:
            setattr(self.cfg, name, cur)
            print(str(e), file=file)
            return False
        val = getattr(self.cfg, name)  # validate() may normalize
        # the Renderer traces under its OWN config instance (it may be
        # a copy, e.g. bench/autotune) — keep it in step
        rcfg = getattr(self.renderer, "cfg", None)
        if rcfg is not None and rcfg is not self.cfg:
            setattr(rcfg, name, val)
        self._fn_cache.clear()
        self.redraw = True
        note = (
            "  (pack-time knob: takes effect after a scene reload)"
            if name in self._PACK_TIME_KNOBS
            else ""
        )
        print(f"{name} = {val}{note}", file=file)
        return True

    def screenshot(self, path: str = "color.ppm") -> str:
        """Write the current frame as binary PPM (P6) — the reference's
        color.ppm contract."""
        if self._frame is None or self.redraw:
            self.render()
        write_ppm(path, self._frame)
        return path

    # --- benchmark (reference 'b', ray.cpp:1096-1131) ------------------

    def benchmark(self, frame_count: int = 100, file=sys.stdout) -> list[float]:
        """Render ``frame_count`` frames, print the reference's
        10-bucket duration histogram plus Mrays/s."""
        params = self.frame_params()
        # fence each frame on a device-side checksum (scalar D2H): on
        # the axon runtime block_until_ready returns before execution
        # completes, and fetching whole frames would time the ~25 MB/s
        # tunnel instead of the chip.  The reference benchmark loop
        # also never reads frames back (ray.cpp:1104-1113).
        if hasattr(self.renderer, "make_checksum_fn"):
            fsum = self.renderer.make_checksum_fn(self._statics())
        else:
            import jax
            import jax.numpy as jnp

            fn = self._render_fn()
            fsum = jax.jit(lambda p: jnp.sum(fn(p)))
        np.asarray(fsum(params))
        durations = []
        for _ in range(frame_count):
            then = time.perf_counter()
            np.asarray(fsum(params))
            durations.append(time.perf_counter() - then)
        frame_min, frame_max = min(durations), max(durations)

        print(f"{frame_count} frames:", file=file)
        bucket_count = 10
        duration_range = frame_max - frame_min
        for i in range(bucket_count):
            bucket_start = frame_min + duration_range * i / bucket_count
            bucket_end = frame_min + duration_range * (i + 1) / bucket_count
            last = i == bucket_count - 1
            count = sum(
                1
                for d in durations
                if bucket_start <= d and (d <= bucket_end if last else d < bucket_end)
            )
            fps = 1.0 / ((bucket_start + bucket_end) / 2.0)
            print(
                f"{bucket_start * 1000.0:.2f} to {bucket_end * 1000.0:.2f} ms, "
                f"{fps:.2f} fps : {count}",
                file=file,
            )
        rays = self.width * self.height * 6
        med = float(np.median(durations))
        print(f"median {med * 1e3:.2f} ms, {rays / med / 1e6:.1f} Mrays/s "
              f"(potential, W*H*6)", file=file)
        # honest accounting: rays actually cast (dead lanes at bounces
        # 2/3 cast nothing); computed once, outside the timed loop
        if hasattr(self.renderer, "make_count_fn"):
            try:
                cast = int(np.asarray(
                    self.renderer.make_count_fn(self._statics())(params)
                ))
                print(
                    f"rays cast {cast} ({cast / med / 1e6:.1f} Mrays/s measured)",
                    file=file,
                )
            except Exception as e:
                print(f"cast-ray accounting unavailable: {e}", file=file)
        return durations

    # --- keyboard (reference KeyCallback, ray.cpp:791-856) -------------

    def key(self, k: str) -> None:
        if k == "[":
            self.fov /= 1.05
            print(f"fov = {self.fov:f}")
            self.redraw = True
        elif k == "]":
            self.fov *= 1.05
            print(f"fov = {self.fov:f}")
            self.redraw = True
        elif k == ",":
            self.which -= 1
            print(f"which = {self.which}")
            self.redraw = True
        elif k == ".":
            self.which += 1
            print(f"which = {self.which}")
            self.redraw = True
        elif k in ("q", "Q", "\033"):
            self.quit = True
        elif k in ("o", "O"):
            self.motion_target = MotionTarget.OBJECT
        elif k in ("l", "L"):
            self.motion_target = MotionTarget.LIGHT
        elif k in ("b", "B"):
            self.do_benchmark = True
            self.redraw = True
        elif k in ("s", "S"):
            self.screenshot("color.ppm")
        elif k in ("p", "P"):
            # the reference left this a stub ("XXX - print camera and
            # object matrices here", ray.cpp:846-848); we implement it
            np.set_printoptions(precision=4, suppress=True)
            print(f"camera_matrix =\n{self.world.camera_matrix}")
            print(f"object_matrix =\n{self.world.object_matrix}")
            print(f"light_dir = {self.light_dir}")
        elif k in ("d", "D"):
            self.which_diffuse_color = (
                self.which_diffuse_color + 1
            ) % len(DIFFUSE_COLORS)
            self.redraw = True
        elif k in ("m", "M"):
            self.which_material = (self.which_material + 1) % len(MATERIALS)
            self.redraw = True

    # --- mouse (reference Button/MotionCallback, ray.cpp:862-918) ------

    def button(self, pressed: bool, x: float, y: float, shift: bool = False) -> None:
        if pressed:
            self._button_pressed = True
            self._shift_pressed = shift
            self._ox, self._oy = x, y
            self.redraw = True
        else:
            self._button_pressed = False

    def motion(self, x: float, y: float) -> None:
        if not self._motion_reported:
            self._motion_reported = True
            self._ox, self._oy = x, y
        dx, dy = x - self._ox, y - self._oy
        self._ox, self._oy = x, y
        if not self._button_pressed:
            return
        if self._shift_pressed:
            # exponential zoom (ray.cpp:902)
            self.zoom *= float(np.exp(np.log(5.0) / self.height / 2.0 * -dy))
        elif self.motion_target is MotionTarget.OBJECT:
            # reverse of OpenGL (ray.cpp:905-906)
            self.object_rotation = cam.trackball_motion(
                self.object_rotation, -(dx / self.width), -(dy / self.height)
            )
        else:
            self.light_rotation = cam.trackball_motion(
                self.light_rotation, dx / self.width, dy / self.height
            )
        cam.update_view_params(
            self.world, self.zoom, self.object_rotation, self.object_position
        )
        self.light_dir = cam.update_light(self.light_rotation)
        self.redraw = True

    def drag(self, dx: float, dy: float, shift: bool = False) -> None:
        """Convenience: a full press-move-release gesture in pixels."""
        x0, y0 = self.width / 2.0, self.height / 2.0
        self._motion_reported = True
        self.button(True, x0, y0, shift)
        self.motion(x0 + dx, y0 + dy)
        self.button(False, x0 + dx, y0 + dy)
