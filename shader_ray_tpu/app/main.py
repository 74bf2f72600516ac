"""CLI entry: ``python -m shader_ray_tpu model background``.

Same positional interface as the reference (usage ray.cpp:945-950,
README.md:10): a model file (.trisrc / .obj) and a background spec
("r, g, b" floats, ``grid``, hex ``rrggbb``, or an image path — HDR
.hdr natively, LDR via PIL).

The reference opens a GLFW window; headless TPU hosts get an
interactive stdin REPL instead with the same key bindings
(ray.cpp:791-856) plus drag/zoom commands, writing frames to PPM.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


HELP = """\
commands (reference key map, ray.cpp:791-856):
  [ / ]        fov divide/multiply by 1.05
  , / .        debug mode `which` -/+
  o / l        mouse target: object / light
  m            cycle material (gold silver copper iron alum plastic...)
  d            cycle diffuse color (white reddish green blueish)
  b            benchmark: 100 frames, duration histogram
  s            screenshot -> color.ppm
  q            quit
extra (headless equivalents of mouse gestures):
  drag DX DY   trackball-rotate current target by a pixel drag
  zoom DY      shift-drag zoom by DY pixels (negative = zoom in)
  render [F]   force a frame; optionally write it to file F (.ppm)
  prog [N]     progressive render: average N jittered samples (default 4)
  stats        per-phase walk counters (steps/leaf visits per packet)
  tune [N]     autotune engine knobs for this scene (N-sample batches)
  set K V      set a config knob live (e.g. `set walk_pops 2`,
               `set min_contrib 0.004`); `set` alone lists knobs
  view         toggle inline ANSI-truecolor display of each frame
  serve [PORT] browser live viewer: serve frames + take mouse/keyboard
               input over HTTP until quit (also --serve PORT)
  help         this text
"""


def build_app(args) -> "App":
    from shader_ray_tpu.app.driver import App
    from shader_ray_tpu.config import get_config
    from shader_ray_tpu.models.background import load_background
    from shader_ray_tpu.models.world import (
        get_shader_data,
        load_world,
        scene_fingerprint,
    )
    from shader_ray_tpu.utils.cache import load_scene_data, save_scene_data

    cfg = get_config()
    data = None
    key = scene_fingerprint(args.model, cfg) if cfg.scene_cache else None
    if key is not None:
        data = load_scene_data(key)
    if data is not None:
        # cache hit: skip the whole BVH build — the World is only
        # needed for center/extent + view matrices
        print(f"scene cache hit: {key}", file=sys.stderr)
        world = load_world(args.model, cfg, build_bvh=False)
    else:
        world = load_world(args.model, cfg)
        data = get_shader_data(world, cfg, verbose=True)
        if key is not None:
            try:
                save_scene_data(key, data)
            except OSError:
                pass
    background = load_background(args.background)

    mesh = None
    if args.devices != 1:
        import jax

        from shader_ray_tpu.parallel import make_mesh

        n = len(jax.devices()) if args.devices == 0 else args.devices
        if n > 1:
            mesh = make_mesh(n)

    from shader_ray_tpu.engine import Renderer

    engine = args.engine if args.engine != "auto" else None
    renderer = Renderer(data, background, cfg, engine=engine, mesh=mesh)
    print(f"engine: {renderer.engine}", file=sys.stderr)
    app = App(world, renderer, cfg, width=args.width, height=args.height)
    # the scene-cache key doubles as the autotune persistence key
    app.scene_key = key
    return app


def repl(app, out_path: str, stream, view: bool = False) -> None:
    def emit(frame):
        from shader_ray_tpu.utils.ppm import write_ppm

        write_ppm(out_path, frame)
        print(f"wrote {out_path}", file=sys.stderr)
        if view:
            from shader_ray_tpu.utils.ansi import print_frame

            print_frame(frame)

    frame = app.render()
    if frame is not None:
        emit(frame)

    for line in stream:
        line = line.strip()
        if not line:
            continue
        parts = line.split()
        cmd = parts[0]
        if cmd == "help":
            print(HELP, end="")
        elif cmd == "view":
            view = not view
            print(f"view = {view}", file=sys.stderr)
            if view and app._frame is not None:
                from shader_ray_tpu.utils.ansi import print_frame

                print_frame(app._frame)
            continue
        elif cmd == "drag" and len(parts) == 3:
            app.drag(float(parts[1]), float(parts[2]))
        elif cmd == "zoom" and len(parts) == 2:
            app.drag(0.0, float(parts[1]), shift=True)
        elif cmd == "stats":
            app.walk_stats(file=sys.stderr)
        elif cmd == "serve":
            _serve(app, int(parts[1]) if len(parts) > 1 else 8765)
            if app.quit:
                break
            continue
        elif cmd == "tune":
            app.tune(
                samples=int(parts[1]) if len(parts) > 1 else 32,
                file=sys.stderr,
            )
            continue
        elif cmd == "set":
            if len(parts) == 3:
                app.set_knob(parts[1], parts[2], file=sys.stderr)
            elif len(parts) == 2:  # value missing: say so, don't list
                print(f"usage: set {parts[1].upper()} VALUE", file=sys.stderr)
            else:
                app.set_knob("", "", file=sys.stderr)  # bare set: list knobs
            continue
        elif cmd == "prog":
            n = int(parts[1]) if len(parts) > 1 else 4
            frame = app.render_progressive(n)
            emit(frame)
            print(f"({n} samples)", file=sys.stderr)
            continue
        elif cmd == "render":
            app.redraw = True
            frame = app.render()
            path = parts[1] if len(parts) > 1 else out_path
            from shader_ray_tpu.utils.ppm import write_ppm

            write_ppm(path, frame)
            print(f"wrote {path}", file=sys.stderr)
            if view:
                from shader_ray_tpu.utils.ansi import print_frame

                print_frame(frame)
            continue
        else:
            for ch in cmd:
                app.key(ch)
        if app.do_benchmark:
            app.do_benchmark = False
            app.benchmark()
        if app.quit:
            break
        frame = app.render()
        if frame is not None:
            emit(frame)


def _serve(app, port: int) -> None:
    """Run the browser live viewer (app/webview.py) until the user
    quits from the page (or Ctrl-C) — the interactive-window analog
    of the reference's GLFW display (ray.cpp:964-984)."""
    from shader_ray_tpu.app.webview import WebViewer

    viewer = WebViewer(app, port=port)
    print(f"live viewer at {viewer.start()}  (q in the page quits)",
          file=sys.stderr)
    viewer.run()


def main(argv=None) -> int:
    # honor JAX_PLATFORMS deterministically: the axon sitecustomize
    # force-selects its backend at interpreter start and can ignore the
    # env var; the config override after import wins (conftest recipe)
    plat = __import__("os").environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat.split(",")[0])

    p = argparse.ArgumentParser(
        prog="shader_ray_tpu",
        description="TPU-native interactive ray tracer",
    )
    p.add_argument("model", help="scene file (.trisrc or .obj)")
    p.add_argument(
        "background",
        help='env spec: "r, g, b" | grid | rrggbb hex | image path (.hdr/.png/...)',
    )
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument(
        "--devices",
        type=int,
        default=1,
        help="shard the frame over N devices (0 = all available)",
    )
    p.add_argument(
        "--engine",
        choices=["auto", "packet", "wavefront"],
        default="auto",
        help="device render engine (auto: packet on TPU, wavefront elsewhere)",
    )
    p.add_argument("--out", default="frame.ppm", help="output frame path")
    p.add_argument(
        "--once", action="store_true", help="render one frame and exit (no REPL)"
    )
    p.add_argument(
        "--view",
        action="store_true",
        help="display each frame inline as ANSI truecolor (the headless "
        "analog of the reference's live window)",
    )
    p.add_argument(
        "--serve",
        type=int,
        default=None,
        metavar="PORT",
        help="browser live viewer: serve frames over HTTP on PORT and "
        "take mouse/keyboard input from the page (the interactive-"
        "window analog of the reference's GLFW display)",
    )
    args = p.parse_args(argv)

    try:
        app = build_app(args)
    except (FileNotFoundError, ValueError) as e:
        # fail-fast with a message, like the reference (ray.cpp:996-999)
        print(f"Couldn't load scene: {e}", file=sys.stderr)
        return 1
    if args.once:
        frame = app.render()
        from shader_ray_tpu.utils.ppm import write_ppm

        write_ppm(args.out, frame)
        print(f"wrote {args.out}", file=sys.stderr)
        if args.view:
            from shader_ray_tpu.utils.ansi import print_frame

            print_frame(frame)
        return 0
    if args.serve is not None:
        _serve(app, args.serve)
        return 0
    repl(app, args.out, sys.stdin, view=args.view)
    return 0


if __name__ == "__main__":
    sys.exit(main())
