"""Browser live viewer (app/webview.py): PNG codec round-trip and the
HTTP surface end-to-end — frame serving, input events driving the
SAME interaction state machine as the REPL (reference GLFW callbacks,
ray.cpp:791-943), and damage-driven redraw semantics."""

import json
import urllib.request

import numpy as np

from shader_ray_tpu.app.driver import App
from shader_ray_tpu.config import Config
from shader_ray_tpu.models.fixtures import procedural_sky, uv_sphere
from shader_ray_tpu.models.triangle_set import TriangleSet
from shader_ray_tpu.models.world import make_world
from shader_ray_tpu.utils.png import decode_png, encode_png


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    # non-contiguous input (a frame slice) must encode correctly too
    sub = img[::2, 1:, :]
    assert np.array_equal(decode_png(encode_png(sub)), sub)


def _tiny_app():
    from shader_ray_tpu.engine import Renderer
    from shader_ray_tpu.models.world import get_shader_data

    pos, _ = uv_sphere(lat=6, lon=8)
    world = make_world(TriangleSet.from_arrays(pos))
    cfg = Config()
    renderer = Renderer(
        get_shader_data(world), procedural_sky(32), config=cfg,
        engine="wavefront",
    )
    return App(world, renderer, cfg, width=48, height=32)


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


def test_webview_http_surface():
    from shader_ray_tpu.app.webview import WebViewer

    app = _tiny_app()
    viewer = WebViewer(app, port=0)  # ephemeral port
    url = viewer.start()
    try:
        # before the first step there is no frame
        assert b"shader-ray-tpu" in _get(url)
        st = json.loads(_get(url + "state"))
        assert st["serial"] == 0 and st["which"] == 0
        assert st["width"] == 48 and st["height"] == 32

        assert viewer.step()  # initial render (app starts dirty)
        png = _get(url + "frame.png")
        frame = decode_png(png)
        assert frame.shape == (32, 48, 3)
        # the served frame quantizes exactly like ppm.write_ppm
        want = (np.clip(app._frame, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        assert np.array_equal(frame, want)
        assert frame.max() > 40  # non-trivial image (sky + sphere)
        assert not viewer.step()  # damage-driven: clean -> no re-render

        # key event mutates the same state machine the REPL drives
        _post(url + "event", {"type": "key", "k": "."})
        st = json.loads(_get(url + "state"))
        assert st["which"] == 1
        _post(url + "event", {"type": "key", "k": ","})
        assert json.loads(_get(url + "state"))["which"] == 0

        # a drag gesture (press-move-release) rotates the object and
        # marks the frame dirty; the next step produces a new frame
        cam0 = np.asarray(app.world.camera_matrix).copy()
        obj0 = np.asarray(app.world.object_matrix).copy()
        _post(url + "event",
              {"type": "button", "pressed": True, "x": 24, "y": 16})
        # first-ever motion is swallowed (the reference's first-motion
        # glitch workaround, ray.cpp:878-889); the second one rotates
        _post(url + "event", {"type": "motion", "x": 26, "y": 17})
        _post(url + "event", {"type": "motion", "x": 30, "y": 20})
        _post(url + "event",
              {"type": "button", "pressed": False, "x": 0, "y": 0})
        assert app.redraw
        assert not np.array_equal(np.asarray(app.world.object_matrix), obj0)
        assert viewer.step()
        assert json.loads(_get(url + "state"))["serial"] == 2

        # shift-drag = exponential zoom (ray.cpp:902): camera moves
        _post(url + "event",
              {"type": "button", "pressed": True, "x": 24, "y": 16,
               "shift": True})
        _post(url + "event", {"type": "motion", "x": 24, "y": 2})
        _post(url + "event",
              {"type": "button", "pressed": False, "x": 0, "y": 0})
        assert not np.array_equal(np.asarray(app.world.camera_matrix), cam0)

        # material cycle + quit via the reference key map
        _post(url + "event", {"type": "key", "k": "m"})
        assert json.loads(_get(url + "state"))["material"] == "silver"
        _post(url + "event", {"type": "key", "k": "q"})
        assert json.loads(_get(url + "state"))["quit"] is True

        # malformed events are rejected without killing the server
        try:
            _post(url + "event", {"type": "bogus"})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert b"shader-ray-tpu" in _get(url)
    finally:
        viewer.stop()


def test_webview_seeds_from_existing_frame():
    """If the app already rendered before serving started (the REPL
    renders before its command loop), the first step() seeds the PNG
    from the existing frame instead of 404ing until the next damage."""
    from shader_ray_tpu.app.webview import WebViewer

    app = _tiny_app()
    app.render()                       # app is now CLEAN with a frame
    assert app._frame is not None and not app.redraw
    viewer = WebViewer(app, port=0)
    url = viewer.start()
    try:
        assert viewer.step()           # seeded, not re-rendered
        frame = decode_png(_get(url + "frame.png"))
        want = (np.clip(app._frame, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        assert np.array_equal(frame, want)
        assert not viewer.step()       # still clean afterwards
    finally:
        viewer.stop()


def test_webview_run_loop_end_to_end():
    """VERDICT r2 #7: drive the REAL serving loop purely over HTTP —
    ``run()`` (the blocking damage-driven loop ``--serve`` uses,
    reference ray.cpp:1132-1142) renders on its owning thread while
    this test acts as the browser: poll /state, send a drag, wait for
    the serial to advance, and check the frame bytes actually changed."""
    import threading
    import time

    from shader_ray_tpu.app.webview import WebViewer

    app = _tiny_app()
    viewer = WebViewer(app, port=0)
    url = viewer.start()
    runner = threading.Thread(target=viewer.run, kwargs={"poll": 0.01})
    runner.start()
    try:
        # the loop produces the initial frame without any input
        deadline = time.time() + 60
        while time.time() < deadline:
            st = json.loads(_get(url + "state"))
            if st["serial"] >= 1:
                break
            time.sleep(0.05)
        assert st["serial"] >= 1, "run() never produced the first frame"
        png0 = _get(url + "frame.png")
        assert decode_png(png0).shape == (32, 48, 3)

        # browser-shaped drag: press, two motions (the first-ever motion
        # is swallowed per the reference's first-motion glitch
        # workaround, ray.cpp:878-889), release.  A LARGE sweep — the
        # run loop may render mid-drag, and a few-pixel drag of a
        # sphere can quantize to the identical 8-bit frame.
        _post(url + "event",
              {"type": "button", "pressed": True, "x": 4, "y": 16})
        _post(url + "event", {"type": "motion", "x": 8, "y": 16})
        _post(url + "event", {"type": "motion", "x": 44, "y": 30})
        _post(url + "event",
              {"type": "button", "pressed": False, "x": 0, "y": 0})

        # the damage loop notices, re-renders, and the served frame
        # bytes eventually reflect the rotated object
        base = st["serial"]
        png1 = png0
        while time.time() < deadline:
            st = json.loads(_get(url + "state"))
            if st["serial"] > base:
                png1 = _get(url + "frame.png")
                if png1 != png0:
                    break
            time.sleep(0.05)
        assert st["serial"] > base, "drag did not trigger a redraw"
        assert png1 != png0, "rotated frame should differ"

        # quit through the key map ends run()
        _post(url + "event", {"type": "key", "k": "q"})
        runner.join(timeout=60)
        assert not runner.is_alive()
    finally:
        app.quit = True
        runner.join(timeout=10)
        if runner.is_alive():  # leave no thread behind on failure
            viewer.stop()
