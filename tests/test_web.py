"""Browser front-end (app/web.py — the analog of the reference's
web/wasm target, src/app.rs:9-75): page serves, frames stream as PNG,
input events reach the engine through the queue + InputManager."""

import jax

jax.config.update("jax_platforms", "cpu")

import http.client  # noqa: E402
import json  # noqa: E402
import threading  # noqa: E402
import time  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpu_physics_engine_tpu import SimConfig, make_engine  # noqa: E402
from gpu_physics_engine_tpu.app.web import WebApp, make_server  # noqa: E402
from gpu_physics_engine_tpu.render.viewer import Viewer  # noqa: E402


@pytest.fixture(scope="module")
def served_app():
    # headroom for one full spawn_burst (100, particle_system.rs:13)
    cfg = SimConfig(max_particles=700, initial_particles=512,
                    world_width=64.0, world_height=32.0)
    eng = make_engine(cfg, seed=0)
    viewer = Viewer((cfg.world_width, cfg.world_height), (160, 80))
    app = WebApp(eng, viewer)
    app.start()
    srv = make_server(app, port=0, screen=(160, 80))
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield app, srv.server_address[1]
    app.stop()
    srv.shutdown()
    srv.server_close()


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, body


def _post(port, path, obj):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, json.dumps(obj))
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, body


def test_page_and_stats(served_app):
    app, port = served_app
    status, body = _get(port, "/")
    assert status == 200 and b"<canvas" in body
    status, body = _get(port, "/stats")
    assert status == 200
    s = json.loads(body)
    assert s["particles"] == 512


def test_frame_stream_is_png_and_sim_advances(served_app):
    app, port = served_app
    deadline = time.time() + 240  # first CPU compile is slow on CI
    status, body = 503, b""
    while time.time() < deadline:
        status, body = _get(port, "/frame.png")
        if status == 200:
            break
        time.sleep(1.0)
    assert status == 200, "no frame within deadline"
    assert body.startswith(b"\x89PNG\r\n\x1a\n")
    f0 = app._frame_idx
    time.sleep(3.0)
    assert app._frame_idx > f0, "simulation thread is not advancing"


def test_input_events_reach_engine(served_app):
    app, port = served_app
    # cursor to canvas center, press: the engine's attractor must arm
    assert _post(port, "/event", {"type": "move", "x": 80, "y": 40})[0] == 200
    assert _post(port, "/event",
                 {"type": "button", "pressed": True})[0] == 200
    deadline = time.time() + 120
    while time.time() < deadline and not app.engine.mouse_pressed:
        time.sleep(0.5)
    assert app.engine.mouse_pressed, "mouse press never applied"
    # wheel zooms the viewer camera
    z0 = float(app.viewer.camera.zoom)
    _post(port, "/event", {"type": "wheel", "delta": 1.0})
    deadline = time.time() + 120
    while time.time() < deadline and float(app.viewer.camera.zoom) == z0:
        time.sleep(0.5)
    assert float(app.viewer.camera.zoom) != z0
    # P spawns at the cursor (reference input_manager.rs:15-17).  The
    # count is read through /stats — engine state buffers are donated
    # per step, so only the sim thread may touch them (the stats cache
    # exists exactly for this)
    n0 = json.loads(_get(port, "/stats")[1])["particles"]
    _post(port, "/event", {"type": "key", "key": "p", "pressed": True})
    deadline = time.time() + 120
    n_now = n0
    while time.time() < deadline and n_now == n0:
        time.sleep(0.5)
        n_now = json.loads(_get(port, "/stats")[1])["particles"]
    assert n_now > n0
    _post(port, "/event", {"type": "button", "pressed": False})
    # unknown events are rejected cleanly, bad JSON is a 400
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/event", "not json")
    assert conn.getresponse().status == 400
    conn.close()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
