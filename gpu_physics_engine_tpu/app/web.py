"""Browser front-end: the TPU-native analog of the reference's web/wasm
target (src/app.rs:9-75, src/lib.rs:1-40 — winit + wgpu compiled to
wasm, canvas in the page).

The reference ships the ENGINE to the browser (wasm + WebGPU); a TPU
engine cannot run client-side, so the TPU-native shape of "runs in a
web page" is the inverse split: the simulation + device render stay on
the TPU host, and the browser is a thin canvas + input surface over
HTTP (stdlib http.server — no extra dependencies).  Same user
experience as the reference web build: open a URL, watch the particles,
drag the attractor, P to spawn, G for grid lines, wheel to zoom,
WASD/arrows to pan.

  python -m gpu_physics_engine_tpu.app.web --particles 100000 --port 8000

Endpoints:
  GET  /           the page (canvas + input JS, self-contained)
  GET  /frame.png  latest rendered frame (PNG, encode level 1)
  GET  /stats      {"fps": ..., "particles": ..., "frame": ...}
  POST /event      {"type": "move"|"button"|"key"|"wheel", ...}

Input events are queued and applied on the simulation thread between
steps — InputManager (utils/input.py) keeps the reference keymap parity
(input_manager.rs:12-63); engine/device calls never run on HTTP
threads.  Frames render at display cadence with Viewer.render_engine
(device compositor + preview_scale for tunneled runtimes, the measured
remote-fps knob — docs/probes_r3/tpu_probe_interactive.jsonl).
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>gpu-physics-engine-tpu</title><style>
  body { margin: 0; background: #111; color: #ddd;
         font: 13px monospace; overflow: hidden; }
  #hud { position: fixed; top: 6px; left: 8px; opacity: 0.8; }
  canvas { display: block; margin: 0 auto; outline: none; }
</style></head><body>
<div id="hud">connecting…</div>
<canvas id="c" width="%(w)d" height="%(h)d" tabindex="0"></canvas>
<script>
const c = document.getElementById('c'), ctx = c.getContext('2d');
const hud = document.getElementById('hud');
function post(ev) { fetch('/event', {method: 'POST',
  body: JSON.stringify(ev)}).catch(() => {}); }
c.addEventListener('mousemove', e => {
  const r = c.getBoundingClientRect();
  post({type: 'move', x: e.clientX - r.left, y: e.clientY - r.top});
});
c.addEventListener('mousedown', () => post({type: 'button', pressed: true}));
c.addEventListener('mouseup', () => post({type: 'button', pressed: false}));
c.addEventListener('wheel', e => {
  e.preventDefault();
  post({type: 'wheel', delta: e.deltaY < 0 ? 1.0 : -1.0});
}, {passive: false});
window.addEventListener('keydown', e => post({type: 'key', key: e.key,
                                              pressed: true}));
window.addEventListener('keyup', e => post({type: 'key', key: e.key,
                                            pressed: false}));
c.focus();
let frames = 0, t0 = performance.now();
async function loop() {
  try {
    const img = await createImageBitmap(
      await (await fetch('/frame.png?' + frames)).blob());
    ctx.drawImage(img, 0, 0, c.width, c.height);
    frames++;
    if (frames %% 30 == 0) {
      const s = await (await fetch('/stats')).json();
      const fps = 30000 / (performance.now() - t0); t0 = performance.now();
      hud.textContent = s.particles + ' particles | display ' +
        fps.toFixed(1) + ' fps | sim frame ' + s.frame;
    }
  } catch (e) {}
  requestAnimationFrame(loop);
}
loop();
</script></body></html>"""


class WebApp:
    """Owns the engine/viewer/input trio and the simulation thread; the
    HTTP layer only reads the latest encoded frame and enqueues input."""

    def __init__(self, engine, viewer, preview_scale: int = 1,
                 steps_per_frame: int = 1, fused: bool = False):
        from gpu_physics_engine_tpu.utils.input import InputManager
        self.engine = engine
        self.viewer = viewer
        self.preview_scale = preview_scale
        self.steps_per_frame = steps_per_frame
        self.fused = fused
        self.events: "queue.Queue" = queue.Queue()
        self.running = False
        self._frame_lock = threading.Lock()
        self._frame_png = b""
        self._frame_idx = 0
        self._fps = 0.0
        self._particles = int(engine.num_particles())
        self.inputs = InputManager(engine, viewer, on_quit=self.stop)
        self._thread = None

    # ---- sim thread ----

    def _apply_events(self):
        while True:
            try:
                ev = self.events.get_nowait()
            except queue.Empty:
                return
            kind = ev.get("type")
            if kind == "move":
                self.inputs.process_cursor_moved((ev["x"], ev["y"]))
            elif kind == "button":
                self.inputs.process_mouse_input("left", bool(ev["pressed"]))
            elif kind == "key":
                self.inputs.process_keyboard_input(str(ev["key"]),
                                                   bool(ev["pressed"]))
            elif kind == "wheel":
                self.inputs.process_mouse_wheel(float(ev["delta"]))

    def _loop(self):
        try:
            self._loop_inner()
        except Exception:
            # a dead sim thread must be loud: the HTTP layer would keep
            # serving the last frame forever otherwise
            import traceback
            traceback.print_exc()
            self.running = False

    def _loop_inner(self):
        from gpu_physics_engine_tpu.utils.png import encode_png
        eng = self.engine
        last = time.perf_counter()
        while self.running:
            self._apply_events()
            self.viewer.camera.update(max(time.perf_counter() - last,
                                          1e-3))
            last = time.perf_counter()
            # fused sim+render (one dispatched program per frame) is
            # OPT-IN: measured NEGATIVE on the tunneled v5e (+5-19
            # ms/frame vs the two-program path — dispatches pipeline
            # over the tunnel; docs/probes_r4/tpu_probe_fused_frame.
            # jsonl); only local runtimes should consider it
            fuse = (self.fused and self.steps_per_frame == 1
                    and hasattr(eng, "step_render_frame")
                    and getattr(eng, "big", None) is None)
            if not fuse:
                if self.steps_per_frame == 1:
                    eng.step()
                else:
                    eng.run(self.steps_per_frame)
            frame = self.viewer.render_engine(
                eng, preview_scale=self.preview_scale, fused_step=fuse)
            png = encode_png(np.asarray(frame), level=1)
            # cache the count on the SIM thread: engine.state buffers are
            # donated per step, so HTTP threads must never touch them
            n_alive = int(eng.num_particles())
            with self._frame_lock:
                self._frame_png = png
                self._frame_idx += self.steps_per_frame
                self._particles = n_alive
            dt = time.perf_counter() - last
            self._fps = 0.9 * self._fps + 0.1 * (1.0 / max(dt, 1e-6))

    def start(self):
        self.running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self.running = False

    # ---- HTTP layer state ----

    def frame_png(self) -> bytes:
        with self._frame_lock:
            return self._frame_png

    def stats(self) -> dict:
        with self._frame_lock:
            return {"fps": round(self._fps, 1),
                    "particles": self._particles,
                    "frame": self._frame_idx}


def make_server(app: WebApp, host: str = "127.0.0.1", port: int = 8000,
                screen=(1280, 720)) -> ThreadingHTTPServer:
    page = (_PAGE % {"w": screen[0], "h": screen[1]}).encode()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, page, "text/html")
            elif path == "/frame.png":
                png = app.frame_png()
                if not png:
                    self._send(503, b"no frame yet", "text/plain")
                else:
                    self._send(200, png, "image/png")
            elif path == "/stats":
                self._send(200, json.dumps(app.stats()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path.split("?")[0] != "/event":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                ev = json.loads(self.rfile.read(n) or b"{}")
                app.events.put(ev)
                self._send(200, b"ok", "text/plain")
            except (ValueError, KeyError):
                self._send(400, b"bad event", "text/plain")

        def log_message(self, *a):  # quiet access log
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=100_000)
    p.add_argument("--world", type=float, nargs=2, default=(3048.0, 1048.0))
    p.add_argument("--gravity", type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--window", type=int, nargs=2, default=(1280, 720))
    p.add_argument("--pipeline", choices=("sorted", "bucket", "tiled"),
                   default="tiled")
    p.add_argument("--preview-scale", type=int, default=1,
                   help="composite at 1/s resolution, upscale in the "
                        "browser (the remote-TPU display-fps knob)")
    p.add_argument("--steps-per-frame", type=int, default=1)
    p.add_argument("--fused", action="store_true",
                   help="fuse step+render into one dispatched program "
                        "per frame — measured NEGATIVE over the tunnel "
                        "(docs/probes_r4/tpu_probe_fused_frame.jsonl); "
                        "opt-in for local runtimes")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides", help="SimConfig overrides")
    args = p.parse_args(argv)

    from gpu_physics_engine_tpu import SimConfig, make_engine
    from gpu_physics_engine_tpu.app.headless import apply_overrides
    from gpu_physics_engine_tpu.render.viewer import Viewer

    cfg = SimConfig(
        max_particles=args.particles + 100_000,
        initial_particles=args.particles,
        world_width=args.world[0], world_height=args.world[1],
        gravity=tuple(args.gravity), pipeline=args.pipeline)
    cfg = apply_overrides(cfg, args.overrides)
    eng = make_engine(cfg, seed=args.seed)
    viewer = Viewer((cfg.world_width, cfg.world_height), tuple(args.window))

    app = WebApp(eng, viewer, preview_scale=args.preview_scale,
                 steps_per_frame=args.steps_per_frame, fused=args.fused)
    app.start()
    srv = make_server(app, args.host, args.port, tuple(args.window))
    print(f"serving on http://{args.host}:{srv.server_address[1]}/ "
          f"(Ctrl-C to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.stop()
        srv.server_close()


if __name__ == "__main__":
    main()
