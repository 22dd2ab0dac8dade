"""Host-side viewer: composes a frame from device arrays.

The analog of the reference Renderer (R3, src/renderer/renderer.rs:27-75):
clear to black, draw every renderable (particles as velocity-colored soft
circles, optional grid lines), present.  "Present" here is a numpy RGB
frame — savable as PNG, streamable to a window by app/interactive.py.

Unlike the reference's on-GPU instanced pipeline, the viewer pulls
pos/prev/radius off the device at display cadence (a deliberate split:
BASELINE.json's north star calls for "rendering split into a host-side
point-splat viewer fed by device arrays") and splats with the native C++
rasterizer (render/native/).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gpu_physics_engine_tpu.render import colormap, lines, rasterizer
from gpu_physics_engine_tpu.render.camera import Camera
from gpu_physics_engine_tpu.utils.png import write_png

CLEAR_COLOR = (0.0, 0.0, 0.0)  # black clear (renderer.rs:40-47)


class Viewer:
    def __init__(self, world_size: Tuple[float, float],
                 screen_size: Tuple[int, int] = (1280, 720)):
        self.camera = Camera(world_size, screen_size)
        self.screen_size = (int(screen_size[0]), int(screen_size[1]))
        self.world_size = world_size
        self.draw_grid = False  # `G` toggle (grid.rs:345-351)

    def toggle_grid(self):
        self.draw_grid = not self.draw_grid

    def resize(self, screen_size: Tuple[int, int]):
        """Window resize (SurfaceManager::resize analog, surface_manager.rs)."""
        self.screen_size = (int(screen_size[0]), int(screen_size[1]))
        self.camera.screen_size = (float(screen_size[0]), float(screen_size[1]))

    def render(self, positions: np.ndarray, previous_positions: np.ndarray,
               radii: np.ndarray, cell_size: Optional[float] = None) -> np.ndarray:
        """Compose one frame; returns (H, W, 3) float32 RGB."""
        w, h = self.screen_size
        frame = np.empty((h, w, 3), np.float32)
        frame[:] = CLEAR_COLOR

        if self.draw_grid and cell_size:
            a, b, hz = lines.grid_line_segments(self.world_size, cell_size)
            sa = self.camera.world_to_screen(a)
            sb = self.camera.world_to_screen(b)
            # y-down flip swaps vertical segment endpoints
            lo = np.minimum(sa, sb)
            hi = np.maximum(sa, sb)
            rgb = np.tile(np.asarray(lines.GRID_COLOR, np.float32), (len(a), 1))
            rasterizer.draw_axis_lines(frame, lo, hi, rgb, hz)

        pos = np.asarray(positions, np.float32)
        if pos.shape[0]:
            screen = self.camera.world_to_screen(pos)
            sr = np.asarray(radii, np.float32) * self.camera.zoom
            rgb = colormap.velocity_colors(pos - np.asarray(previous_positions))
            rasterizer.splat(frame, screen[:, 0], screen[:, 1], sr, rgb)
        return frame

    def render_engine(self, engine,
                      prefer_device: Optional[bool] = None,
                      preview_scale: int = 1,
                      fused_step: bool = False) -> np.ndarray:
        """One frame from the engine.

        Engines that render on-chip (TiledEngine.render_frame) composite
        the velocity colormap on the device and download only the
        finished 2.7 MB image — the production display path at 1M+
        (the host splatter costs ~150 ms @1M / ~2 s @4M, PERF.md);
        grid lines are drawn over the downloaded frame on the host.
        Other engines use the host splatter fed by device arrays
        (the reference split, renderer.rs:27-75).

        ``preview_scale`` > 1 composites at (w/s, h/s) and upscales on
        the host — same world rect, s^2 less image download.  On a
        tunneled TPU the 2.7 MB 1280x720 download IS the interactive
        frame budget (~135 ms of the 164 ms/frame measured in
        docs/probes_r3/tpu_probe_interactive.jsonl), so scale 2 is the
        remote-display knob; local device runtimes don't need it."""
        use_device = (prefer_device if prefer_device is not None
                      else hasattr(engine, "render_frame"))
        if use_device:
            w, h = self.screen_size
            s = max(1, int(preview_scale))
            fw, fh = -(-w // s), -(-h // s)  # ceil: cover the window
            # fused_step: advance the sim INSIDE the same dispatched
            # program as the render (TiledEngine.step_render_frame) —
            # halves the ~5 ms/dispatch tunnel tax per displayed frame;
            # the caller must then NOT call engine.step() itself
            if fused_step and hasattr(engine, "step_render_frame"):
                raw = engine.step_render_frame(
                    rect=self.camera.world_rect(), width=fw, height=fh)
            else:
                raw = engine.render_frame(rect=self.camera.world_rect(),
                                          width=fw, height=fh)
            frame = np.asarray(raw, np.float32) / 255.0
            if s > 1:
                # nearest upscale, cropped to the window; the grid
                # overlay below draws at full resolution on top
                frame = frame.repeat(s, axis=0).repeat(s, axis=1)[:h, :w]
            cell = engine.cell_size()
            if self.draw_grid and cell:
                a, b, hz = lines.grid_line_segments(self.world_size, cell)
                sa = self.camera.world_to_screen(a)
                sb = self.camera.world_to_screen(b)
                lo = np.minimum(sa, sb)
                hi = np.maximum(sa, sb)
                rgb = np.tile(np.asarray(lines.GRID_COLOR, np.float32),
                              (len(a), 1))
                rasterizer.draw_axis_lines(frame, lo, hi, rgb, hz)
            return frame
        return self.render(engine.positions(), engine.previous_positions(),
                           engine.radii(), engine.cell_size())

    def save_png(self, path: str, frame: np.ndarray) -> None:
        write_png(path, frame)
