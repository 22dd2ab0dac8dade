"""Viewer stack tests: camera math, colormap parity, rasterizer, PNG."""

import os

import numpy as np
import pytest

from gpu_physics_engine_tpu.render import colormap, lines, rasterizer
from gpu_physics_engine_tpu.render.camera import Camera
from gpu_physics_engine_tpu.render.viewer import Viewer
from gpu_physics_engine_tpu.utils.png import write_png


def test_camera_autofit_and_roundtrip():
    cam = Camera((3048.0, 1048.0), (1280, 720))
    # 90% fit (camera.rs:42): zoom = min(1280/3048, 720/1048) * 0.9
    assert cam.zoom == pytest.approx(min(1280 / 3048, 720 / 1048) * 0.9)
    # screen_to_world(world_to_screen(p)) == p
    p = np.array([[100.0, 200.0], [3000.0, 1000.0]])
    s = cam.world_to_screen(p)
    for i in range(2):
        back = cam.screen_to_world(s[i])
        np.testing.assert_allclose(back, p[i], rtol=1e-6)
    # world center maps to screen center
    np.testing.assert_allclose(
        cam.world_to_screen(np.array([1524.0, 524.0])), [640.0, 360.0])


def test_camera_zoom_to_cursor_preserves_point():
    cam = Camera((1000.0, 1000.0), (800, 600))
    cursor = (123.0, 456.0)
    cam.set_mouse_position(cursor)
    before = cam.screen_to_world(cursor)
    cam.zoom_camera(+3.0)
    cam.update(1 / 60)
    after = cam.screen_to_world(cursor)
    np.testing.assert_allclose(after, before, rtol=1e-6)
    assert cam.zoom > min(800 / 1000, 600 / 1000) * 0.9


def test_camera_pan_scales_with_zoom():
    cam = Camera((1000.0, 1000.0), (800, 600))
    cam.move_camera("right", True)
    x0 = cam.position[0]
    cam.update(1.0)
    moved_low_zoom = cam.position[0] - x0
    cam.zoom *= 10
    x0 = cam.position[0]
    cam.update(1.0)
    moved_high_zoom = cam.position[0] - x0
    assert moved_low_zoom == pytest.approx(moved_high_zoom * 10)


def test_velocity_colormap_endpoints():
    c = colormap.velocity_colors(np.array([[0.0, 0.0],    # at rest -> blue
                                           [0.15, 0.0],   # half -> pink
                                           [0.3, 0.0],    # max -> yellow
                                           [9.9, 0.0]]))  # clamped -> yellow
    np.testing.assert_allclose(c[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(c[1], [1, 0.5, 1], atol=1e-6)
    np.testing.assert_allclose(c[2], [1, 1, 0], atol=1e-6)
    np.testing.assert_allclose(c[3], [1, 1, 0], atol=1e-6)


def test_native_rasterizer_builds_and_splats():
    frame = np.zeros((64, 64, 3), np.float32)
    rasterizer.splat(frame,
                     np.array([32.0], np.float32),
                     np.array([32.0], np.float32),
                     np.array([8.0], np.float32),
                     np.array([[1.0, 0.0, 0.0]], np.float32))
    # center is solid red
    np.testing.assert_allclose(frame[32, 32], [1, 0, 0], atol=1e-5)
    # far corner untouched
    np.testing.assert_allclose(frame[0, 0], [0, 0, 0])
    # soft edge: alpha fades between dist^2 0.2304 (0.96*quad/2) and 0.25
    assert 0.0 < frame[32, 32 + 7, 0] <= 1.0
    assert frame[32, 32 + 9, 0] == 0.0  # beyond the quad -> empty


def test_rasterizer_draw_order_blending():
    frame = np.zeros((32, 32, 3), np.float32)
    rasterizer.splat(frame,
                     np.array([16.0, 16.0], np.float32),
                     np.array([16.0, 16.0], np.float32),
                     np.array([6.0, 6.0], np.float32),
                     np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32))
    if rasterizer._load_native() is not None:
        # second (green) particle drew over the first
        np.testing.assert_allclose(frame[16, 16], [0, 1, 0], atol=1e-5)


def test_grid_lines_geometry():
    a, b, hz = lines.grid_line_segments((10.0, 5.0), 2.5)
    assert (hz == 0).sum() == 5  # vertical lines at x = 0, 2.5, 5, 7.5, 10
    assert (hz == 1).sum() == 3  # horizontal at y = 0, 2.5, 5
    assert a.shape == b.shape


def test_viewer_renders_engine(tmp_path):
    from gpu_physics_engine_tpu import Engine, SimConfig
    cfg = SimConfig(max_particles=256, initial_particles=256,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, sort_interval_steps=0)
    eng = Engine(cfg, seed=0)
    eng.run(3)
    viewer = Viewer((64.0, 64.0), (320, 240))
    viewer.toggle_grid()
    frame = viewer.render_engine(eng)
    assert frame.shape == (240, 320, 3)
    assert frame.max() > 0.0  # something was drawn
    out = tmp_path / "frame.png"
    viewer.save_png(str(out), frame)
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 100


def test_png_writer_roundtrip_header(tmp_path):
    img = np.zeros((4, 7, 3), np.uint8)
    img[1, 2] = (255, 128, 0)
    path = tmp_path / "t.png"
    write_png(str(path), img)
    raw = path.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    import struct
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (7, 4)


def test_viewer_renders_tiled_engine(tmp_path):
    from gpu_physics_engine_tpu import SimConfig, make_engine
    cfg = SimConfig(max_particles=256, initial_particles=256,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, pipeline="tiled", tile_cap=16)
    eng = make_engine(cfg, seed=0)
    eng.run(3)
    viewer = Viewer((64.0, 64.0), (320, 240))
    frame = viewer.render_engine(eng)
    assert frame.shape == (240, 320, 3)
    assert frame.max() > 0.0


def test_tilemap_renders_density_and_velocity():
    import jax.numpy as jnp

    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    from gpu_physics_engine_tpu.render.tilemap import render_tilemap, tile_stats

    cfg = SimConfig(max_particles=512, initial_particles=256,
                    world_width=64.0, world_height=64.0,
                    pipeline="tiled", tile_cap=16, sort_interval_steps=0)
    eng = TiledEngine(cfg, seed=0)
    eng.run(5)
    count, mean_v = tile_stats(eng.state)
    assert int(jnp.sum(count)) == 256          # every particle counted once
    frame = render_tilemap(eng.state, scale=4)
    _, TY, TX = eng.state.dims
    assert frame.shape == ((TY - 2) * 4, (TX - 2) * 4, 3)
    assert frame.dtype.name == "uint8"
    assert frame.max() > 0                     # something is visible


def test_viewer_device_path_for_tiled_engine():
    """render_engine on a TiledEngine takes the device-composited path
    (engine.render_frame at the camera's world rect) and matches the
    host splatter's framing: same shape, content present, grid overlay
    drawable on top.  prefer_device=False forces the host path."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    cfg = SimConfig(max_particles=512, initial_particles=256,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, pipeline="tiled", tile_cap=16,
                    tiled_collide="jnp", sort_interval_steps=0)
    eng = TiledEngine(cfg, seed=0)
    eng.run(3)
    viewer = Viewer((64.0, 64.0), (320, 240))
    dev = viewer.render_engine(eng)
    assert dev.shape == (240, 320, 3) and dev.dtype == np.float32
    assert dev.max() > 0.0
    host = viewer.render_engine(eng, prefer_device=False)
    assert host.shape == dev.shape
    # both framings put the same world in view.  The device composite
    # lives on the ~31x31 TILE grid before the MXU resample — each splat
    # is quantized to its tile's grid position (by design: at production
    # scales tiles ~ pixels), here ~8 px — so compare occupancy at 8x8
    # block granularity with 1 block of tolerance (dilation).
    def blocks(f):
        m = f.max(axis=-1) > 0.02
        return m.reshape(30, 8, 40, 8).any(axis=(1, 3))

    def dilate(m):
        out = m.copy()
        out[1:] |= m[:-1]
        out[:-1] |= m[1:]
        out[:, 1:] |= m[:, :-1]
        out[:, :-1] |= m[:, 1:]
        return out

    bd, bh = blocks(dev), blocks(host)
    assert (bh & dilate(bd)).sum() > 0.85 * bh.sum()
    assert (bd & dilate(bh)).sum() > 0.85 * bd.sum()
    viewer.toggle_grid()
    grid = viewer.render_engine(eng)
    assert grid.shape == dev.shape and grid.max() > 0.0


def test_viewer_preview_scale_downscaled_fetch():
    """preview_scale=s composites at (w/s, h/s) on device and upscales
    on the host: full-window shape out, same world in view (the
    remote-display knob — s^2 less image download over the tunnel)."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    cfg = SimConfig(max_particles=512, initial_particles=256,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, pipeline="tiled", tile_cap=16,
                    tiled_collide="jnp", sort_interval_steps=0)
    eng = TiledEngine(cfg, seed=0)
    eng.run(3)
    viewer = Viewer((64.0, 64.0), (320, 240))
    full = viewer.render_engine(eng)
    half = viewer.render_engine(eng, preview_scale=2)
    assert half.shape == full.shape == (240, 320, 3)
    assert half.dtype == np.float32 and half.max() > 0.0

    # same world content at block granularity (the preview is the same
    # composite at half resolution, nearest-upscaled)
    def blocks(f):
        m = f.max(axis=-1) > 0.02
        return m.reshape(15, 16, 20, 16).any(axis=(1, 3))

    bf, bh = blocks(full), blocks(half)
    assert (bf & bh).sum() > 0.8 * max(bf.sum(), 1)
    # grid overlay still draws at full resolution on top
    viewer.toggle_grid()
    g = viewer.render_engine(eng, preview_scale=2)
    assert g.shape == full.shape and g.max() > 0.0
