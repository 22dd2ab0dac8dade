"""Device-side renderer (render/device.py): colormap parity + composite.

The reference colors particles purely by velocity through a blue->pink->
yellow two-stage smoothstep ramp and cuts a soft circle with
alpha = 1 - smoothstep(0.2304, 0.25, d^2) (particle_drawer.wgsl:39-81);
render/colormap.py replicates that ramp on host and is itself covered by
tests/test_render.py.  Here the on-chip path must agree with it.
"""

import numpy as np

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.render.colormap import velocity_colors
from gpu_physics_engine_tpu.render.device import (
    autofit_rect, render_tiles_device)


def _cfg(**kw):
    base = dict(max_particles=64, initial_particles=0,
                world_width=44.0, world_height=22.0, initial_radius=0.5,
                pipeline="tiled", tile_cap=4, tile_multiplier=4.4,
                sort_interval_steps=0)
    base.update(kw)
    return SimConfig(**base)


def _engine(positions, radii, prev=None):
    cfg = _cfg(max_particles=max(len(positions), 1),
               initial_particles=0)
    return TiledEngine.from_arrays(
        cfg, np.asarray(positions, np.float32),
        np.asarray(radii, np.float32),
        previous_positions=None if prev is None
        else np.asarray(prev, np.float32)), cfg


def test_colormap_parity_on_device():
    """A particle rendered at its tile center shows exactly the host
    colormap's color scaled by the soft-circle alpha at that distance."""
    t = 2.2  # tile edge = 4.4 * 0.5
    # place the particle exactly at a tile center (alpha = 1 there) and
    # align a 1-world-per-pixel viewport so one pixel center coincides
    # with that tile center: the bilinear weight is exactly 1 and the
    # pixel must reproduce the host colormap to u8 rounding
    pos = np.array([[t * 1.5, t * 1.5]], np.float32)  # tile center 3.3
    vel = np.array([[0.12, -0.05]], np.float32)
    eng, cfg = _engine(pos, [0.5], prev=pos - vel)
    img = render_tiles_device(eng.state, cfg,
                              rect=(0.8, 0.8, 40.8, 20.8),
                              width=40, height=20)
    expected_rgb = velocity_colors(vel)[0]  # alpha = 1 at the center
    got = img.reshape(-1, 3).max(axis=0).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, expected_rgb, atol=2.5 / 255.0)


def test_velocity_ramp_orders_colors():
    """Slow particle renders blue-dominant, fast renders yellow-dominant
    (the reference ramp's endpoints, particle_drawer.wgsl:39-67)."""
    t = 2.2
    slow = [t * 1.5, t * 1.5]
    fast = [t * 6.5, t * 6.5]
    pos = np.array([slow, fast], np.float32)
    vel = np.array([[0.0, 0.0], [0.4, 0.0]], np.float32)  # 0 and > MAX_VELOCITY
    eng, cfg = _engine(pos, [0.5, 0.5], prev=pos - vel)
    img = render_tiles_device(eng.state, cfg, rect=(0, 0, 44.0, 22.0),
                              width=88, height=44).astype(np.int32)
    flat = img.reshape(-1, 3)
    blue = flat[np.argmax(flat[:, 2] - flat[:, 0])]
    yellow = flat[np.argmax(flat[:, 0] + flat[:, 1] - 2 * flat[:, 2])]
    assert blue[2] > 200 and blue[0] < 50           # pure blue
    assert yellow[0] > 200 and yellow[1] > 200 and yellow[2] < 50


def test_empty_scene_renders_black():
    eng, cfg = _engine(np.zeros((0, 2), np.float32), np.zeros(0, np.float32))
    img = render_tiles_device(eng.state, cfg, width=32, height=16)
    assert img.shape == (16, 32, 3)
    assert (img == 0).all()


def test_autofit_rect_covers_world():
    cfg = _cfg()
    x0, y0, x1, y1 = autofit_rect(cfg, 1280, 720)
    assert x0 < 0 < cfg.world_width < x1
    assert (x1 - x0) / (y1 - y0) == 1280 / 720  # aspect-true


def test_engine_render_frame_end_to_end():
    cfg = _cfg(max_particles=128, initial_particles=128)
    eng = TiledEngine(cfg, seed=3)
    eng.run(4)
    img = eng.render_frame(width=160, height=90)
    assert img.shape == (90, 160, 3) and img.dtype == np.uint8
    assert img.max() > 0  # something rendered


def test_offcenter_sparse_particle_always_visible():
    """A small particle far from its tile's sample point must still
    render (point-sprite minimum: splat radius is clamped to the sample
    cell).  The pre-clamp composite dropped it entirely — a sparse-scene
    bug; at 4M production density every tile had a near-center particle,
    which hid it."""
    t = 2.2
    true = np.array([[t * 1.5 + 1.0, t * 1.5 + 1.0]], np.float32)
    eng, cfg = _engine(true, [0.3], prev=true)
    rect = (0.0, 0.0, 44.0, 22.0)

    def centroid_world(img):
        m = img.max(axis=-1) > 0
        ys, xs = np.nonzero(m)
        assert len(xs), "particle dropped from the frame"
        # 2 px per world unit, y flipped
        return ((xs.mean() + 0.5) / 2.0, (44.0 - (ys.mean() + 0.5)) / 2.0)

    img1 = render_tiles_device(eng.state, cfg, rect=rect,
                               width=88, height=44)
    c1 = centroid_world(img1)
    # supersampled composite recovers sub-tile positioning
    cfg2 = cfg.replace(render_supersample=2)
    img2 = render_tiles_device(eng.state, cfg2, rect=rect,
                               width=88, height=44)
    c2 = centroid_world(img2)
    err1 = np.hypot(c1[0] - true[0, 0], c1[1] - true[0, 1])
    err2 = np.hypot(c2[0] - true[0, 0], c2[1] - true[0, 1])
    assert err1 < t  # S=1: within one tile (sample quantization)
    assert err2 < 0.75 * t  # S=2: strictly finer than tile quantization


def test_render_throughput_window_runs():
    """The scanned multi-frame measurement program (the honest device
    frame clock on tunneled runtimes) compiles and returns a positive
    per-frame time."""
    from gpu_physics_engine_tpu.render.device import render_throughput_ms

    cfg = _cfg(max_particles=64, initial_particles=0)
    rng = np.random.default_rng(1)
    pos = np.stack([rng.uniform(1.0, 43.0, 48),
                    rng.uniform(1.0, 21.0, 48)], -1).astype(np.float32)
    eng, cfg = _engine(pos, np.full(48, 0.5, np.float32))
    ms = render_throughput_ms(eng.state, cfg, frames=4,
                              width=128, height=64)
    assert np.isfinite(ms) and ms > 0


def test_render_run_matches_plain_run():
    """render_run = run() with the device composite fused after every
    step (the reference's frame loop, state.rs:115-140): the sim
    trajectory must be IDENTICAL to plain run(), and repeated windows
    must keep advancing.  (The return value is a full-image modular
    sum — forcing it is the honest device sync; content parity is
    covered by the render_frame tests.)"""
    cfg = _cfg(max_particles=48, initial_particles=32,
               tiled_collide="jnp")
    a = TiledEngine(cfg, seed=0)
    b = TiledEngine(cfg, seed=0)
    a.run(6)
    acc = b.render_run(6, width=40, height=20)
    assert isinstance(acc, int)  # forced on host = the window ran
    np.testing.assert_array_equal(np.asarray(a.state.x),
                                  np.asarray(b.state.x))
    np.testing.assert_array_equal(np.asarray(a.state.pid),
                                  np.asarray(b.state.pid))
    # a second window keeps advancing identically
    a.run(3)
    b.render_run(3, width=40, height=20)
    np.testing.assert_array_equal(np.asarray(a.state.x),
                                  np.asarray(b.state.x))


def test_step_render_frame_fuses_step_and_render():
    """step_render_frame = step() + render_frame() in ONE dispatched
    program: the trajectory must match the separate path bitwise and
    the image to 1 u8 step (XLA may fuse the two stages differently)."""
    cfg = _cfg(max_particles=48, initial_particles=32,
               tiled_collide="jnp")
    a = TiledEngine(cfg, seed=0)
    b = TiledEngine(cfg, seed=0)
    for _ in range(3):
        fused = a.step_render_frame(width=40, height=20)
        b.step()
        separate = b.render_frame(width=40, height=20)
        d = np.abs(fused.astype(np.int32) - separate.astype(np.int32))
        assert d.max() <= 1, f"image delta {d.max()}"
    np.testing.assert_array_equal(np.asarray(a.state.x),
                                  np.asarray(b.state.x))
    np.testing.assert_array_equal(np.asarray(a.state.pid),
                                  np.asarray(b.state.pid))


def test_step_render_frame_respects_relocate_interval():
    """The fused frame keeps the tiled_relocate_interval phase counter
    in lockstep with plain step()."""
    cfg = _cfg(max_particles=48, initial_particles=32,
               tiled_collide="jnp", tiled_relocate_interval=2)
    a = TiledEngine(cfg, seed=0)
    b = TiledEngine(cfg, seed=0)
    for _ in range(4):
        a.step_render_frame(width=40, height=20)
        b.step()
        assert a._since_reloc == b._since_reloc
    np.testing.assert_array_equal(np.asarray(a.state.x),
                                  np.asarray(b.state.x))
