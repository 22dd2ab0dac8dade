"""Auxiliary subsystem tests: checkpoint/resume, profiling, input map,
headless app CLI."""

import json
import os

import numpy as np
import pytest

from gpu_physics_engine_tpu import Engine, SimConfig, StepParams
from gpu_physics_engine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from gpu_physics_engine_tpu.utils.profiling import Profiler, phase_breakdown
from gpu_physics_engine_tpu.utils.input import InputManager


def _cfg(**kw):
    base = dict(max_particles=512, initial_particles=256,
                world_width=64.0, world_height=64.0,
                initial_radius=0.5, sort_interval_steps=0)
    base.update(kw)
    return SimConfig(**base)


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    eng = Engine(_cfg(), seed=0)
    eng.run(10)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, eng.state, eng.config)

    state2, cfg2 = load_checkpoint(path)
    assert cfg2 == eng.config
    eng2 = Engine(cfg2, seed=0, initial_state=state2)

    a = eng.run(5)
    b = eng2.run(5)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.py), np.asarray(b.py))
    assert int(a.num_active) == int(b.num_active)


def test_profiler_chrometrace_format(tmp_path):
    prof = Profiler()
    with prof.scope("outer"):
        with prof.scope("inner"):
            sum(range(1000))
    path = str(tmp_path / "benchmark.json")
    prof.export_chrometrace(path)
    with open(path) as f:
        trace = json.load(f)
    names = [e["name"] for e in trace["traceEvents"]]
    assert "outer" in names and "inner" in names
    for e in trace["traceEvents"]:
        assert e["ph"] == "X" and e["dur"] >= 0


def test_phase_breakdown_reports_all_phases():
    cfg = _cfg()
    eng = Engine(cfg, seed=0)
    eng.run(2)
    t = phase_breakdown(cfg, eng.state, eng.params(), repeats=2)
    for phase in ("build_cell_ids", "sort_map", "build_collision_cells",
                  "solve_collisions", "particle_integration", "morton_resort"):
        assert phase in t and t[phase] >= 0.0


def test_input_manager_keymap():
    from gpu_physics_engine_tpu.render.viewer import Viewer
    eng = Engine(_cfg(), seed=0)
    viewer = Viewer((64.0, 64.0), (320, 240))
    quit_flag = []
    im = InputManager(eng, viewer, on_quit=lambda: quit_flag.append(1))

    im.process_cursor_moved((160, 120))  # screen center -> world center
    n0 = eng.num_particles()
    im.process_keyboard_input("p", True)
    assert eng.num_particles() == n0 + 100  # spawn burst

    assert not viewer.draw_grid
    im.process_keyboard_input("g", True)
    assert viewer.draw_grid

    im.process_mouse_input("left", True)
    assert eng.mouse_pressed
    np.testing.assert_allclose(eng.mouse_pos, (32.0, 32.0), atol=1e-6)
    im.process_mouse_input("left", False)
    assert not eng.mouse_pressed

    im.process_keyboard_input("d", True)
    assert viewer.camera.pressed["right"]

    im.process_keyboard_input("escape", True)
    assert quit_flag


def test_headless_cli_small_run(tmp_path, capsys):
    from gpu_physics_engine_tpu.app import headless
    out = str(tmp_path / "frames")
    summary = headless.main([
        "--particles", "200", "--steps", "8",
        "--world", "64", "64", "--sort-interval", "4",
        "--spawn", "2", "32", "32",
        "--attract", "3", "32", "32", "--release", "6",
        "--render-every", "4", "--out", out,
        "--chrometrace", str(tmp_path / "benchmark.json"),
        "--checkpoint", str(tmp_path / "end.npz"),
        "--summary-json",
    ])
    assert summary["particles"] == 300
    assert summary["finite"]
    assert os.path.exists(os.path.join(out, "frame_000004.png"))
    assert os.path.exists(str(tmp_path / "benchmark.json"))
    st, cfg = load_checkpoint(str(tmp_path / "end.npz"))
    assert int(st.num_active) == 300
    captured = capsys.readouterr().out
    assert "Average update time" in captured


def test_tiled_checkpoint_roundtrip(tmp_path):
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    from gpu_physics_engine_tpu.utils.checkpoint import (
        load_tiled_checkpoint, save_tiled_checkpoint)
    cfg = SimConfig(max_particles=256, initial_particles=128,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, pipeline="tiled", tile_cap=16)
    eng = TiledEngine(cfg, seed=0)
    eng.run(10)
    path = str(tmp_path / "tiled.npz")
    save_tiled_checkpoint(path, eng.state, cfg)
    st2, cfg2 = load_tiled_checkpoint(path)
    assert cfg2 == cfg
    eng2 = TiledEngine(cfg2, seed=0, initial_state=st2)
    a = eng.run(5)
    eng2.run(5)
    np.testing.assert_allclose(eng.positions(), eng2.positions(), atol=1e-6)


def test_scene_presets_constructible():
    from gpu_physics_engine_tpu.scenes import SCENES, get_scene
    assert set(SCENES) == {"tiny", "interactive", "million",
                           "four_million", "sixteen_million"}
    for name, scene in SCENES.items():
        assert scene.config.capacity >= scene.config.initial_particles
        assert scene.steps > 0
    assert get_scene("tiny").config.initial_particles == 10_000
    import pytest as _pytest
    with _pytest.raises(KeyError):
        get_scene("nope")


def test_headless_set_overrides():
    """--set K=V reaches any SimConfig field with type coercion; unknown
    keys fail loudly with the valid-name list."""
    import pytest

    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.app.headless import apply_overrides

    cfg = SimConfig(max_particles=128, initial_particles=64,
                    world_width=64.0, world_height=64.0)
    out = apply_overrides(cfg, [
        "pipeline=tiled", "tile_cap=6", "tile_multiplier=3.3",
        "tiled_relocate_interval=2", "gs_layout=mx",
        "tiled_fuse_integrate=false", "gravity=0,-30",
        "render_supersample=2"])
    assert out.pipeline == "tiled" and out.tile_cap == 6
    assert out.tile_multiplier == 3.3
    assert out.tiled_relocate_interval == 2 and out.gs_layout == "mx"
    assert out.tiled_fuse_integrate is False
    assert out.gravity == (0.0, -30.0)
    assert out.render_supersample == 2
    with pytest.raises(SystemExit, match="unknown SimConfig field"):
        apply_overrides(cfg, ["no_such_knob=1"])
    with pytest.raises(SystemExit, match="expects K=V"):
        apply_overrides(cfg, ["oops"])
    # end-to-end through the CLI
    from gpu_physics_engine_tpu.app import headless
    summary = headless.main([
        "--particles", "64", "--steps", "4", "--world", "32", "32",
        "--pipeline", "tiled", "--summary-json",
        "--set", "tile_cap=8", "--set", "tiled_collide=jnp",
    ])
    assert summary["finite"]


def test_tuned_geometry_api():
    """make_tuned_engine / tuned_config: the hardware-swept per-size
    production geometry is a library API (single source of truth shared
    with bench.py), with log-nearest size matching and overrides."""
    from gpu_physics_engine_tpu import (make_tuned_engine, tuned_chunk,
                                        tuned_config, tuned_row)
    from gpu_physics_engine_tpu.core.tuned import TUNED_TILE_GEOMETRY
    import bench

    assert bench._TILE_GEOM is TUNED_TILE_GEOMETRY
    cfg = tuned_config(1_048_576)
    assert cfg.pipeline == "tiled"
    mult, cap, chunk, match, iv = TUNED_TILE_GEOMETRY[1_048_576]
    assert (cfg.tile_multiplier, cfg.tile_cap, cfg.tiled_match,
            cfg.tiled_relocate_interval) == (mult, cap, match, iv)
    assert tuned_chunk(1_048_576) == chunk
    assert tuned_row(900_000) == tuned_row(1_048_576)  # log-nearest
    # a tiny engine at the small-size row actually runs (default world —
    # the rows track the reference curve's density; flip matching keeps
    # the CPU compile small, see CLAUDE.md compile discipline)
    eng = make_tuned_engine(2_000, tiled_collide="jnp",
                            tiled_match="flip")
    eng.run(4)
    assert eng.num_particles() == 2_000


def test_interactive_smoke_headless():
    """The interactive window loop runs under the Agg backend (no
    display): N bounded frames, tiled pipeline -> device-composited
    frames through Viewer.render_engine."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from gpu_physics_engine_tpu.app import interactive

    interactive.main(["--frames", "3", "--particles", "200",
                      "--world", "64", "64", "--window", "160", "120",
                      "--pipeline", "tiled", "--preview-scale", "2",
                      "--set", "tiled_collide=jnp",
                      "--set", "tile_cap=16",
                      "--set", "sort_interval_steps=0"])


def test_gs_tuned_helpers_map_sizes():
    """GS_TUNED/GS_SWEEP: log-nearest size mapping and the measured
    relocate default everywhere (bench.py and user GS configs both
    read these).  The round-3 adopted-on-faith 4M rebuild pick was
    reverted in round 4 — the probe proved unmeasurable (ROUND4.md
    §2a); no default may rest on an unmeasured config."""
    from gpu_physics_engine_tpu.core.tuned import GS_SWEEP, GS_TUNED

    cap_1m, match = GS_TUNED(1_048_576)
    assert cap_1m == 4 and match == "auto"
    assert GS_TUNED(900_000) == GS_TUNED(1_048_576)  # log-nearest
    assert GS_TUNED(4_194_304)[0] == 6  # storage-true 4M cap

    assert GS_SWEEP(1_048_576) == (240, "relocate")
    assert GS_SWEEP(4_194_304) == (240, "relocate")  # measured default
    assert GS_SWEEP(3_900_000) == GS_SWEEP(4_194_304)  # nearest


def test_tuned_config_accepts_sweep_override():
    """tiled_sweep rides tuned_config overrides straight to SimConfig
    (the production-rebuild adoption path)."""
    from gpu_physics_engine_tpu import tuned_config

    cfg = tuned_config(1_048_576, tiled_sweep="rebuild")
    assert cfg.tiled_sweep == "rebuild"
    assert tuned_config(1_048_576).tiled_sweep == "relocate"
    # the round-4 adopted defaults: small sizes rebuild (PERF.md "The
    # small-size sweep verdict"), explicit override still wins
    assert tuned_config(512_000).tiled_sweep == "rebuild"
    assert tuned_config(512_000,
                        tiled_sweep="relocate").tiled_sweep == "relocate"
