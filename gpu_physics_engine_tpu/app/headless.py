"""Headless scripted runs — the BASELINE.json configs as a CLI.

The analog of running the reference app without a window: the frame loop of
State::update (state.rs:115-134) minus the render pass, plus optional
frame capture through the host viewer.  Examples:

  # config 1: 10k particles, 600 steps
  python -m gpu_physics_engine_tpu.app.headless --particles 10000 --steps 600

  # config 2: 100k with gravity + scripted attractor + spawn bursts
  python -m gpu_physics_engine_tpu.app.headless --particles 100000 \
      --steps 600 --gravity 0 -98 --attract 300 1524 524 --spawn 200 1524 524

  # config 4: 4M sustained with chrometrace export
  python -m gpu_physics_engine_tpu.app.headless --particles 4000000 \
      --steps 200 --substeps 2 --chrometrace benchmark.json

Prints the RenderTimer-style summary at exit (render_timer.rs:32-38).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from gpu_physics_engine_tpu import Engine, SimConfig
from gpu_physics_engine_tpu.utils.profiling import Profiler


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Headless particle simulation run")
    p.add_argument("--scene", type=str, default="",
                   help="run a named BASELINE scene preset (see scenes.py); "
                        "overrides --particles/--world/--gravity/event flags")
    p.add_argument("--particles", type=int, default=1_000_000)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--substeps", type=int, default=1)
    p.add_argument("--world", type=float, nargs=2, default=(3048.0, 1048.0))
    p.add_argument("--gravity", type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument("--dt", type=float, default=1.0 / 60.0)
    p.add_argument("--sort-interval", type=int, default=240,
                   help="Morton resort cadence in steps (4s at 60fps parity)")
    p.add_argument("--solver", choices=("colored", "fast", "jacobi"),
                   default="colored")
    p.add_argument("--pipeline", choices=("sorted", "bucket", "tiled"),
                   default="sorted")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--attract", type=float, nargs=3, metavar=("STEP", "X", "Y"),
                   action="append", default=[],
                   help="press the mouse attractor at STEP at world (X, Y)")
    p.add_argument("--release", type=int, action="append", default=[],
                   metavar="STEP", help="release the attractor at STEP")
    p.add_argument("--spawn", type=float, nargs=3, metavar=("STEP", "X", "Y"),
                   action="append", default=[],
                   help="spawn a 100-burst at STEP at world (X, Y)")
    p.add_argument("--render-every", type=int, default=0,
                   help="save a PNG frame every N steps")
    p.add_argument("--tilemap", action="store_true",
                   help="render device-aggregated tile density/velocity "
                        "maps instead of per-particle splats (tiled "
                        "pipeline only; ~1000x less host transfer at 4M)")
    p.add_argument("--out", type=str, default="frames")
    p.add_argument("--checkpoint", type=str, default="",
                   help="save a checkpoint at the end")
    p.add_argument("--resume", type=str, default="",
                   help="resume from a checkpoint (ignores --particles)")
    p.add_argument("--chrometrace", type=str, default="",
                   help="export chrome://tracing JSON (benchmark.json parity)")
    p.add_argument("--summary-json", action="store_true",
                   help="print a machine-readable summary line")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides",
                   help="override any SimConfig field by name (repeatable), "
                        "e.g. --set tile_cap=6 --set tile_multiplier=3.3 "
                        "--set tiled_relocate_interval=2 --set gs_layout=mx; "
                        "values are coerced to the field's type")
    return p


def apply_overrides(cfg: SimConfig, overrides) -> SimConfig:
    """--set K=V handling: coerce V to the dataclass field's type (bool
    accepts 0/1/true/false; floats/ints parsed; strings passed through)
    and replace.  Unknown fields raise with the list of valid names."""
    import dataclasses
    fields = {f.name: f for f in dataclasses.fields(SimConfig)}
    kw = {}
    for item in overrides:
        key, sep, val = item.partition("=")
        if not sep:
            raise SystemExit(f"--set expects K=V, got {item!r}")
        if key not in fields:
            raise SystemExit(f"--set: unknown SimConfig field {key!r} "
                             f"(valid: {', '.join(sorted(fields))})")
        current = getattr(cfg, key)
        if isinstance(current, bool):
            kw[key] = val.lower() in ("1", "true", "yes", "on")
        elif isinstance(current, int):
            kw[key] = int(val)
        elif isinstance(current, float):
            kw[key] = float(val)
        elif isinstance(current, tuple):
            kw[key] = tuple(float(v) for v in val.split(","))
        elif current is None:
            # Optional fields (e.g. tile_max_radius: float | None) carry
            # no runtime type — parse by value: none/int/float/str
            if val.lower() in ("none", "null"):
                kw[key] = None
            else:
                for cast in (int, float):
                    try:
                        kw[key] = cast(val)
                        break
                    except ValueError:
                        pass
                else:
                    kw[key] = val
        else:
            kw[key] = val
    return cfg.replace(**kw) if kw else cfg


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    if args.scene:
        from gpu_physics_engine_tpu import make_engine
        from gpu_physics_engine_tpu.scenes import get_scene
        scene = get_scene(args.scene)
        args.steps = scene.steps
        args.attract = [(e.step, *e.pos) for e in scene.events if e.kind == "press"]
        args.release = [e.step for e in scene.events if e.kind == "release"]
        args.spawn = [(e.step, *e.pos) for e in scene.events if e.kind == "spawn"]
        scene_cfg = apply_overrides(scene.config, args.overrides)
        args.pipeline = scene_cfg.pipeline
        eng = make_engine(scene_cfg, seed=args.seed)
    elif args.resume:
        import numpy as _np
        with _np.load(args.resume) as _z:
            is_tiled = "__kind__" in _z.files
        if is_tiled:
            from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
            from gpu_physics_engine_tpu.utils.checkpoint import (
                peek_tiled_config)
            # from_checkpoint re-tiles under the merged config (geometry
            # overrides are safe) and restores any big-particle overlay
            eng = TiledEngine.from_checkpoint(
                args.resume, seed=args.seed,
                config=apply_overrides(peek_tiled_config(args.resume),
                                       args.overrides))
            args.pipeline = "tiled"
        else:
            from gpu_physics_engine_tpu.utils.checkpoint import load_checkpoint
            state, cfg = load_checkpoint(args.resume)
            eng = Engine(apply_overrides(cfg, args.overrides),
                         seed=args.seed, initial_state=state)
    else:
        cfg = SimConfig(
            max_particles=args.particles + 100 * len(args.spawn),
            initial_particles=args.particles,
            world_width=args.world[0], world_height=args.world[1],
            gravity=tuple(args.gravity), dt=args.dt,
            substeps=args.substeps,
            sort_interval_steps=args.sort_interval,
            solver=args.solver, pipeline=args.pipeline)
        cfg = apply_overrides(cfg, args.overrides)
        args.pipeline = cfg.pipeline
        if args.pipeline == "tiled":
            from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
            eng = TiledEngine(cfg, seed=args.seed)
        else:
            eng = Engine(cfg, seed=args.seed)

    viewer = None
    if args.render_every:
        import os
        os.makedirs(args.out, exist_ok=True)
        if args.tilemap:
            if args.pipeline != "tiled":
                raise SystemExit("--tilemap needs --pipeline tiled")
            viewer = "tilemap"
        else:
            from gpu_physics_engine_tpu.render.viewer import Viewer
            viewer = Viewer(
                (eng.config.world_width, eng.config.world_height))

    attract = {int(s): (x, y) for s, x, y in args.attract}
    release = set(args.release)
    spawn = {int(s): (x, y) for s, x, y in args.spawn}

    prof = Profiler()
    with prof.scope("run"):
        for step_i in range(args.steps):
            if step_i in attract:
                eng.press_mouse(attract[step_i])
            if step_i in release:
                eng.release_mouse()
            if step_i in spawn:
                eng.spawn_at(spawn[step_i])
            with prof.scope(f"frame {step_i}"):
                eng.step()
                eng.timer.get_delta()
            if viewer and step_i % args.render_every == 0:
                path = f"{args.out}/frame_{step_i:06d}.png"
                if viewer == "tilemap":
                    from gpu_physics_engine_tpu.render.tilemap import (
                        render_tilemap)
                    from gpu_physics_engine_tpu.utils.png import write_png
                    write_png(path, render_tilemap(eng.state))
                else:
                    frame = viewer.render_engine(eng)
                    viewer.save_png(path, frame)
    _ = eng.num_particles()  # drain the device pipeline

    if args.checkpoint:
        if args.pipeline == "tiled":
            # engine method: includes the big-particle overlay, which
            # export_particles(state) alone would silently drop
            eng.save_checkpoint(args.checkpoint)
        else:
            from gpu_physics_engine_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(args.checkpoint, eng.state, eng.config)
    if args.chrometrace:
        prof.export_chrometrace(args.chrometrace)

    summary = {
        "particles": eng.num_particles(),
        "steps": args.steps,
        "avg_ms_per_step": eng.timer.average_ms,
        "fps": eng.timer.fps,
        "overflow_count": int(eng.state.overflow_count),
        "finite": bool(np.isfinite(eng.positions()).all()),
    }
    print(eng.timer.summary())
    if args.summary_json:
        print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
