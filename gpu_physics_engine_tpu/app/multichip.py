"""Multi-chip headless runner (BASELINE config 5: grid tiles sharded with
halo exchange over ICI).

Runs the sharded tiled pipeline over all available devices (or a virtual
CPU mesh for validation):

  # 8-virtual-device validation run
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m gpu_physics_engine_tpu.app.multichip --cpu --particles 4096 \
      --world 256 256 --steps 50

  # real mesh (when multiple chips are visible)
  python -m gpu_physics_engine_tpu.app.multichip --particles 16777216 --steps 100
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=1 << 20)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--world", type=float, nargs=2, default=(6096.0, 2096.0))
    p.add_argument("--gravity", type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument("--devices", type=int, default=0,
                   help="mesh size (0 = all available)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (virtual-device validation)")
    p.add_argument("--tile-cap", type=int, default=16)
    p.add_argument("--summary-json", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from gpu_physics_engine_tpu import SimConfig, StepParams
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import mesh as mesh_lib, tiled_shard

    n_dev = args.devices or len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev)
    cfg = SimConfig(
        max_particles=args.particles, initial_particles=args.particles,
        world_width=args.world[0], world_height=args.world[1],
        gravity=tuple(args.gravity), pipeline="tiled",
        tile_cap=args.tile_cap, solver="fast")

    rng = np.random.default_rng(0)
    positions = np.stack([
        rng.uniform(0.0, cfg.world_width, args.particles),
        rng.uniform(0.0, cfg.world_height, args.particles)], -1).astype(np.float32)
    radii = np.full(args.particles, cfg.initial_radius, np.float32)

    t0 = time.perf_counter()
    eng = tiled_shard.ShardedTiledEngine(
        cfg, mesh=mesh, initial_arrays=(positions, radii, None, None))
    eng.step(StepParams.make(cfg.dt))
    _ = int(eng.state.num_active)  # drain: compile + first step
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    eng.run(args.steps)
    n_alive = int(eng.state.num_active)  # fetch-sync
    ms = (time.perf_counter() - t0) / args.steps * 1e3

    state = eng.state
    _, pos, _, _ = export_particles(state)
    # "deferred", not "dropped": in the two-phase sharded tiled pipeline
    # an over-capacity mover keeps its source slot and retries next step
    # (parallel/tiled_shard.py lossless migration) — the counter is a
    # retry diagnostic, nothing is ever lost
    summary = {
        "devices": n_dev,
        "particles": n_alive,
        "deferred": int(state.overflow_count),
        "per_chip_deferred": [int(v) for v in eng.per_chip_overflow],
        "steps": args.steps,
        "ms_per_step": round(ms, 3),
        "finite": bool(np.isfinite(pos).all()),
        "compile_s": round(compile_s, 1),
    }
    print(f"mesh={n_dev} devices | {n_alive} particles | "
          f"{ms:.2f} ms/step | deferred={summary['deferred']} "
          f"(per-chip {summary['per_chip_deferred']})")
    if args.summary_json:
        print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
