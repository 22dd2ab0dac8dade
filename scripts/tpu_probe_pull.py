"""Probe the pull-based Pallas relocate on TPU: full tiled step at 1M/4M.

Logs to /tmp/tpu_probe_pull.jsonl.  Stages:
  A. correctness @small: pull relocate conserves particles on hardware
  B. full tiled step (pallas collide + pallas relocate) @4M cap16, cap12
  C. @1M cap12 (auto-ish)
  D. phase timing: relocate_pallas alone @4M
  E. overflow trajectory: 40 steps at 4M, overflow delta per 10 steps
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_pull.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import numpy as np  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402
from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas  # noqa: E402


def main():
    # A: hardware conservation check
    try:
        cfg = SimConfig(max_particles=4096, initial_particles=4096,
                        world_width=100.0, world_height=50.0,
                        pipeline="tiled", tile_cap=16)
        rng = np.random.default_rng(0)
        pos = np.stack([rng.uniform(1, 99, 4096),
                        rng.uniform(1, 49, 4096)], -1).astype(np.float32)
        st = tiled.init_tiles(cfg, pos, np.full(4096, 0.5, np.float32))
        import jax.numpy as jnp
        st2 = jax.jit(lambda s: relocate_pallas(
            tiled.TileState(x=s.x + jnp.where(s.pid >= 0, 1.7, 0.0), y=s.y,
                            px=s.px, py=s.py, radius=s.radius, pid=s.pid,
                            num_active=s.num_active,
                            overflow_count=s.overflow_count), cfg))(st)
        n_live = int(np.sum(np.asarray(st2.pid) >= 0))
        log(stage="pull_conserves@hw", live=n_live, expected=4096,
            overflow=int(st2.overflow_count), ok=n_live == 4096)
    except Exception:
        log(stage="pull_conserves@hw", error=traceback.format_exc()[-1200:])
        return

    # B/C: full step timings
    for n, cap in ((1 << 22, 16), (1 << 22, 12), (1 << 20, 12)):
        try:
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=cap,
                            tiled_collide="pallas", tiled_relocate="pallas")
            tb = time.time()
            eng = TiledEngine(cfg, seed=0)
            eng.run(3)
            float(eng.state.x[0, 0, 0])
            compile_s = time.time() - tb
            of0 = int(eng.state.overflow_count)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                eng.run(20)
                float(eng.state.x[0, 0, 0])
                best = min(best, (time.perf_counter() - t0) / 20 * 1e3)
            log(stage="pull_step", n=n, cap=cap, ms_per_step=round(best, 3),
                compile_s=round(compile_s, 1), overflow_start=of0,
                overflow_per_step=round(
                    (int(eng.state.overflow_count) - of0) / 40, 1))
        except Exception:
            log(stage=f"pull_step cap{cap}@{n}",
                error=traceback.format_exc()[-1200:])

    # D: relocate_pallas phase time @4M cap12
    try:
        n, cap = 1 << 22, 12
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tiled_collide="pallas", tiled_relocate="pallas")
        eng = TiledEngine(cfg, seed=0)
        eng.run(3)
        float(eng.state.x[0, 0, 0])
        f = jax.jit(lambda s: relocate_pallas(s, cfg))
        out = f(eng.state)
        float(out.x[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(out)
        float(out.x[0, 0, 0])
        log(stage="pull_relocate_phase", n=n, cap=cap,
            ms=round((time.perf_counter() - t0) / 5 * 1e3, 2))
    except Exception:
        log(stage="pull_relocate_phase", error=traceback.format_exc()[-1200:])

    # E: overflow trajectory at 4M cap16 (does the transient settle?)
    try:
        n, cap = 1 << 22, 16
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tiled_collide="pallas", tiled_relocate="pallas")
        eng = TiledEngine(cfg, seed=1)
        deltas = []
        prev = int(eng.state.overflow_count)
        for _ in range(5):
            eng.run(10)
            cur = int(eng.state.overflow_count)
            deltas.append(round((cur - prev) / 10, 1))
            prev = cur
        log(stage="overflow_trajectory", n=n, cap=cap,
            deferred_per_step=deltas)
    except Exception:
        log(stage="overflow_trajectory", error=traceback.format_exc()[-1200:])

    log(stage="done")


if __name__ == "__main__":
    main()
