"""Probe the rewritten band collide kernel (ops/tiled_pallas.py) on TPU.

Stages -> /tmp/tpu_probe_pallas2.jsonl:
  A. compile + correctness vs jnp collide @64k (hardware, not interpret)
  B. tiled full-step @1M and @4M, pallas collide, tile_cap 16
  C. phase breakdown @4M (relocate / collide jnp vs pallas / integrate)
  D. cap sweep @4M: 12, 20
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 40 * 60
LOG = open("/tmp/tpu_probe_pallas2.jsonl", "a", buffering=1)


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
from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas  # noqa: E402


def main():
    # ---- A: correctness on hardware vs jnp collide, small N
    try:
        cfg = SimConfig(max_particles=4096, initial_particles=4096,
                        world_width=100.0, world_height=50.0,
                        pipeline="tiled", tile_cap=16)
        rng = np.random.default_rng(0)
        pos = np.stack([rng.uniform(1, 99, 4096),
                        rng.uniform(1, 49, 4096)], -1).astype(np.float32)
        st = tiled.init_tiles(cfg, pos, np.full(4096, 0.5, np.float32))
        a = jax.jit(lambda s: tiled.collide(s, cfg))(st)
        b = jax.jit(lambda s: collide_pallas(s, cfg))(st)
        dx = float(jnp_abs_max(a.x, b.x))
        dy = float(jnp_abs_max(a.y, b.y))
        log(stage="pallas_vs_jnp@hw", max_abs_dx=dx, max_abs_dy=dy,
            ok=bool(dx < 1e-5 and dy < 1e-5))
    except Exception:
        log(stage="pallas_vs_jnp@hw", error=traceback.format_exc()[-1200:])
        return

    # ---- B: full-step timings
    for n, collide in ((1 << 20, "pallas"), (1 << 22, "pallas"),
                       (1 << 22, "jnp")):
        if DEADLINE - time.time() < 300:
            log(stage="skip", what=f"{collide}@{n}")
            continue
        try:
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=16,
                            tiled_collide=collide)
            t_b = time.time()
            eng = TiledEngine(cfg, seed=0)
            eng.run(3)
            float(eng.state.x[0, 0, 0])
            compile_s = time.time() - t_b
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                eng.run(20)
                float(eng.state.x[0, 0, 0])
                best = min(best, (time.perf_counter() - t0) / 20 * 1e3)
            log(stage="tiled_step", n=n, collide=collide,
                ms_per_step=round(best, 3), compile_s=round(compile_s, 1),
                overflow=int(eng.state.overflow_count))
        except Exception:
            log(stage=f"tiled_step {collide}@{n}",
                error=traceback.format_exc()[-1200:])

    # ---- C: phase breakdown @4M
    if DEADLINE - time.time() > 300:
        try:
            from gpu_physics_engine_tpu.utils.profiling import (
                tiled_phase_breakdown)
            n = 1 << 22
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=16)
            eng = TiledEngine(cfg, seed=0)
            eng.run(3)
            float(eng.state.x[0, 0, 0])
            ph = tiled_phase_breakdown(cfg, eng.state, eng.params(), repeats=5)
            log(stage="tiled_phases", n=n,
                phases={k: round(v, 2) for k, v in ph.items()})
        except Exception:
            log(stage="tiled_phases@4M", error=traceback.format_exc()[-1200:])

    # ---- D: cap sweep @4M
    for cap in (12, 20):
        if DEADLINE - time.time() < 240:
            log(stage="skip", what=f"cap{cap}")
            continue
        try:
            n = 1 << 22
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=cap,
                            tiled_collide="pallas")
            eng = TiledEngine(cfg, seed=0)
            eng.run(3)
            float(eng.state.x[0, 0, 0])
            t0 = time.perf_counter()
            eng.run(15)
            float(eng.state.x[0, 0, 0])
            log(stage="tiled_cap", cap=cap, n=n,
                ms_per_step=round((time.perf_counter() - t0) / 15 * 1e3, 3),
                overflow=int(eng.state.overflow_count))
        except Exception:
            log(stage=f"tiled_cap{cap}", error=traceback.format_exc()[-1200:])

    log(stage="done")


def jnp_abs_max(a, b):
    import jax.numpy as jnp
    return jnp.max(jnp.abs(a - b))


if __name__ == "__main__":
    main()
