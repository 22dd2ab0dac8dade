"""4M deferral long-horizon probe: is the growing deferred population
(iv4 sweep: cap6/iv2 1.2% -> 5.8%, cap7/iv2 0.18% -> 0.58% across
consecutive 480-step windows) a slow settling transient, a plateau, or
unbounded heating?

Runs the 4M candidates for 12 x 480-step windows (5760 steps ~ 96 s of
sim time) and logs per-window deferred population, step time, and the
mean/max speed (velocity heating check: positional-correction solvers
can pump energy into an over-packed world until the MAX_VELOCITY clamp
binds).

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_4m_horizon.py > /tmp/probe_4mh.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_4mh.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

N = 4_194_304
WINDOW = 480


@jax.jit
def speed_stats(state):
    occ = state.pid >= 0
    vx = state.x - state.px
    vy = state.y - state.py
    v = jnp.sqrt(vx * vx + vy * vy)
    v = jnp.where(occ, v, 0.0)
    n = jnp.maximum(jnp.sum(occ), 1)
    return jnp.sum(v) / n, jnp.max(v)


for cap, iv in ((6, 2), (7, 2), (8, 4)):
    try:
        cfg = SimConfig(max_particles=N, initial_particles=N,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=3.3, tiled_match="greedy",
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=16)
        for w in range(12):
            of0 = float(eng.state.overflow_count)  # fetch = sync
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / N * 100.0) * iv
            vmean, vmax = speed_stats(eng.state)
            log(stage="window", cap=cap, interval=iv, w=w,
                steps=(w + 1) * WINDOW, ms=round(ms, 3),
                defer_pop_pct=round(defer, 3),
                v_mean=round(float(vmean), 5), v_max=round(float(vmax), 4))
        del eng
    except Exception:
        log(stage="error", cap=cap, interval=iv,
            err=traceback.format_exc()[-400:])

log(stage="done")
