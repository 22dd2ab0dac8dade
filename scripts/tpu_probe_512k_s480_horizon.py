"""512k rebuild@480 long-horizon verdict (21k steps, the adoption bar).

The session-2 re-sweep (docs/probes_r4/tpu_probe_512k.jsonl) measured
cadence-480 rebuild at the incumbent (6.6, 7, iv4) geometry at
1.347 ms/step (-16% vs the adopted cadence-240 row's 1.605) with no
watchdog events — but its 2400-step stale trend was still rising
(0.38 -> 1.66%), short of the 21k-step horizon every adopted pick must
survive (PERF.md quality rule).  This runs the full 22x960-step
horizon, watchdog armed: adopt only if watchdog-free AND the stale
equilibrium stays in the documented 2-3% class.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_512k_s480_horizon.py > /tmp/probe_s480h.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_s480h.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

try:
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    N = 512_000
    cfg = SimConfig(max_particles=N, initial_particles=N,
                    pipeline="tiled", tile_multiplier=6.6, tile_cap=7,
                    tiled_match="greedy", tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=True,
                    tiled_sweep="rebuild", sort_interval_steps=480,
                    tiled_watchdog=True)
    eng = TiledEngine(cfg, seed=0, chunk=128)
    eng.run(16)
    float(eng.state.x[0, 0, 0])
    log(stage="ready", n=N)
    of_prev = int(eng.state.overflow_count)
    for w in range(22):
        if time.time() - T0 > 50 * 60:
            log(stage="budget_stop", w=w)
            break
        t0 = time.perf_counter()
        eng.run(960)
        float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / 960 * 1e3
        of = int(eng.state.overflow_count)
        log(stage="horizon", w=w, ms=round(ms, 3),
            defer_pop_pct=round((of - of_prev) / 960 / N * 100 * 4, 3),
            stale_pct=round(float(eng._stale_frac(eng.state)) * 100, 4),
            wd=int(eng.watchdog_events))
        of_prev = of
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
