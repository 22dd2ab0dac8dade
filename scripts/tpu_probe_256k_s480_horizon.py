"""256k rebuild@480 long-horizon verdict (21k steps, the adoption bar).

The 256k row pays the wholesale-rebuild stability tax like 512k does:
rebuild costs 54.6 ms at its 9-cap geometry, i.e. ~0.23 ms/step
amortized at the default 240-step cadence — ~26% of the 0.85-0.90 ms
step.  Halving the cadence to 480 would claw back ~0.11 ms/step
(≈1.42x -> ≈1.6x vs baseline) IF the longer gap between rebuilds does
not re-ignite the displacement-chain jam that killed rebuild@480 at
512k (wd=4 over 21k steps, docs/probes_r5/tpu_probe_s480h.jsonl).
256k runs at a lower storage-occupancy ratio than 512k, so the verdict
is not a foregone conclusion — but per the round-4/5 rule (three
candidates passed 2.4k screens and died at 21k) adoption requires the
FULL horizon watchdog-free with stale inside the documented 1.5%
bound.  If w<=21 survives at cadence 480, a second 960-cadence leg
runs the same bar.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_256k_s480_horizon.py > /tmp/probe_256k.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_256k_s480.jsonl", "a", buffering=1)


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

    N = 256_000
    for cadence in (480, 960):
        cfg = SimConfig(max_particles=N, initial_particles=N,
                        pipeline="tiled", tile_multiplier=12.1, tile_cap=9,
                        tiled_match="greedy", tiled_relocate_interval=2,
                        tiled_uniform_radius=True, tiled_newton=True,
                        tiled_sweep="rebuild", sort_interval_steps=cadence,
                        tiled_watchdog=True)
        eng = TiledEngine(cfg, seed=0, chunk=128)
        eng.run(16)
        float(eng.state.x[0, 0, 0])
        log(stage="ready", n=N, cadence=cadence)
        of_prev = int(eng.state.overflow_count)
        failed = False
        for w in range(22):
            if time.time() - T0 > 8 * 60:
                log(stage="budget_stop", w=w, cadence=cadence)
                failed = True
                break
            t0 = time.perf_counter()
            eng.run(960)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / 960 * 1e3
            of = int(eng.state.overflow_count)
            stale = float(eng._stale_frac(eng.state)) * 100
            wd = int(eng.watchdog_events)
            log(stage="horizon", w=w, cadence=cadence, ms=round(ms, 3),
                defer_pop_pct=round((of - of_prev) / 960 / N * 100 * 2, 3),
                stale_pct=round(stale, 4), wd=wd)
            of_prev = of
            if wd > 0 or stale > 1.5:
                log(stage="reject", cadence=cadence, w=w, wd=wd,
                    stale_pct=round(stale, 4))
                failed = True
                break
        if failed:
            break
        log(stage="survived", cadence=cadence)
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
