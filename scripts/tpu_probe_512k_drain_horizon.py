"""512k drain-bands 21k-step adoption probe (the quality-rule bar).

tpu_probe_gs_bands3.jsonl measured the drain-band candidate at the
incumbent 512k geometry: 1.484 ms/step (incumbent rebuild-240 row:
1.541 with the +44% sweep tax), stale 0.004 -> 0.11% over 2.4k steps,
watchdog-free.  Adoption of a contested pick requires the 21k-step
horizon (PERF.md quality rule; the rebuild@480 candidate DIED on this
same bar — tpu_probe_s480h.jsonl wd=4).  Watchdog armed.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_512k_drain_horizon.py > /tmp/probe_512k_drain.log 2>&1 &
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

T0 = time.time()
LOG = open("/tmp/tpu_probe_512k_drain.jsonl", "a", buffering=1)


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
    from gpu_physics_engine_tpu.core.tuned import TUNED_NEWTON

    N = 512_000
    cfg = SimConfig(max_particles=N, initial_particles=N,
                    pipeline="tiled", tile_multiplier=6.6, tile_cap=7,
                    tiled_match="greedy", tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=TUNED_NEWTON,
                    tiled_sweep="bands", tiled_band_rows=16,
                    tiled_band_k=2, sort_interval_steps=240,
                    tiled_watchdog=True)
    eng = TiledEngine(cfg, seed=0, chunk=128)
    eng.run(16)
    float(eng.state.x[0, 0, 0])
    log(stage="ready", n=N)
    of_prev = int(eng.state.overflow_count)
    for w in range(22):
        if time.time() - T0 > 45 * 60:
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
            wd=int(eng.watchdog_events), bands=eng.band_rebuilds)
        of_prev = of
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
