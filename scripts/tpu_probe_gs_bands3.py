"""gs_4m band-drain + capacity verdicts, measured CLEAN (attempt 3).

Attempt 2 (tpu_probe_gs_bands2.jsonl) armed the watchdog during the
measurement: the new runaway ceiling correctly fired, its +1-cap
retiles each cost a ~200 s full recompile (windows ballooned to
1177 ms/step), stale kept climbing through cap 9 — that run IS the
structural-jam evidence (and drove the retile-futility self-disarm in
_watchdog), but it contaminated the drain measurement.  This probe
measures with the watchdog OFF:

  (a) gs4m cap6 drain-240 k2, 21 windows — the clean drain trajectory
      (attempt-2 w0-2 suggest the drain is a no-op at cap6: the dense
      tiles have zero dead slots to drain into),
  (b) gs4m cap7 CONTROL (no bands) — round 3 recorded cap6==cap7
      creep for the claim relocate; reconfirm on current code,
  (c) gs4m cap7 + drain — cap7's spare plane gives the drain dead
      slots everywhere; if the creep is capacity-bound THIS is where
      it stops,
  (d) 512k drain-240 k2, watchdog ON (production candidate for the
      weakest bench row).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_bands3.py > /tmp/probe_gs_bands3.log 2>&1 &
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_bands3.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402


def gs_cfg(n, cap, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=8,
                     tiled_uniform_radius=True, **kw)


def health(name, mk_engine, windows, per=240, budget_min=30):
    try:
        t_start = time.time()
        eng = mk_engine()
        best = float("inf")
        for w in range(windows):
            if time.time() - t_start > budget_min * 60:
                log(stage="budget_stop", name=name, w=w)
                break
            t0 = time.perf_counter()
            eng.run(per)
            stale = float(eng._stale_frac(eng.state)) * 100.0
            ms = (time.perf_counter() - t0) / per * 1e3
            if w >= 2:
                best = min(best, ms)
            log(stage="window", name=name, w=w, stale_pct=round(stale, 4),
                ms=round(ms, 3), wd=eng.watchdog_events,
                bands=eng.band_rebuilds)
        log(stage="health", name=name, ms=round(best, 3),
            wd=eng.watchdog_events, bands=eng.band_rebuilds)
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])


health("gs4m_cap6_drain_clean",
       lambda: TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=2,
                                  tiled_watchdog=False),
                           seed=0, chunk=16), windows=21)

health("gs4m_cap7_ctl",
       lambda: TiledEngine(gs_cfg(4_194_304, 7,
                                  sort_interval_steps=240,
                                  tiled_watchdog=False),
                           seed=0, chunk=16), windows=12)

health("gs4m_cap7_drain",
       lambda: TiledEngine(gs_cfg(4_194_304, 7, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=2,
                                  tiled_watchdog=False),
                           seed=0, chunk=16), windows=12)

from gpu_physics_engine_tpu.core.tuned import TUNED_NEWTON  # noqa: E402


def eng_512k():
    cfg = SimConfig(max_particles=512_000, initial_particles=512_000,
                    pipeline="tiled", tile_multiplier=6.6, tile_cap=7,
                    tiled_match="greedy", tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=TUNED_NEWTON,
                    tiled_sweep="bands", tiled_band_rows=16,
                    tiled_band_k=2, sort_interval_steps=240)
    return TiledEngine(cfg, seed=0, chunk=128)


health("512k_drain240_k2", eng_512k, windows=10)

log(stage="done")
