"""tiled_sweep="bands" on hardware: the sectioned rebuild verdict.

The monolithic rebuild does not compile at the 4M-GS geometry (81-min
compile ERROR after five attempts — docs/probes_r4/
tpu_probe_gs_rebuild.jsonl), so round 5 sections it: ops/tiled.
rebuild_band re-slots one 16-row band per program with a TRACED start
row (one compile, every position), targeted each sweep by the
stale_per_row histogram.  This measures, at the true geometries:

  (a) band program compile + per-dispatch cost at 4M GS (960x2773
      tiles; band = cap6 x 16 x 2773 = 266k slots),
  (b) gs_4m bands-240 health over a 5k-step horizon (the VERDICT r4
      bar: stale < 1%, zero watchdog trips, <= 13.3 ms/step),
  (c) band_k/rows variants (short windows) if (b) shows a gradient,
  (d) 512k ENGINE class at the incumbent (6.6, 7, iv4) geometry with
      bands instead of the +44% wholesale rebuild (core/tuned.py
      TUNED_OVERRIDES) — the weakest bench row (1.05x) candidate.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_bands.py > /tmp/probe_gs_bands.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_bands.jsonl", "a", buffering=1)


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


def gs_cfg(n, cap, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=8,
                     tiled_uniform_radius=True, **kw)


# (a) band program cost at the 4M GS geometry
try:
    eng = TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                             tiled_watchdog=False), seed=0, chunk=16)
    t0 = time.perf_counter()
    eng.state = eng._band_fn(eng.state, np.int32(100))
    float(eng.state.x[0, 0, 0])
    log(stage="band_compile", s=round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    for i in range(16):
        eng.state = eng._band_fn(eng.state, np.int32(100 + 16 * i))
    float(eng.state.x[0, 0, 0])
    log(stage="band_cost", name="gs4m_rows16",
        ms=round((time.perf_counter() - t0) / 16 * 1e3, 3))
    t0 = time.perf_counter()
    for _ in range(4):
        hist = np.asarray(eng._stale_rows_fn(eng.state))
    log(stage="hist_cost", ms=round((time.perf_counter() - t0) / 4 * 1e3, 3),
        hist_sum=int(hist.sum()))
    del eng
except Exception:
    log(stage="error", name="band_cost", err=traceback.format_exc()[-400:])


def health(name, mk_engine, windows, per=240, deadline_min=25):
    try:
        eng = mk_engine()
        best = float("inf")
        for w in range(windows):
            t0 = time.perf_counter()
            eng.run(per)
            stale = float(eng._stale_frac(eng.state)) * 100.0
            ms = (time.perf_counter() - t0) / per * 1e3
            if w >= 2:
                best = min(best, ms)
            log(stage="window", name=name, w=w, stale_pct=round(stale, 4),
                ms=round(ms, 3), wd=eng.watchdog_events,
                bands=eng.band_rebuilds)
            if time.perf_counter() - t0 > deadline_min * 60:
                log(stage="abort_slow", name=name)
                break
        log(stage="health", name=name, ms=round(best, 3),
            wd=eng.watchdog_events, bands=eng.band_rebuilds)
        del eng
        return True
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])
        return False


# (b) gs_4m bands-240 (watchdog ARMED: zero trips is part of the bar),
# 21 windows = 5040 steps
health("gs4m_bands240_k2",
       lambda: TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=2),
                           seed=0, chunk=16), windows=21)

# (c) a stronger dose, short horizon — compare stale slope
health("gs4m_bands240_k6",
       lambda: TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=6),
                           seed=0, chunk=16), windows=8)
health("gs4m_bands120_k2",
       lambda: TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                                  sort_interval_steps=120,
                                  tiled_band_rows=16, tiled_band_k=2),
                           seed=0, chunk=8), windows=8)

# (d) 512k engine class: incumbent geometry, bands instead of the +44%
# wholesale rebuild (10 windows = 2400 steps; the s480 horizon probe
# covers the 21k-step bar for whichever candidate wins)
from gpu_physics_engine_tpu.core.tuned import TUNED_NEWTON  # noqa: E402


def eng_512k():
    cfg = SimConfig(max_particles=512_000, initial_particles=512_000,
                    pipeline="tiled", tile_multiplier=6.6, tile_cap=7,
                    tiled_match="greedy", tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=TUNED_NEWTON,
                    tiled_sweep="bands", tiled_band_rows=16,
                    tiled_band_k=2, sort_interval_steps=240)
    return TiledEngine(cfg, seed=0, chunk=128)


health("512k_bands240_k2", eng_512k, windows=10)

log(stage="done")
