"""tiled_sweep="bands" DRAIN semantics on hardware (round-5 attempt 2).

Attempt 1 (tpu_probe_gs_bands.py, docs/probes_r5/tpu_probe_gs_bands.
jsonl) ran wholesale-rebuild semantics per band and TRIPLED the 4M-GS
stale creep (5% -> 26% over 5k steps, dose-independent): at 103% fill
the loser zip scattered over-capacity particles to far free slots,
destroying the near-home locality that keeps the 3x3 membership
window covering their pairs.  ops/tiled.rebuild_band is now a pure
stale DRAIN (stale -> home only when home has a dead slot; losers
untouched) — monotone improvement by construction.  Verdict stages:

  (a) drain program cost at the 4M-GS geometry,
  (b) gs_4m drain-240 k2 over the 5k-step horizon (bar: stale < 1%*,
      zero watchdog trips, <= 13.3 ms/step; *the structural floor is
      the over-capacity population — log it at init for the honest
      denominator),
  (c) heavier doses if (b) improves but creeps,
  (d) 512k engine class with drain bands (weakest-row candidate).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_bands2.py > /tmp/probe_gs_bands2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_bands2.jsonl", "a", buffering=1)


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


# (a) drain program cost + the structural stale floor at init
try:
    eng = TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                             tiled_watchdog=False), seed=0, chunk=16)
    log(stage="init_stale",
        stale_pct=round(float(eng._stale_frac(eng.state)) * 100.0, 4))
    t0 = time.perf_counter()
    eng.state = eng._band_fn(eng.state, np.int32(100))
    float(eng.state.x[0, 0, 0])
    log(stage="band_compile", s=round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    for i in range(16):
        eng.state = eng._band_fn(eng.state, np.int32(100 + 16 * i))
    float(eng.state.x[0, 0, 0])
    log(stage="band_cost", name="gs4m_drain_rows16",
        ms=round((time.perf_counter() - t0) / 16 * 1e3, 3))
    del eng
except Exception:
    log(stage="error", name="band_cost", err=traceback.format_exc()[-400:])


def health(name, mk_engine, windows, per=240):
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
        log(stage="health", name=name, ms=round(best, 3),
            wd=eng.watchdog_events, bands=eng.band_rebuilds)
        del eng
        return True
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])
        return False


# (b) the 5k-step horizon, watchdog armed
health("gs4m_drain240_k2",
       lambda: TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=2),
                           seed=0, chunk=16), windows=21)

# (c) heavier dose, short horizon
health("gs4m_drain240_k6",
       lambda: TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=6),
                           seed=0, chunk=16), windows=8)

# (c2) cap 7: the drain can only move stale into DEAD slots — at cap 6
# / 103% fill the dense regions have almost none (the structural
# floor).  cap 7 adds a full spare plane of dead slots everywhere;
# if the floor is capacity-bound this is where stale actually sinks.
# (cap is storage only — bit-exactness is cap-independent, round 3.)
health("gs4m_cap7_drain240_k2",
       lambda: TiledEngine(gs_cfg(4_194_304, 7, tiled_sweep="bands",
                                  sort_interval_steps=240,
                                  tiled_band_rows=16, tiled_band_k=2),
                           seed=0, chunk=16), windows=12)
# cap-7 control without bands: is it the cap or the drain?
health("gs4m_cap7_ctl",
       lambda: TiledEngine(gs_cfg(4_194_304, 7,
                                  sort_interval_steps=240),
                           seed=0, chunk=16), windows=8)

# (d) 512k engine class at the incumbent geometry
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
