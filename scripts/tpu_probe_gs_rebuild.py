"""tiled_sweep="rebuild" on hardware: cost + stale equilibrium at 4M GS.

The budgeted relocate sweep leaves a compounding stale residue at 4M
GS density at any cadence/cap (tpu_probe_gs4m_cadence.jsonl) because
free-slot claims cannot resolve displacement chains across full tiles;
ops/tiled.rebuild re-slots everyone at home in one stable sort.  This
measures (a) the rebuild's own cost at the GS 4M geometry, (b) the
stale-pair trajectory with rebuild sweeps at cadence 240 and 60,
(c) 3M with rebuild (its 0.15-0.26% residue should pin near zero).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_rebuild.py > /tmp/probe_gs_rebuild.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_rebuild.jsonl", "a", buffering=1)


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
                     tiled_uniform_radius=True, tiled_watchdog=False,
                     **kw)


# (a) rebuild cost at 4M GS geometry: time 8 sweeps back-to-back
try:
    eng = TiledEngine(gs_cfg(4_194_304, 6, tiled_sweep="rebuild"),
                      seed=0, chunk=16)
    eng.state = eng._sweep(eng.state, eng._sweep_off())  # compile
    float(eng.state.x[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(8):
        eng.state = eng._sweep(eng.state, eng._sweep_off())
    float(eng.state.x[0, 0, 0])
    log(stage="rebuild_cost", name="gs4m_cap6",
        ms=round((time.perf_counter() - t0) / 8 * 1e3, 3))
    del eng
except Exception:
    log(stage="error", name="rebuild_cost",
        err=traceback.format_exc()[-400:])


def health(name, n, cap, interval, windows=5, chunk=16):
    try:
        eng = TiledEngine(gs_cfg(n, cap, tiled_sweep="rebuild",
                                 sort_interval_steps=interval),
                          seed=0, chunk=chunk)
        best = float("inf")
        for w in range(windows):
            t0 = time.perf_counter()
            eng.run(240)
            stale = float(eng._stale_frac(eng.state)) * 100.0
            ms = (time.perf_counter() - t0) / 240 * 1e3
            if w >= 2:
                best = min(best, ms)
            log(stage="window", name=name, w=w,
                stale_pct=round(stale, 4), ms=round(ms, 3))
        log(stage="health", name=name, n=n, cap=cap, interval=interval,
            ms=round(best, 3))
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])


# (b) 4M cap6 with rebuild sweeps
health("gs4m_rb240", 4_194_304, 6, 240)
health("gs4m_rb60", 4_194_304, 6, 60)
# (c) 3M with rebuild at default cadence
health("gs3m_rb240", 3_000_000, 6, 240)
log(stage="done")
