"""Vector 7 for the 4M-GS creep: sweep budget sized to the POPULATION.

The periodic exact claim sweep's default budget is max_particles//16 =
262k movers — but the displaced population at 4M-GS reaches millions
(5 -> 91% of 4.19M over 21k steps).  A sweep that can only compact
262k entries per cadence is structurally unable to drain it, chains
or no chains.  Round-2 already measured budget-sensitivity ("a 64k
sweep budget re-grows to 6%/step").  Probe the full-population
budget: sweep_mover_capacity = 1M and 4.2M at cap 6, relocate-240,
watchdog armed, 21k horizon.
"""
import json, os, sys, time, traceback
sys.path.insert(0, "/root/repo")
T0 = time.time()
LOG = open("/tmp/tpu_probe_gs4m_budget.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
n = 4_194_304
for name, budget, windows in (("budget_1m", 1 << 20, 14),
                              ("budget_4m", n, 30)):
    if time.time() - T0 > 42 * 60:
        log(stage="skip", name=name); continue
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=6, max_occupancy=8,
                        tiled_uniform_radius=True,
                        sort_interval_steps=240, tiled_watchdog=True,
                        sweep_mover_capacity=budget)
        eng = TiledEngine(cfg, seed=0, chunk=16)
        # sweep cost alone first (compile + 4 timed)
        t0 = time.time()
        eng.state = eng._sweep(eng.state, eng._sweep_off())
        float(eng.state.x[0, 0, 0])
        log(stage="sweep_compile", name=name, s=round(time.time() - t0, 1))
        t0 = time.perf_counter()
        for _ in range(4):
            eng.state = eng._sweep(eng.state, eng._sweep_off())
        float(eng.state.x[0, 0, 0])
        log(stage="sweep_cost", name=name,
            ms=round((time.perf_counter() - t0) / 4 * 1e3, 3))
        for w in range(windows):  # windows x 480 steps
            if time.time() - T0 > 46 * 60:
                log(stage="budget_stop", name=name, w=w); break
            t0 = time.perf_counter()
            eng.run(480)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / 480 * 1e3
            log(stage="window", name=name, w=w, ms=round(ms, 3),
                stale_pct=round(float(eng._stale_frac(eng.state)) * 100, 4),
                wd=int(eng.watchdog_events), cap=eng.config.tile_cap)
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])
log(stage="done")
