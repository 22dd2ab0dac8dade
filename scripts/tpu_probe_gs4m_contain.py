"""gs_4m PRODUCTION config long-horizon: does watchdog containment
hold over 21k steps?  The structural creep is super-linear uncontained
(5 -> 53% over 5k steps); production runs relocate-240 + the round-5
hardened watchdog (runaway ceiling at 4x bound, retile-futility
disarm).  This measures the honest contained equilibrium + its cost.
"""
import json, os, sys, time, traceback
sys.path.insert(0, "/root/repo")
T0 = time.time()
LOG = open("/tmp/tpu_probe_gs4m_contain.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
try:
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    n = 4_194_304
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tiled_solver="gs",
                    tile_multiplier=2.2, tile_cap=6, max_occupancy=8,
                    tiled_uniform_radius=True,
                    sort_interval_steps=240, tiled_watchdog=True)
    eng = TiledEngine(cfg, seed=0, chunk=16)
    for w in range(44):  # 44 x 480 = 21120 steps
        if time.time() - T0 > 45 * 60:
            log(stage="budget_stop", w=w); break
        t0 = time.perf_counter()
        eng.run(480)
        float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / 480 * 1e3
        log(stage="window", w=w, ms=round(ms, 3),
            stale_pct=round(float(eng._stale_frac(eng.state)) * 100, 4),
            wd=int(eng.watchdog_events), cap=eng.config.tile_cap)
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
