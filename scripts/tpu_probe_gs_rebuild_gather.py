"""Attempt #6 at the 4M-GS wholesale rebuild: the GATHER flavor.

Five payload-sort attempts black-holed or compile-errored (81 min) at
the 16M-slot GS geometry; meanwhile the round-5 containment probe
showed the production config rides stale to 91% over 21k steps — a
wholesale re-slot is the only mechanism that can hold 103% fill.
rebuild_gather sorts only (key, src) and moves the six planes by
gather: a far smaller program graph, bit-identical placement
(tests/test_rebuild.py).  Stages, each bounded:
  (a) compile + single-shot cost at gs_4m geometry,
  (b) cost at cadence 240 + stale trajectory over 21k steps
      (windows of 480), watchdog armed.
This workload class may black-hole the compile service: run LAST,
nothing queued behind (CLAUDE.md rule).
"""
import json, os, sys, time, traceback
sys.path.insert(0, "/root/repo")
T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_rebuild_gather.jsonl", "a", buffering=1)
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
                    tiled_uniform_radius=True, tiled_sweep="rebuild",
                    tiled_rebuild_impl="gather",
                    sort_interval_steps=240, tiled_watchdog=True)
    eng = TiledEngine(cfg, seed=0, chunk=16)
    t0 = time.time()
    eng.state = eng._sweep(eng.state, eng._sweep_off())
    float(eng.state.x[0, 0, 0])
    log(stage="rebuild_gather_compile", s=round(time.time() - t0, 1))
    t0 = time.perf_counter()
    for _ in range(4):
        eng.state = eng._sweep(eng.state, eng._sweep_off())
    float(eng.state.x[0, 0, 0])
    log(stage="rebuild_gather_cost",
        ms=round((time.perf_counter() - t0) / 4 * 1e3, 3))
    for w in range(44):  # 21k-step containment horizon
        if time.time() - T0 > 50 * 60:
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
