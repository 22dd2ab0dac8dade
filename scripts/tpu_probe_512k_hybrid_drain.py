"""512k hybrid: wholesale rebuild every 4th sweep (960 steps) + drain
bands on the other sweeps — already-plumbed mode combination
(tiled_sweep="bands" + tiled_rebuild_every=4).

Rationale: the rebuild-240 row pays 127 ms per 240 steps (+44%); pure
drain died at 21k (jam ignition ~8-10k steps, tpu_probe_512k_drain);
rebuild@480 alone died too (wd=4).  The hybrid bounds chain residue
at the 960-step rebuild cadence while the drain keeps the inter-
rebuild displacement down: tax ~0.13 + ~0.19 = 0.32 ms/step if it
holds.  21k-horizon, watchdog armed — the adoption bar.
"""
import json, os, sys, time, traceback
sys.path.insert(0, "/root/repo")
T0 = time.time()
LOG = open("/tmp/tpu_probe_512k_hybrid_drain.jsonl", "a", buffering=1)
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
    from gpu_physics_engine_tpu.core.tuned import TUNED_NEWTON
    N = 512_000
    cfg = SimConfig(max_particles=N, initial_particles=N,
                    pipeline="tiled", tile_multiplier=6.6, tile_cap=7,
                    tiled_match="greedy", tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=TUNED_NEWTON,
                    tiled_sweep="bands", tiled_band_rows=16,
                    tiled_band_k=2, tiled_rebuild_every=4,
                    sort_interval_steps=240, tiled_watchdog=True)
    eng = TiledEngine(cfg, seed=0, chunk=128)
    assert eng._sweep_rb is not None and eng._band_fn is not None
    eng.run(16); float(eng.state.x[0, 0, 0])
    log(stage="ready", n=N)
    of_prev = int(eng.state.overflow_count)
    for w in range(22):
        if time.time() - T0 > 45 * 60:
            log(stage="budget_stop", w=w); break
        t0 = time.perf_counter()
        eng.run(960); float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / 960 * 1e3
        of = int(eng.state.overflow_count)
        log(stage="horizon", w=w, ms=round(ms, 3),
            defer_pop_pct=round((of - of_prev) / 960 / N * 100 * 4, 3),
            stale_pct=round(float(eng._stale_frac(eng.state)) * 100, 4),
            wd=int(eng.watchdog_events), rb=eng.rebuild_sweeps,
            bands=eng.band_rebuilds)
        of_prev = of
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
