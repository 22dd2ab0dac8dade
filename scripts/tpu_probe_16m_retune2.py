"""16M retune round 2: cap8-quality picks with the relocate interval.

Round-1 sweep: cap6/iv4 hits 9.8 ms but at 7.9%/step deferred — the
storage-jam class (DESIGN.md §9); cap8/iv1 incumbent is clean (0.07%)
but 26 ms.  Probe the middle: cap8 + iv2/iv4, cap7 + iv2, both worlds.
"""
import json, os, sys, time, traceback
sys.path.insert(0, "/root/repo")
T0 = time.time()
LOG = open("/tmp/tpu_probe_16m_retune2.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
n = 1 << 24
RUNS = [
    ("square_cap8_iv4", (4310.0, 2965.0), 8, 4),
    ("square_cap8_iv2", (4310.0, 2965.0), 8, 2),
    ("square_cap7_iv2", (4310.0, 2965.0), 7, 2),
    ("wide_cap8_iv2", (6096.0, 2096.0), 8, 2),
]
for name, (w, h), cap, iv in RUNS:
    if time.time() - T0 > 35 * 60:
        log(stage="skip", name=name); continue
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        world_width=w, world_height=h, pipeline="tiled",
                        tile_cap=cap, tile_multiplier=3.3,
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0)
        eng.run(64); float(eng.state.x[0, 0, 0])
        of_prev = int(eng.state.overflow_count)
        best = float("inf")
        for wi in range(3):
            t0 = time.perf_counter()
            eng.run(48); float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / 48 * 1e3
            best = min(best, ms)
            of = int(eng.state.overflow_count)
            log(stage="window", name=name, w=wi, ms=round(ms, 3),
                defer_pop_pct=round((of - of_prev) / 48 / n * 100 * iv, 3))
            of_prev = of
        log(stage="health", name=name, ms=round(best, 3),
            pps=round(n / best * 1e3))
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])
log(stage="done")
