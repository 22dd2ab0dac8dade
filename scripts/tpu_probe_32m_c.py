"""32M quality variants: cap7 (more headroom) and iv2 (more relocates)
in the square 8x world that made 32M compile at all."""
import json, os, sys, time, traceback
sys.path.insert(0, "/root/repo")
T0 = time.time()
LOG = open("/tmp/tpu_probe_32m_c.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
n = 1 << 25
RUNS = [("square_cap7_iv4", 7, 4), ("square_cap6_iv2", 6, 2)]
for name, cap, iv in RUNS:
    if time.time() - T0 > 30 * 60:
        log(stage="skip", name=name); continue
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        world_width=6096.0, world_height=4192.0,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=3.3, tiled_relocate_interval=iv,
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
