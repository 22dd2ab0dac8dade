"""Final geometry tuning around tile_multiplier 3.3 / cap 8."""
import json, os, time, traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_tune.jsonl", "a", buffering=1)

def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

CONFIGS = [
    dict(n=1 << 22, tile_cap=8, tile_multiplier=3.5),
    dict(n=1 << 22, tile_cap=9, tile_multiplier=3.3),
    dict(n=1 << 20, tile_cap=6, tile_multiplier=3.3),
    dict(n=1 << 20, tile_cap=4, tile_multiplier=3.3),
]

for c in CONFIGS:
    if time.time() - T0 > 40 * 60:
        log(stage="skip", cfg=c); continue
    try:
        n = c.pop("n")
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tiled_collide="pallas",
                        tiled_relocate="pallas", **c)
        tb = time.time()
        eng = TiledEngine(cfg, seed=0)
        eng.run(10)
        float(eng.state.x[0, 0, 0])
        compile_s = time.time() - tb
        of0 = int(eng.state.overflow_count)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(20)
            float(eng.state.x[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 20 * 1e3)
        log(stage="tune_step", n=n, **c,
            ms_per_step=round(best, 3), compile_s=round(compile_s, 1),
            deferred_per_step=round(
                (int(eng.state.overflow_count) - of0) / 40, 1))
    except Exception:
        log(stage=f"tune {c}", error=traceback.format_exc()[-900:])
log(stage="done")
