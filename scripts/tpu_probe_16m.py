"""16M particles in a 4x world (the reference maxes at 4M)."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_16m.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import jax.numpy as jnp
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

try:
    n = 1 << 24
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=6096.0, world_height=2096.0,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3)
    tb = time.time()
    eng = TiledEngine(cfg, seed=0)
    eng.run(16)
    float(eng.state.x[0, 0, 0])
    compile_s = time.time() - tb
    of0 = int(eng.state.overflow_count)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(48)
        float(eng.state.x[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 48 * 1e3)
    live = int(jnp.sum((eng.state.pid >= 0).astype(jnp.int32)))
    log(stage="scale_16M", ms_per_step=round(best, 3),
        compile_s=round(compile_s, 1), live=live,
        deferred_per_step=round(
            (int(eng.state.overflow_count) - of0) / 96, 1))
except Exception:
    log(stage="scale_16M", error=traceback.format_exc()[-700:])
log(stage="done")
