"""Scaling beyond the reference: 16M particles in a 4x world; 500-step
stability at the production 4M config."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_scale.jsonl", "a", buffering=1)
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

# ---- 16M particles, 4x world area (same 25%->98% density as 4M ref world)
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
    log(stage="scale_16M", error=traceback.format_exc()[-900:])

# ---- 500-step stability at 4M production config
try:
    n = 1 << 22
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                    sort_interval_steps=240)
    eng = TiledEngine(cfg, seed=7)
    marks = []
    for _ in range(5):
        eng.run(100)
        s = eng.state
        occ = s.pid >= 0
        live = int(jnp.sum(occ.astype(jnp.int32)))
        finite = bool(jnp.all(jnp.isfinite(jnp.where(occ, s.x, 0.0))))
        v = jnp.where(occ, jnp.abs(s.x - s.px) + jnp.abs(s.y - s.py), 0.0)
        marks.append(dict(live=live, finite=finite,
                          mean_v=round(float(jnp.sum(v)) / live, 4),
                          overflow=int(s.overflow_count)))
    log(stage="stability_4M_500", marks=marks)
except Exception:
    log(stage="stability_4M_500", error=traceback.format_exc()[-900:])
log(stage="done")
