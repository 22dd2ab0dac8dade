"""1M-focused tuning + 100-step physics sanity at the chosen 4M config."""
import json, os, time, traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_tune2.jsonl", "a", buffering=1)

def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import jax.numpy as jnp
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

CONFIGS = [
    dict(n=1 << 20, tile_cap=6, tile_multiplier=4.4),
    dict(n=1 << 20, tile_cap=5, tile_multiplier=4.4),
    dict(n=1 << 20, tile_cap=3, tile_multiplier=3.3),
]

for c in CONFIGS:
    try:
        n = c.pop("n")
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tiled_collide="pallas",
                        tiled_relocate="pallas", **c)
        eng = TiledEngine(cfg, seed=0)
        eng.run(10)
        float(eng.state.x[0, 0, 0])
        of0 = int(eng.state.overflow_count)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(20)
            float(eng.state.x[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 20 * 1e3)
        log(stage="tune_step", n=n, **c, ms_per_step=round(best, 3),
            deferred_per_step=round(
                (int(eng.state.overflow_count) - of0) / 40, 1))
    except Exception:
        log(stage=f"tune {c}", error=traceback.format_exc()[-900:])

# physics sanity at the production 4M config: 100 steps, finite, alive
try:
    n = 1 << 22
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                    tiled_collide="pallas", tiled_relocate="pallas")
    eng = TiledEngine(cfg, seed=3)
    checks = []
    for _ in range(5):
        eng.run(20)
        s = eng.state
        occ = s.pid >= 0
        n_live = int(jnp.sum(occ.astype(jnp.int32)))
        finite = bool(jnp.all(jnp.isfinite(jnp.where(occ, s.x, 0.0)))
                      & jnp.all(jnp.isfinite(jnp.where(occ, s.y, 0.0))))
        v = jnp.where(occ, jnp.abs(s.x - s.px) + jnp.abs(s.y - s.py), 0.0)
        checks.append(dict(live=n_live, finite=finite,
                           mean_v=round(float(jnp.sum(v)) / n_live, 4),
                           overflow=int(s.overflow_count)))
    log(stage="sanity_4m", checks=checks, expected_live=n)
except Exception:
    log(stage="sanity_4m", error=traceback.format_exc()[-900:])
log(stage="done")
