"""Run the four_million scene preset's config on TPU for 64 steps."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_scene.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import jax.numpy as jnp
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.scenes import get_scene

try:
    sc = get_scene("four_million")
    eng = TiledEngine(sc.config, seed=0)
    eng.run(16)
    float(eng.state.x[0, 0, 0])
    t0 = time.perf_counter()
    eng.run(48)
    float(eng.state.x[0, 0, 0])
    ms = (time.perf_counter() - t0) / 48 * 1e3
    s = eng.state
    occ = s.pid >= 0
    live = int(jnp.sum(occ.astype(jnp.int32)))
    finite = bool(jnp.all(jnp.isfinite(jnp.where(occ, s.x, 0.0))))
    log(stage="scene_four_million", ms_per_step=round(ms, 3),
        live=live, finite=finite, substeps=sc.config.substeps)
except Exception:
    log(stage="scene_four_million", error=traceback.format_exc()[-700:])
log(stage="done")
