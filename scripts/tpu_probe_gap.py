"""Where do the ~3 ms between sum-of-phases and full step go? (4M prod cfg)"""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_gap.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import jax.numpy as jnp
from functools import partial
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.tiled_pallas import (
    collide_integrate_pallas, relocate_pallas)

n = 1 << 22
cfg = SimConfig(max_particles=n, initial_particles=n,
                pipeline="tiled", tile_cap=8, tile_multiplier=3.3)
eng = TiledEngine(cfg, seed=0)
eng.run(16)
float(eng.state.x[0, 0, 0])
params = eng.params()
state = eng.state

def timeit(name, fn, *args, reps=10):
    try:
        f = jax.jit(fn)
        out = f(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0].astype(jnp.float32))
        t0 = time.perf_counter()
        o = out
        for _ in range(reps):
            o = f(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[0].astype(jnp.float32))
        log(stage=name, ms=round((time.perf_counter() - t0) / reps * 1e3, 2))
    except Exception:
        log(stage=name, error=traceback.format_exc()[-400:])

timeit("noop", lambda s: s.x + 1.0, state)
timeit("relocate_only", lambda s: relocate_pallas(s, cfg), state)
timeit("fused_only", lambda s: collide_integrate_pallas(s, params, cfg), state)
timeit("full_step", lambda s: tiled.tiled_step_fn(s, params, cfg), state)
# chained pair inside one jit (no scan): does combining add cost?
timeit("relocate_then_fused", lambda s: collide_integrate_pallas(
    relocate_pallas(s, cfg), params, cfg), state)
log(stage="done")
