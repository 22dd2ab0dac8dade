"""A/B the single-kernel relocate vs two-pass on TPU @4M production cfg."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_one.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import numpy as np
import jax.numpy as jnp
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.ops.tiled_pallas import (
    relocate_pallas, relocate_pallas_one)

n = 1 << 22
cfg = SimConfig(max_particles=n, initial_particles=n,
                pipeline="tiled", tile_cap=8, tile_multiplier=3.3)
eng = TiledEngine(cfg, seed=0)
eng.run(16)
float(eng.state.x[0, 0, 0])
state = eng.state

# correctness: bit-identical on hardware
try:
    a = jax.jit(lambda s: relocate_pallas(s, cfg))(state)
    b = jax.jit(lambda s: relocate_pallas_one(s, cfg))(state)
    same = all(bool(jnp.all(getattr(a, f) == getattr(b, f)))
               for f in ("x", "y", "px", "py", "radius", "pid"))
    log(stage="one_vs_two@hw", identical=same,
        of_a=int(a.overflow_count), of_b=int(b.overflow_count))
except Exception:
    log(stage="one_vs_two@hw", error=traceback.format_exc()[-700:])
    raise SystemExit

# timing
for name, fn in (("two_pass", relocate_pallas), ("one_kernel",
                                                 relocate_pallas_one)):
    try:
        f = jax.jit(lambda s, fn=fn: fn(s, cfg))
        o = f(state)
        float(o.x[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(state)
        float(o.x[0, 0, 0])
        log(stage=f"time_{name}",
            ms=round((time.perf_counter() - t0) / 10 * 1e3, 2))
    except Exception:
        log(stage=f"time_{name}", error=traceback.format_exc()[-500:])
log(stage="done")
