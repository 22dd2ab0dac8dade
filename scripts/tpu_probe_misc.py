"""Validate radix flat-gather speedup + chunked fast solver on TPU."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_misc.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import numpy as np
import jax.numpy as jnp

try:
    from gpu_physics_engine_tpu.ops.radix_sort import radix_sort_pairs
    rng = np.random.default_rng(0)
    n = 1 << 20
    keys = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    payload = np.arange(n, dtype=np.uint32)
    f = jax.jit(lambda k, p: radix_sort_pairs(k, p, num_bits=24))
    ks, ps = f(jnp.asarray(keys), jnp.asarray(payload))
    ks_h = np.asarray(ks)
    ok = bool((ks_h[1:] >= ks_h[:-1]).all()
              and (keys[np.asarray(ps)] == ks_h).all())
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(jnp.asarray(keys), jnp.asarray(payload))
    _ = float(np.asarray(out[0][0]))
    log(stage="radix_flat@1M", correct=ok,
        ms=round((time.perf_counter() - t0) / 5 * 1e3, 2))
except Exception:
    log(stage="radix_flat@1M", error=traceback.format_exc()[-900:])

try:
    from gpu_physics_engine_tpu import Engine, SimConfig
    n = 1 << 20
    cfg = SimConfig(max_particles=n, initial_particles=n, solver="fast")
    eng = Engine(cfg, seed=0)
    eng.run(8)
    float(eng.state.x[0])
    t0 = time.perf_counter()
    eng.run(32)
    float(eng.state.x[0])
    log(stage="fast_chunked@1M",
        ms_per_step=round((time.perf_counter() - t0) / 32 * 1e3, 2))
except Exception:
    log(stage="fast_chunked@1M", error=traceback.format_exc()[-900:])
log(stage="done")
