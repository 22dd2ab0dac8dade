"""Radix sort hardware validation (fixed hist layout) + chunked-run bench."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_radix2.jsonl", "a", buffering=1)
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
    # stability: equal keys keep ascending payload order
    stable = True
    eq = ks_h[1:] == ks_h[:-1]
    ps_h = np.asarray(ps)
    stable = bool((ps_h[1:][eq] > ps_h[:-1][eq]).all())
    t0 = time.perf_counter()
    for _ in range(5):
        ks2, ps2 = f(jnp.asarray(keys), jnp.asarray(payload))
    _ = float(np.asarray(ks2[0]))
    log(stage="radix_sort@1M", correct=ok, stable=stable,
        ms_pipelined=round((time.perf_counter() - t0) / 5 * 1e3, 2))
except Exception:
    log(stage="radix_sort@1M", error=traceback.format_exc()[-900:])

# chunked-run step time at the production configs
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
for n, cap, mult in ((1 << 22, 8, 3.3), (1 << 20, 5, 4.4)):
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap, tile_multiplier=mult)
        eng = TiledEngine(cfg, seed=0)
        eng.run(16)
        float(eng.state.x[0, 0, 0])
        of0 = int(eng.state.overflow_count)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(48)
            float(eng.state.x[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 48 * 1e3)
        log(stage="chunked_step", n=n, cap=cap, mult=mult,
            ms_per_step=round(best, 3),
            deferred_per_step=round(
                (int(eng.state.overflow_count) - of0) / 96, 1))
    except Exception:
        log(stage=f"chunked {n}", error=traceback.format_exc()[-900:])
log(stage="done")
