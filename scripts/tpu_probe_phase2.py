"""Phase split of the production config + final multiplier micro-sweep +
radix sort validation."""
import json, os, time, traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_phase2.jsonl", "a", buffering=1)

def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import numpy as np
from gpu_physics_engine_tpu import SimConfig, StepParams
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.tiled_pallas import (
    collide_integrate_pallas, relocate_pallas)

# ---- A: phase split at the production 4M config
try:
    n = 1 << 22
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                    tiled_collide="pallas", tiled_relocate="pallas")
    eng = TiledEngine(cfg, seed=0)
    eng.run(5)
    float(eng.state.x[0, 0, 0])
    params = eng.params()

    def timeit(name, fn):
        f = jax.jit(fn)
        out = f(eng.state)
        float(out.x[0, 0, 0])
        t0 = time.perf_counter()
        s = eng.state
        for _ in range(10):
            s = f(s)
        float(s.x[0, 0, 0])
        log(stage="phase", name=name,
            ms=round((time.perf_counter() - t0) / 10 * 1e3, 2))

    timeit("noop", lambda s: tiled.TileState(
        x=s.x + 1.0, y=s.y, px=s.px, py=s.py, radius=s.radius, pid=s.pid,
        num_active=s.num_active, overflow_count=s.overflow_count))
    timeit("relocate_pull", lambda s: relocate_pallas(s, cfg))
    timeit("collide_integrate_fused",
           lambda s: collide_integrate_pallas(s, params, cfg))
except Exception:
    log(stage="phase", error=traceback.format_exc()[-900:])

# ---- B: multiplier micro-sweep at 4M
for c in (dict(tile_cap=9, tile_multiplier=3.5),
          dict(tile_cap=8, tile_multiplier=3.4)):
    if time.time() - T0 > 35 * 60:
        log(stage="skip", cfg=c); continue
    try:
        n = 1 << 22
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
        log(stage="sweep", n=n, **c, ms_per_step=round(best, 3),
            deferred_per_step=round(
                (int(eng.state.overflow_count) - of0) / 40, 1))
    except Exception:
        log(stage=f"sweep {c}", error=traceback.format_exc()[-900:])

# ---- C: radix sort compile + correctness + speed @1M
try:
    from gpu_physics_engine_tpu.ops.radix_sort import radix_sort_pairs
    rng = np.random.default_rng(0)
    n = 1 << 20
    keys = rng.integers(0, 1 << 24, n, dtype=np.uint32)
    payload = np.arange(n, dtype=np.uint32)
    f = jax.jit(lambda k, p: radix_sort_pairs(k, p, num_bits=24))
    import jax.numpy as jnp
    ks, ps = f(jnp.asarray(keys), jnp.asarray(payload))
    ks_h = np.asarray(ks)
    ok = bool((ks_h[1:] >= ks_h[:-1]).all()
              and (keys[np.asarray(ps)] == ks_h).all())
    t0 = time.perf_counter()
    out = f(jnp.asarray(keys), jnp.asarray(payload))
    _ = float(np.asarray(out[0][0]))
    ms1 = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(jnp.asarray(keys), jnp.asarray(payload))
    _ = float(np.asarray(out[0][0]))
    log(stage="radix_sort@1M", correct=ok, ms_single=round(ms1, 2),
        ms_pipelined=round((time.perf_counter() - t0) / 5 * 1e3, 2))
except Exception:
    log(stage="radix_sort@1M", error=traceback.format_exc()[-900:])
log(stage="done")
