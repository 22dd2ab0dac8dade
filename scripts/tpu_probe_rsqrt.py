"""rsqrt collide probe: correctness + cap/multiplier sweep at 4M."""
import json, os, time, traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_rsqrt.jsonl", "a", buffering=1)

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
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas

def main():
    try:
        cfg = SimConfig(max_particles=4096, initial_particles=4096,
                        world_width=100.0, world_height=50.0,
                        pipeline="tiled", tile_cap=16)
        rng = np.random.default_rng(0)
        pos = np.stack([rng.uniform(1, 99, 4096),
                        rng.uniform(1, 49, 4096)], -1).astype(np.float32)
        st = tiled.init_tiles(cfg, pos, np.full(4096, 0.5, np.float32))
        a = jax.jit(lambda s: tiled.collide(s, cfg))(st)
        b = jax.jit(lambda s: collide_pallas(s, cfg))(st)
        import jax.numpy as jnp
        dx = float(jnp.max(jnp.abs(a.x - b.x)))
        log(stage="rsqrt_match@hw", max_abs_dx=dx, ok=bool(dx < 1e-5))
    except Exception:
        log(stage="rsqrt_match@hw", error=traceback.format_exc()[-900:])
        return

    for c in (dict(tile_cap=14), dict(tile_cap=16), dict(tile_cap=12),
              dict(tile_cap=10, tile_multiplier=3.3),
              dict(tile_cap=8, tile_multiplier=3.3)):
        if time.time() - T0 > 40 * 60:
            log(stage="skip", cfg=c); continue
        try:
            n = 1 << 22
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
            log(stage="rsqrt_step", n=n, **c,
                ms_per_step=round(best, 3), compile_s=round(compile_s, 1),
                deferred_per_step=round(
                    (int(eng.state.overflow_count) - of0) / 40, 1))
        except Exception:
            log(stage=f"rsqrt {c}", error=traceback.format_exc()[-900:])
    log(stage="done")

if __name__ == "__main__":
    main()
