"""Hardware validation of in-kernel-target relocate + CHUNK=16 timings."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_final.jsonl", "a", buffering=1)
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
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas

# conservation on hardware after a teleport (in-kernel targets)
try:
    cfg = SimConfig(max_particles=4096, initial_particles=4096,
                    world_width=100.0, world_height=50.0,
                    pipeline="tiled", tile_cap=16)
    rng = np.random.default_rng(0)
    pos = np.stack([rng.uniform(1, 99, 4096),
                    rng.uniform(1, 49, 4096)], -1).astype(np.float32)
    st = tiled.init_tiles(cfg, pos, np.full(4096, 0.5, np.float32))
    st2 = jax.jit(lambda s: relocate_pallas(
        tiled.TileState(x=s.x + jnp.where(s.pid >= 0, 1.7, 0.0), y=s.y,
                        px=s.px, py=s.py, radius=s.radius, pid=s.pid,
                        num_active=s.num_active,
                        overflow_count=s.overflow_count), cfg))(st)
    pid = np.asarray(st2.pid)
    live = int((pid >= 0).sum())
    uniq = len(np.unique(pid[pid >= 0]))
    log(stage="conserve@hw", live=live, unique=uniq,
        ok=bool(live == 4096 and uniq == 4096))
except Exception:
    log(stage="conserve@hw", error=traceback.format_exc()[-900:])

for n, cap, mult in ((1 << 22, 8, 3.3), (1 << 20, 5, 4.4)):
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap, tile_multiplier=mult)
        eng = TiledEngine(cfg, seed=0)
        eng.run(32)
        float(eng.state.x[0, 0, 0])
        of0 = int(eng.state.overflow_count)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(64)
            float(eng.state.x[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 64 * 1e3)
        log(stage="final_step", n=n, cap=cap, mult=mult,
            ms_per_step=round(best, 3),
            deferred_per_step=round(
                (int(eng.state.overflow_count) - of0) / 128, 1))
    except Exception:
        log(stage=f"final {n}", error=traceback.format_exc()[-900:])
log(stage="done")
