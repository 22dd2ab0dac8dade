"""4M stable-geometry search: the jam bisect put the stability boundary
near storage-headroom ratio cap/mean-occupancy ~ 2.2 (cap8 @ mult 3.3 =
2.23 stable; cap7 = 1.96 jams).  Smaller tiles reach the same ratio
with FEWER sweep ops per particle (ops/particle ~ cap^2/occ):
  mult 3.3 / cap 8: 64/3.58 = 17.9   (known stable, 7.67 ms)
  mult 3.0 / cap 7: 49/2.96 = 16.6   (ratio 2.37)
  mult 2.75/ cap 6: 36/2.49 = 14.5   (ratio 2.41)
plus iv4 at the known-stable geometry (fewer relocates).
All tiled_hysteresis=0, 12 x 480-step windows.

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_4m_geom.py > /tmp/probe_4mgeom.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_4mgeom.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

N = 4_194_304
WINDOW = 480
BASE = 22.70

# (mult, cap, iv)
RUNS = [
    (3.0, 7, 2),
    (2.75, 6, 2),
    (3.3, 8, 4),
]

for mult, cap, iv in RUNS:
    try:
        cfg = SimConfig(max_particles=N, initial_particles=N,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match="greedy",
                        tiled_relocate_interval=iv, tiled_hysteresis=0.0,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=16)
        worst = last = ms = 0.0
        best_ms = float("inf")
        for w in range(12):
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            best_ms = min(best_ms, ms)
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / N * 100.0) * iv
            worst = max(worst, defer) if w else defer
            last = defer
            log(stage="window", mult=mult, cap=cap, interval=iv, w=w,
                ms=round(ms, 3), defer_pop_pct=round(defer, 3))
            if defer > 25.0:
                log(stage="abort", mult=mult, cap=cap, reason="jammed")
                break
        log(stage="config_done", mult=mult, cap=cap, interval=iv,
            worst_defer=round(worst, 3), last_defer=round(last, 3),
            best_ms=round(best_ms, 3), vs_baseline=round(BASE / best_ms, 3))
        del eng
    except Exception:
        log(stage="error", mult=mult, cap=cap,
            err=traceback.format_exc()[-400:])

log(stage="done")
