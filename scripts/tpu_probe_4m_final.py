"""4M final-pick refinement around the stable class (cap8/iv2/nohyst):
matching variant (flip2 vs greedy — greedy's plan is 8*cap^2 unrolled
ops and cap8 is its gate limit), chunk depth, and sweep budget.
12 x 480-step windows each (stability is the gate, speed the ranking).

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_4m_final.py > /tmp/probe_4mfinal.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_4mfinal.jsonl", "a", buffering=1)


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

# (match, chunk, sweep_cap)
RUNS = [
    ("flip2", 16, 0),
    ("greedy", 32, 0),
    ("greedy", 16, 1 << 16),
]

for match, chunk, scap in RUNS:
    try:
        cfg = SimConfig(max_particles=N, initial_particles=N,
                        pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                        tiled_match=match, tiled_relocate_interval=2,
                        tiled_hysteresis=0.0, sweep_mover_capacity=scap,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
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
                     / WINDOW / N * 100.0) * 2
            worst = max(worst, defer) if w else defer
            last = defer
            log(stage="window", match=match, chunk=chunk, scap=scap, w=w,
                ms=round(ms, 3), defer_pop_pct=round(defer, 3))
            if defer > 25.0:
                log(stage="abort", match=match, reason="jammed")
                break
        log(stage="config_done", match=match, chunk=chunk, scap=scap,
            worst_defer=round(worst, 3), last_defer=round(last, 3),
            best_ms=round(best_ms, 3), vs_baseline=round(BASE / best_ms, 3))
        del eng
    except Exception:
        log(stage="error", match=match, chunk=chunk,
            err=traceback.format_exc()[-400:])

log(stage="done")
