"""Round-2 TPU sweep: per-size tile geometry for the full reference curve.

The reference publishes 8 sizes (README.md:80-87, RX 6800 XT):
  100k 1.03 | 256k 1.28 | 512k 1.88 | 756k 2.53 | 1M 3.66 | 2M 8.417 |
  3M 15.62 | 4M 22.70  (ms/frame)

For each size this sweeps (tile_multiplier, tile_cap, chunk) candidates of
the tiled pipeline, measuring ms/step (fetch-synced pipelined windows) and
the deferral rate (overflow delta per step / N — keep < 1%/step).  The
winners feed bench.py's _TILE_GEOM table.

Candidate logic: particles/tile lambda = N * t^2 / world_area; collide work
~ 9*cap^2*ntiles, relocate traffic ~ cap*ntiles, dispatch floor ~5.7ms /
chunk.  Small N wants big tiles + small cap + deep chunks.

Run: JAX_PLATFORMS=axon PYTHONPATH=$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_curve.py > /tmp/sweep_curve.log 2>&1 &
One JSONL line per measurement -> /tmp/tpu_sweep_curve.jsonl.
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 100 * 60
LOG = open("/tmp/tpu_sweep_curve.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def left() -> float:
    return DEADLINE - time.time()


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

BASELINE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
            1_000_000: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
            4_000_000: 22.70}

# (size, [(mult, cap, chunk), ...]) — ordered most-promising first
CANDIDATES = [
    (1_000_000, [(4.4, 5, 16), (4.4, 4, 16), (5.5, 5, 16), (5.5, 6, 16),
                 (4.4, 5, 32), (6.6, 8, 16)]),
    (4_000_000, [(3.3, 8, 16)]),  # known best; re-confirm
    (2_000_000, [(3.3, 6, 16), (3.3, 8, 16), (4.4, 8, 16), (3.67, 6, 16)]),
    (3_000_000, [(3.3, 8, 16), (3.3, 6, 16), (3.67, 8, 16)]),
    (100_000, [(13.2, 6, 64), (8.8, 4, 64), (17.6, 8, 64), (13.2, 8, 64),
               (8.8, 4, 32)]),
    (256_000, [(8.8, 6, 64), (6.6, 4, 64), (13.2, 8, 64), (8.8, 5, 64)]),
    (512_000, [(6.6, 5, 32), (5.5, 4, 32), (8.8, 8, 32), (6.6, 6, 64)]),
    (756_000, [(5.5, 5, 32), (4.4, 4, 32), (6.6, 6, 32), (5.5, 4, 64)]),
]


def measure(n, mult, cap, chunk):
    cfg = SimConfig(max_particles=n, initial_particles=n, pipeline="tiled",
                    tile_cap=cap, tile_multiplier=mult)
    t_build = time.time()
    eng = TiledEngine(cfg, seed=0, chunk=chunk)
    warmup = 2 * chunk
    eng.run(warmup)
    of0 = float(eng.state.overflow_count)  # fetch = sync
    build_s = time.time() - t_build
    best = float("inf")
    window = 3 * chunk
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(window)
        float(eng.state.x[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / window * 1e3)
    of1 = float(eng.state.overflow_count)
    defer_pct = (of1 - of0) / (2 * window) / n * 100.0
    del eng
    return best, defer_pct, build_s


for n, cands in CANDIDATES:
    for mult, cap, chunk in cands:
        if left() < 120:
            log(stage="deadline", skipped=f"{n}/{mult}/{cap}")
            continue
        try:
            ms, defer_pct, build_s = measure(n, mult, cap, chunk)
            log(stage="measure", n=n, mult=mult, cap=cap, chunk=chunk,
                ms_per_step=round(ms, 3), defer_pct_per_step=round(defer_pct, 3),
                vs_baseline=round(BASELINE[n] / ms, 3),
                build_s=round(build_s, 1))
        except Exception as e:
            log(stage="error", n=n, mult=mult, cap=cap,
                err=f"{type(e).__name__}: {e}"[:200],
                tb=traceback.format_exc()[-500:])

log(stage="done")
