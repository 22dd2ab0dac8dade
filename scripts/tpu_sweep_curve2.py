"""Curve sweep v2: steady-state numbers for the mid sizes.

v1 (tpu_sweep_curve.py) findings:
  * deferral measured right after init is settling-phase churn (random
    uniform scenes overlap; movers churn for ~100-300 steps) — v2 warms
    up 400 steps before measuring.
  * the engine's forced claim-relocate sweep (every 240 steps) compiled
    INSIDE a timed window for chunk-32/64 configs, wrecking several 512k
    rows — v2 disables it (sort_interval_steps huge) and bench.py will
    account for it amortized.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_curve2.py > /tmp/sweep_curve2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 110 * 60
LOG = open("/tmp/tpu_sweep_curve2.jsonl", "a", buffering=1)


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

BASELINE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
            1_000_000: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
            4_000_000: 22.70}

CANDIDATES = [
    # confirm winners with settled deferral
    (1_000_000, [(5.5, 6, 32), (4.4, 5, 32), (5.5, 5, 32), (4.4, 6, 32)]),
    (756_000, [(5.5, 5, 32), (5.5, 6, 32), (4.4, 5, 32), (6.6, 6, 32)]),
    (512_000, [(6.6, 6, 64), (6.6, 5, 64), (8.8, 8, 64), (5.5, 5, 64)]),
    (256_000, [(8.8, 6, 64), (13.2, 8, 64), (8.8, 5, 64), (11.0, 8, 64)]),
    (100_000, [(13.2, 6, 64), (17.6, 8, 64), (13.2, 8, 64)]),
    (2_000_000, [(4.4, 8, 16), (3.67, 6, 16)]),
    (3_000_000, [(3.3, 6, 16)]),
    (4_000_000, [(3.3, 8, 16), (3.3, 6, 16)]),
]


def measure(n, mult, cap, chunk):
    cfg = SimConfig(max_particles=n, initial_particles=n, pipeline="tiled",
                    tile_cap=cap, tile_multiplier=mult,
                    sort_interval_steps=1_000_000)
    eng = TiledEngine(cfg, seed=0, chunk=chunk)
    warm = max(400, 2 * chunk)
    warm -= warm % chunk
    eng.run(warm)
    of0 = float(eng.state.overflow_count)
    best = float("inf")
    window = 3 * chunk
    total_steps = 0
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(window)
        float(eng.state.x[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / window * 1e3)
        total_steps += window
    of1 = float(eng.state.overflow_count)
    defer_pct = (of1 - of0) / total_steps / n * 100.0
    del eng
    return best, defer_pct


for n, cands in CANDIDATES:
    for mult, cap, chunk in cands:
        if DEADLINE - time.time() < 120:
            log(stage="deadline", skipped=f"{n}/{mult}/{cap}")
            continue
        try:
            ms, defer_pct = measure(n, mult, cap, chunk)
            log(stage="measure", n=n, mult=mult, cap=cap, chunk=chunk,
                ms_per_step=round(ms, 3),
                defer_pct_per_step=round(defer_pct, 3),
                vs_baseline=round(BASELINE[n] / ms, 3))
        except Exception as e:
            log(stage="error", n=n, mult=mult, cap=cap,
                err=f"{type(e).__name__}: {e}"[:200],
                tb=traceback.format_exc()[-400:])

log(stage="done")
