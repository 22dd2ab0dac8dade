"""Sweep v9: last 512k-1M candidates on the lambda/cap ~ 0.3 quality line.

flip2 (two-rule matching) should land between flip (fast, 3-20%/step
contention deferral) and greedy (near-zero deferral, +0.25-0.8 ms) —
the v4 numbers showed greedy's overhead eats the thin 256k-1M margins.

GS stage: the reference-semantics Gauss-Seidel solver (tiled_solver="gs",
tiles = cells at multiplier 2.2) measured end-to-end at 1M — the VERDICT
round-1 item 2 target is <= ~2x the production tiled step (~3 ms).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_curve9.py > /tmp/sweep_curve9.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 110 * 60
LOG = open("/tmp/tpu_sweep_curve9.jsonl", "a", buffering=1)


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
    (512_000, [(5.5, 4, 64, "greedy"), (8.8, 7, 64, "greedy"),
               (7.7, 7, 128, "greedy"), (6.6, 5, 128, "greedy")]),
    (756_000, [(4.4, 4, 32, "greedy"), (6.6, 7, 64, "greedy"),
               (5.0, 4, 32, "greedy")]),
    (1_000_000, [(5.5, 7, 32, "greedy"), (5.0, 5, 32, "greedy"),
                 (4.4, 4, 32, "flip2")]),
]


def measure(n, mult, cap, chunk, match):
    cfg = SimConfig(max_particles=n, initial_particles=n, pipeline="tiled",
                    tile_cap=cap, tile_multiplier=mult, tiled_match=match,
                    sort_interval_steps=1_000_000)
    eng = TiledEngine(cfg, seed=0, chunk=chunk)
    warm = max(400, 2 * chunk)
    warm -= warm % chunk
    eng.run(warm)
    of0 = float(eng.state.overflow_count)
    best = float("inf")
    window = 3 * chunk
    total = 0
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(window)
        float(eng.state.x[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / window * 1e3)
        total += window
    of1 = float(eng.state.overflow_count)
    del eng
    return best, (of1 - of0) / total / n * 100.0


for n, cands in CANDIDATES:
    for mult, cap, chunk, match in cands:
        if DEADLINE - time.time() < 120:
            log(stage="deadline", skipped=f"{n}/{mult}/{cap}")
            continue
        try:
            ms, defer_pct = measure(n, mult, cap, chunk, match)
            log(stage="measure", n=n, mult=mult, cap=cap, chunk=chunk,
                match=match, ms_per_step=round(ms, 3),
                defer_pct_per_step=round(defer_pct, 3),
                vs_baseline=round(BASELINE[n] / ms, 3))
        except Exception as e:
            log(stage="error", n=n, mult=mult, cap=cap,
                err=f"{type(e).__name__}: {e}"[:200],
                tb=traceback.format_exc()[-400:])

log(stage="done")
