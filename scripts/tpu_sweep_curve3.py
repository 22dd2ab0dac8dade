"""Curve sweep v3: the v2 winners re-measured with GREEDY slot matching.

v2 showed flip matching's contention deferral at steady state (3-20%/step
on coarse-tile configs) — far over the 1%/step physics-quality bound —
while the raw speed beat baseline everywhere.  Greedy matching
(tiled_match) gives every free slot every unclaimed mover; this sweep
quantifies its deferral fix + compute cost per config.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_curve3.py > /tmp/sweep_curve3.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 110 * 60
LOG = open("/tmp/tpu_sweep_curve3.jsonl", "a", buffering=1)


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

# v2 speed winners + one safety candidate per size, now with greedy match
CANDIDATES = [
    (1_000_000, [(5.5, 5, 32), (5.5, 6, 32), (4.4, 5, 32)]),
    (756_000, [(6.6, 6, 32), (5.5, 5, 32), (5.5, 6, 32)]),
    (512_000, [(6.6, 5, 64), (6.6, 6, 64), (8.8, 8, 64)]),
    (256_000, [(13.2, 8, 64), (8.8, 5, 64), (8.8, 6, 64)]),
    (100_000, [(13.2, 6, 64), (17.6, 8, 64)]),
    (2_000_000, [(3.67, 6, 16), (4.4, 8, 16)]),
    (3_000_000, [(3.3, 6, 16)]),
    # 4M: cap6 was 6.1ms at 5.8% defer under flip; greedy is auto-off at
    # this grid size, so force it to see if it rescues the quality
    (4_000_000, [(3.3, 6, 16, "greedy"), (3.3, 8, 16, "flip")]),
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
    for cand in cands:
        mult, cap, chunk = cand[:3]
        match = cand[3] if len(cand) > 3 else "auto"
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
