"""Sweep v10: tiled_relocate_passes=2 at the fast-but-deferring configs.

Mechanism (see SimConfig.tiled_relocate_passes): matching is one-shot
within a relocate pass, so an arrival cannot take a slot vacated by a
mover leaving the same full tile this step.  At mid-size geometries the
v4-v9 sweeps found fast configs (1.4-1.7 ms at 512k vs the 1.88 ms
baseline) whose steady-state deferral sits at 2-10%/step — capacity
contention, not matching.  A second pass re-matches against
post-departure occupancy; if leaver-blocking is the dominant term, the
fast configs drop under the 1%/step quality bound for ~the cost of one
extra relocate (<0.5 ms at these sizes).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_curve10.py > /tmp/sweep_curve10.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 110 * 60
LOG = open("/tmp/tpu_sweep_curve10.jsonl", "a", buffering=1)


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

# (mult, cap, chunk, match, passes) — pass-1 references in PERF.md:
#   512k 6.6/5/128 greedy: 1.61 ms @ 3.5%;  5.5/4/64: 1.62 @ 2.2%
#   756k 5.0/4/32: 2.18 @ 3.5%;  5.5/4/64 flip-era: 1.58 @ 18%
#   1M   4.4/4/32 flip2: 2.32 @ 4.8%
#   2M   4.4/6/16 greedy: 4.74 @ 0.38% (try cap 5 with the extra pass)
CANDIDATES = [
    (512_000, [(6.6, 5, 128, "greedy", 2), (5.5, 4, 128, "greedy", 2),
               (5.5, 5, 128, "greedy", 2), (6.6, 4, 128, "greedy", 2)]),
    (756_000, [(5.0, 4, 64, "greedy", 2), (5.5, 5, 64, "greedy", 2),
               (5.5, 4, 64, "greedy", 2)]),
    (1_000_000, [(4.4, 4, 32, "greedy", 2), (4.4, 5, 32, "greedy", 2)]),
    (2_000_000, [(4.4, 5, 16, "greedy", 2)]),
    (256_000, [(12.1, 8, 128, "greedy", 2), (8.8, 6, 128, "greedy", 2)]),
]


def measure(n, mult, cap, chunk, match, passes):
    cfg = SimConfig(max_particles=n, initial_particles=n, pipeline="tiled",
                    tile_cap=cap, tile_multiplier=mult, tiled_match=match,
                    tiled_relocate_passes=passes,
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
    for mult, cap, chunk, match, passes in cands:
        if DEADLINE - time.time() < 120:
            log(stage="deadline")
            break
        try:
            ms, defer = measure(n, mult, cap, chunk, match, passes)
            log(stage="measure", n=n, mult=mult, cap=cap, chunk=chunk,
                match=match, passes=passes, ms_per_step=round(ms, 3),
                defer_pct_per_step=round(defer, 3),
                vs_baseline=round(BASELINE[n] / ms, 3))
        except Exception:
            log(stage="error", n=n, mult=mult, cap=cap,
                err=traceback.format_exc()[-400:])

log(stage="done")
