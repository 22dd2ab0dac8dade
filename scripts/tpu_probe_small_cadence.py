"""Small-size stabilization, take 2: UNFILTERED exact sweep at short
cadence (the mechanism that plateaued the 4M hysteresis config at
0.40%% in tpu_probe_jam_bisect.py run A).

The first mitigation round (tpu_probe_small_horizon.py) ran with a
hysteresis-FILTERED sweep that left dancers accumulating — cadence 60
didn't stabilize.  The engine sweep is now exact again; this probe
re-runs the small-size picks at cadence 60/120 plus the +1-cap rung,
12 x 480-step windows.

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_small_cadence.py > /tmp/probe_smallc.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_smallc.jsonl", "a", buffering=1)


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

BASELINE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53}
WINDOW = 480

# (n, mult, cap, chunk, iv, sweep_cadence)
RUNS = [
    (100_000, 22.0, 8, 128, 2, 60),
    (100_000, 22.0, 8, 128, 2, 120),
    (256_000, 12.1, 9, 128, 2, 60),
    (256_000, 12.1, 9, 128, 2, 120),
    (512_000, 6.6, 7, 128, 4, 60),
    (512_000, 6.6, 7, 128, 4, 120),
    (756_000, 4.4, 5, 32, 4, 120),
    # +1 cap rungs in case cadence alone is not enough
    (100_000, 22.0, 9, 128, 2, 60),
    (256_000, 12.1, 10, 128, 2, 60),
    (512_000, 6.6, 8, 128, 4, 60),
]

for n, mult, cap, chunk, iv, cadence in RUNS:
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match="greedy",
                        tiled_relocate_interval=iv,
                        sort_interval_steps=cadence,
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
                     / WINDOW / n * 100.0) * iv
            worst = max(worst, defer) if w else defer
            last = defer
            log(stage="window", n=n, cap=cap, cadence=cadence, w=w,
                ms=round(ms, 3), defer_pop_pct=round(defer, 3))
            if defer > 25.0:
                log(stage="abort", n=n, cap=cap, cadence=cadence,
                    reason="jammed")
                break
        log(stage="config_done", n=n, mult=mult, cap=cap, interval=iv,
            cadence=cadence, worst_defer=round(worst, 3),
            last_defer=round(last, 3), best_ms=round(best_ms, 3),
            vs_baseline=round(BASELINE[n] / best_ms, 3))
        del eng
    except Exception:
        log(stage="error", n=n, cap=cap, cadence=cadence,
            err=traceback.format_exc()[-400:])

log(stage="done")
