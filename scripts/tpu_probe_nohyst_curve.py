"""Full size curve WITHOUT relocate hysteresis (tiled_hysteresis=0).

tpu_probe_jam_bisect.py: at 4M/cap8, hysteresis OFF is long-horizon
stable at 0.006%%/step deferred population (vs unbounded avalanche with
the default hysteresis band) at the same step time — the band
population's off-home storage inflates tile-occupancy variance until
the storage jam nucleates.  This probe re-measures every tuned size
without hysteresis to pick final production rows (12 windows at 4M,
6 elsewhere).

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_nohyst_curve.py > /tmp/probe_nohyst.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_nohyst.jsonl", "a", buffering=1)


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
            1_048_576: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
            4_194_304: 22.70}
WINDOW = 480

# (n, mult, cap, chunk, iv, windows)
RUNS = [
    (4_194_304, 3.3, 6, 16, 2, 12),
    (4_194_304, 3.3, 7, 16, 2, 12),
    (2_000_000, 4.4, 6, 16, 4, 6),
    (3_000_000, 3.3, 6, 16, 4, 6),
    (1_048_576, 4.4, 6, 32, 4, 6),
    (756_000, 4.4, 5, 32, 4, 6),
    (512_000, 6.6, 7, 128, 4, 6),
    (256_000, 12.1, 9, 128, 2, 6),
    (100_000, 22.0, 8, 128, 2, 6),
]

for n, mult, cap, chunk, iv, nwin in RUNS:
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match="greedy",
                        tiled_relocate_interval=iv, tiled_hysteresis=0.0,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        worst = last = ms = 0.0
        best_ms = float("inf")
        for w in range(nwin):
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
            log(stage="window", n=n, cap=cap, interval=iv, w=w,
                ms=round(ms, 3), defer_pop_pct=round(defer, 3))
            if defer > 25.0:
                log(stage="abort", n=n, cap=cap, reason="jammed")
                break
        log(stage="config_done", n=n, cap=cap, interval=iv,
            worst_defer=round(worst, 3), last_defer=round(last, 3),
            best_ms=round(best_ms, 3),
            vs_baseline=round(BASELINE[n] / best_ms, 3))
        del eng
    except Exception:
        log(stage="error", n=n, cap=cap,
            err=traceback.format_exc()[-400:])

log(stage="done")
