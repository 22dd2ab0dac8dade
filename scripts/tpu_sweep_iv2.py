"""Interval sweep refinement: spend part of the interval=4 speed win on
+1 tile cap at the sizes whose deferral-per-relocate-event (defer_pct x
interval — the honest quality metric: the fraction of particles sitting
in a deferred state) exceeded ~1% in sweep_iv, and re-measure the two
anomalous rows (100k iv2, 756k iv2 — suspected compile leak).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_iv2.py > /tmp/sweep_iv2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_sweep_iv2.jsonl", "a", buffering=1)


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
# (n, mult, cap, chunk, match, interval)
RUNS = [
    (256_000, 12.1, 9, 128, "greedy", 4),
    (256_000, 12.1, 10, 128, "greedy", 4),
    (512_000, 6.6, 7, 128, "greedy", 4),
    (512_000, 6.6, 8, 128, "greedy", 4),
    (756_000, 4.4, 5, 32, "greedy", 4),
    (756_000, 4.4, 5, 32, "greedy", 2),
    (1_048_576, 4.4, 6, 32, "greedy", 4),
    (4_194_304, 3.3, 7, 16, "greedy", 2),
    (4_194_304, 3.3, 7, 16, "greedy", 4),
    (4_194_304, 3.3, 8, 16, "greedy", 4),
    (100_000, 22.0, 8, 128, "greedy", 2),   # anomaly re-measure
    (3_000_000, 3.3, 6, 16, "greedy", 2),
    (3_000_000, 3.3, 6, 16, "greedy", 4),
    (3_000_000, 3.3, 7, 16, "greedy", 4),
]
SETTLE, WINDOW = 480, 480

uniform_ok = True  # flipped off for the rest of the sweep on failure

for n, mult, cap, chunk, match, iv in RUNS:
    try:
        # tiled_uniform_radius matches bench.py's production configs —
        # sweeping the general kernel would rank caps/intervals on a
        # ~30%-heavier sweep phase than the one production runs.  The
        # kernel is new this round: if it fails on hardware, fall back
        # to the general kernel for the remaining runs (logged).
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match=match,
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=uniform_ok)
        try:
            eng = TiledEngine(cfg, seed=0, chunk=chunk)
            eng.run(SETTLE)
        except Exception:
            if not uniform_ok:
                raise
            log(stage="uniform_fallback", n=n,
                err=traceback.format_exc()[-200:])
            uniform_ok = False
            cfg = cfg.replace(tiled_uniform_radius=False)
            eng = TiledEngine(cfg, seed=0, chunk=chunk)
            eng.run(SETTLE)
        of0 = float(eng.state.overflow_count)
        t0 = time.perf_counter()
        eng.run(WINDOW)
        float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / WINDOW * 1e3
        defer = ((float(eng.state.overflow_count) - of0)
                 / WINDOW / n * 100)
        log(stage="iv2", n=n, mult=mult, cap=cap, chunk=chunk, interval=iv,
            uniform=bool(cfg.tiled_uniform_radius),
            ms_per_step=round(ms, 3), defer_pct=round(defer, 3),
            defer_per_event=round(defer * iv, 3),
            vs_baseline=round(BASELINE[n] / ms, 3))
        del eng
    except Exception:
        log(stage="error", where=f"{n}_c{cap}_iv{iv}",
            err=traceback.format_exc()[-400:])

log(stage="done")
