"""Re-measure of stall-corrupted / borderline iv2-sweep rows.

The round-2 refinement sweep (tpu_sweep_iv2.py) lost 4 rows to one-off
~8-10 s runtime stalls inside the single 480-step timed window (each
read ~21.5 ms/step regardless of size).  This script re-measures the
rows that could change a TUNED_TILE_GEOMETRY pick, with TWO independent
480-step windows per config and the min taken (the same defense
bench.py now uses); deferral is accumulated across both windows.

Run AFTER the runbook finishes (one TPU process at a time):
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_sweep_iv4.py > /tmp/sweep_iv4.log 2>&1 &

Digest: rows log stage="iv2" so scripts/apply_iv2.py picks them up
(pass /tmp/tpu_sweep_iv4.jsonl as an extra file).
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_sweep_iv4.jsonl", "a", buffering=1)


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
# (n, mult, cap, chunk, match, interval) — all under tiled_newton
# (hardware-verified winner, scripts/tpu_probe_newton.py)
RUNS = [
    # stall-corrupted in iv2 AND iv3 (rows read ~21.5 ms at any size =
    # a one-off ~10 s runtime stall in the single timed window); the
    # deferral columns were valid and UNDER bound — honest ms decides
    # the 756k / 100k picks
    (756_000, 4.4, 5, 32, "greedy", 4),
    (100_000, 22.0, 8, 128, "greedy", 4),
    # 4M deferral-growth check: bench measured 3.8% deferred population
    # over 960 steps at this config vs 1.2% over the sweeps' 480 —
    # per-window defer below separates drift from a one-off
    (4_194_304, 3.3, 6, 16, "greedy", 2),
    # the clean-quality 4M pick (iv3: 5.025 ms, 0.18%) — confirm
    (4_194_304, 3.3, 7, 16, "greedy", 2),
    # quality-safety alternative for the borderline 512k pick
    # (cap7/iv4 = 1.06% deferred population)
    (512_000, 6.6, 7, 128, "greedy", 2),
]
SETTLE, WINDOW = 480, 480

for n, mult, cap, chunk, match, iv in RUNS:
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match=match,
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        eng.run(SETTLE)
        ms = float("inf")
        defers = []
        for _ in range(2):
            of0 = float(eng.state.overflow_count)  # fetch = sync
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
            defers.append((float(eng.state.overflow_count) - of0)
                          / WINDOW / n * 100.0 * iv)
        log(stage="iv2", n=n, mult=mult, cap=cap, chunk=chunk,
            match=match, interval=iv, uniform=True, newton=True,
            ms_per_step=round(ms, 3),
            defer_pct=round(sum(defers) / 2 / iv, 3),
            defer_per_event=round(sum(defers) / 2, 3),
            defer_w1=round(defers[0], 3), defer_w2=round(defers[1], 3),
            vs_baseline=round(BASELINE[n] / ms, 3))
        del eng
    except Exception:
        log(stage="error", n=n, cap=cap, interval=iv,
            err=traceback.format_exc()[-400:])

log(stage="done")
