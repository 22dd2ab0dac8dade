"""Bisect the 4M storage-jam avalanche (scripts/tpu_probe_cap_stability.py:
every (cap, interval) tried grows without bound; cap10/iv4 jams FASTER
than cap8/iv2).

Four discriminating runs at 4M cap8:
  A. iv2, sweep every 60   — if stable: sweep frequency/efficacy is the lever
  B. iv1, sweep every 240  — if stable: the relocate INTERVAL drives nucleation
  C. iv2, hysteresis off   — if stable: the hysteresis band seeds the jam
  D. claim relocate EVERY step (tiled_relocate="jnp", no pull at all) —
     if THIS still grows, the jam is scene physics (overpacked occupancy),
     not pull-relocate dynamics.  ~45 ms/step: diagnostic only.

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_jam_bisect.py > /tmp/probe_bisect.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_bisect.jsonl", "a", buffering=1)


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

RUNS = [
    ("A_sweep60", dict(tiled_relocate_interval=2, sort_interval_steps=60)),
    ("B_iv1", dict(tiled_relocate_interval=1)),
    ("C_nohyst", dict(tiled_relocate_interval=2, tiled_hysteresis=0.0)),
    ("D_claim", dict(tiled_relocate="jnp", tiled_relocate_interval=1)),
]

for name, kw in RUNS:
    try:
        cfg = SimConfig(max_particles=N, initial_particles=N,
                        pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                        tiled_match="greedy", tiled_uniform_radius=True,
                        tiled_newton=True, **kw)
        eng = TiledEngine(cfg, seed=0, chunk=16)
        iv = max(1, cfg.tiled_relocate_interval)
        nwin = 6 if name == "D_claim" else 12
        for w in range(nwin):
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / N * 100.0) * iv
            log(stage="window", run=name, w=w, ms=round(ms, 3),
                defer_pop_pct=round(defer, 3))
            if defer > 25.0:
                log(stage="abort", run=name, reason="jammed")
                break
        del eng
    except Exception:
        log(stage="error", run=name, err=traceback.format_exc()[-400:])

log(stage="done")
