"""4M stability x speed under the hysteresis-FILTERED cheap exact sweep.

tpu_probe_jam_bisect.py run A proved sweep-every-60 keeps 4M stable
(deferred population plateaus ~0.4% vs unbounded growth at the default
240-cadence), but the unfiltered 524k-budget claim sweep costs ~270 ms
-> 12.1 ms/step.  The filtered sweep (ops/tiled.relocate delta=
hysteresis_delta) only handles the genuinely displaced population, so
it can run at short cadence cheaply.  This probe maps (cap, cadence)
-> (ms/step, long-horizon deferral) to pick the final 4M config.

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_sweep_cadence.py > /tmp/probe_cadence.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_cadence.jsonl", "a", buffering=1)


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
BASE = 22.70

RUNS = [
    (6, 2, 60),
    (6, 2, 120),
    (7, 2, 120),
    (8, 2, 120),
]

for cap, iv, cadence in RUNS:
    try:
        cfg = SimConfig(max_particles=N, initial_particles=N,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=3.3, tiled_match="greedy",
                        tiled_relocate_interval=iv,
                        sort_interval_steps=cadence,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=16)
        worst = last = 0.0
        for w in range(12):
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / N * 100.0) * iv
            worst = max(worst, defer)
            last = defer
            log(stage="window", cap=cap, cadence=cadence, w=w,
                ms=round(ms, 3), defer_pop_pct=round(defer, 3))
            if defer > 25.0:
                log(stage="abort", cap=cap, cadence=cadence,
                    reason="jammed")
                break
        log(stage="config_done", cap=cap, interval=iv, cadence=cadence,
            worst_defer=round(worst, 3), last_defer=round(last, 3),
            last_ms=round(ms, 3), vs_baseline=round(BASE / ms, 3))
        del eng
    except Exception:
        log(stage="error", cap=cap, cadence=cadence,
            err=traceback.format_exc()[-400:])

log(stage="done")
