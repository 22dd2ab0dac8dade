"""Uniform-radius sweep specialization: hardware step time vs the
general kernel at the production geometries (4M and 1M picks).

Run AFTER the round-2 runbook finishes (one TPU process at a time):
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_uniform.py > /tmp/probe_uniform.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_uniform.jsonl", "a", buffering=1)


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
from gpu_physics_engine_tpu.core.tuned import TUNED_TILE_GEOMETRY  # noqa: E402

SETTLE, WINDOW = 480, 480

for n in (4_194_304, 1_048_576):
    mult, cap, chunk, match, iv = TUNED_TILE_GEOMETRY[n]
    for uniform in (False, True):
        try:
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=cap,
                            tile_multiplier=mult, tiled_match=match,
                            tiled_relocate_interval=iv,
                            tiled_uniform_radius=uniform)
            eng = TiledEngine(cfg, seed=0, chunk=chunk)
            eng.run(SETTLE)
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / n * 100.0) * iv
            log(stage="step", n=n, uniform=uniform, ms=round(ms, 3),
                deferred_population_pct=round(defer, 3))
            del eng
        except Exception:
            log(stage="error", n=n, uniform=uniform,
                err=traceback.format_exc()[-400:])

log(stage="done")
