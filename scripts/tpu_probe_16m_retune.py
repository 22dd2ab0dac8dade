"""16M retune: the scale row predates two later lessons.

The incumbent 16M row (26.15 ms) runs cap8 + relocate-interval 1 in a
6096x2096 world — tuned in round 2, BEFORE the relocate-interval
sweep ("the mid-curve fix: 25-40% at every size") and before the
round-5 squarer-world discovery.  32M (twice the particles) now runs
18.6 ms at cap6/iv4 in a square-ish world.  Sweep the obvious grid:

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_16m_retune.py > /tmp/probe_16m_retune.log 2>&1 &
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

T0 = time.time()
LOG = open("/tmp/tpu_probe_16m_retune.jsonl", "a", buffering=1)


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

n = 1 << 24
# (name, world, cap, iv)
RUNS = [
    ("wide_cap8_iv1", (6096.0, 2096.0), 8, 1),   # incumbent control
    ("wide_cap6_iv4", (6096.0, 2096.0), 6, 4),
    ("square_cap6_iv4", (4310.0, 2965.0), 6, 4),  # 4x area, ~sqrt aspect
    ("square_cap6_iv2", (4310.0, 2965.0), 6, 2),
]

for name, (w, h), cap, iv in RUNS:
    if time.time() - T0 > 35 * 60:
        log(stage="skip", name=name)
        continue
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        world_width=w, world_height=h,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=3.3, tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0)
        eng.run(64)
        float(eng.state.x[0, 0, 0])
        of_prev = int(eng.state.overflow_count)
        best = float("inf")
        for wi in range(3):
            t0 = time.perf_counter()
            eng.run(48)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / 48 * 1e3
            best = min(best, ms)
            of = int(eng.state.overflow_count)
            log(stage="window", name=name, w=wi, ms=round(ms, 3),
                defer_pop_pct=round((of - of_prev) / 48 / n * 100 * iv, 3))
            of_prev = of
        log(stage="health", name=name, ms=round(best, 3),
            pps=round(n / best * 1e3))
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])

log(stage="done")
