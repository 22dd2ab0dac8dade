"""32M particles on one chip: the 8x-reference-scale ceiling probe.

The reference's curve ends at 4M (README.md:80-87); round 2 measured
16M (4x world, same density) at 30.4 ms/step on one v5e.  This probes
32M in an exactly-8x world (12192x2096 = 2x the 16M world; density
class unchanged) — storage ~70M slots x 24 B ~ 1.7 GB live
(double-buffered under donation), comfortably inside 16 GB HBM.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_32m.py > /tmp/probe_32m.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_32m.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

# cap 8 OOM'd on the first attempt: a relocate-path fusion holds ~21
# full-geometry [cap, 1280, 7392] temporaries = ~6.3 GB scoped at
# cap 8 / 75.7M slots.  cap 6 cuts every full-shape buffer 25% (avg
# occupancy at this density is ~3.5/tile, so cap 6 keeps headroom);
# iv4 halves relocate-plan invocations as a second pressure release.
from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

n = 1 << 25
ATTEMPTS = [dict(tile_cap=6, tiled_relocate_interval=4),
            dict(tile_cap=6, tiled_relocate_interval=2),
            dict(tile_cap=5, tiled_relocate_interval=4)]

for extra in ATTEMPTS:
    if time.time() - T0 > 40 * 60:
        log(stage="skip", extra=extra)
        continue
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        world_width=12192.0, world_height=2096.0,
                        pipeline="tiled", tile_multiplier=3.3,
                        tiled_uniform_radius=True, tiled_newton=True,
                        **extra)
        tb = time.time()
        eng = TiledEngine(cfg, seed=0)
        eng.run(64)
        float(eng.state.x[0, 0, 0])
        log(stage="ready", n=n, extra=extra,
            compile_s=round(time.time() - tb, 1),
            slots=int(eng.state.pid.size))
        for w in range(3):
            t0 = time.perf_counter()
            eng.run(48)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / 48 * 1e3
            log(stage="window", w=w, ms=round(ms, 3),
                pps=round(n / ms * 1e3),
                defer=int(eng.state.overflow_count))
        log(stage="done")
        break
    except Exception:
        log(stage="error", extra=extra, err=traceback.format_exc()[-500:])
