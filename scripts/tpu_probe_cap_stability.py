"""Long-horizon storage-stability sweep: deferred population over 12 x
480-step windows vs tile_cap, at the dense sizes.

Background (scripts/tpu_probe_4m_horizon.py + /tmp/tpu_probe_4mh*.jsonl):
at 4M (98.5% area fill) the low-cap speed picks are UNSTABLE — deferred
movers' slots block other movers, displaced particles lose their true
pair sets, the locally-missing collisions let density over-compact, and
the storage jam avalanches (deferred population 1% -> 74% over 5760
steps; v_mean decays — the physics goes quiet, not hot).  A bigger
exact-sweep buffer does NOT fix it: in a jam the movers' home tiles are
full of OTHER displaced particles.  Round-1 short-horizon data showed
cap16 settling at 0.15%/step — this sweep finds the cheapest cap where
the avalanche never nucleates, per size.

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_cap_stability.py > /tmp/probe_capstab.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_capstab.jsonl", "a", buffering=1)


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

BASELINE = {1_048_576: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
            4_194_304: 22.70}
WINDOW = 480

# (n, mult, cap, chunk, iv): the 4M cap ladder, plus long-horizon checks
# of the adopted mid-size picks (their fills are 6-18x lower; expect
# stable, but verify)
RUNS = [
    (4_194_304, 3.3, 8, 16, 2),
    (4_194_304, 3.3, 10, 16, 4),
    (4_194_304, 3.3, 12, 16, 4),
    (1_048_576, 4.4, 6, 32, 4),
    (2_000_000, 4.4, 6, 16, 4),
    (3_000_000, 3.3, 6, 16, 4),
]

for n, mult, cap, chunk, iv in RUNS:
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match="greedy",
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        worst = 0.0
        for w in range(12):
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / n * 100.0) * iv
            worst = max(worst, defer)
            log(stage="window", n=n, cap=cap, interval=iv, w=w,
                ms=round(ms, 3), defer_pop_pct=round(defer, 3))
            if defer > 20.0:
                log(stage="abort", n=n, cap=cap, reason="jammed")
                break
        log(stage="config_done", n=n, cap=cap, interval=iv,
            worst_defer=round(worst, 3),
            vs_baseline=round(BASELINE[n] / ms, 3), last_ms=round(ms, 3))
        del eng
    except Exception:
        log(stage="error", n=n, cap=cap, err=traceback.format_exc()[-400:])

log(stage="done")
