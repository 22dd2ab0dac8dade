"""Final reference-exact GS curve + per-size storage-health locks.

Round 3's GS ladder (r-plane drop, cap narrowing, fused integrate)
was timed size-by-size in separate processes; this re-measures the
WHOLE curve at the final GS_TUNED configs in one process, with the
storage-health telemetry the 4M watchdog fire during
tpu_probe_gs_mega3 demanded:

- per 240-step window: stale-pair fraction (>= 2-tile displacement —
  the collision-missing class; a stale particle sits in the wrong
  cell's candidate set, a semantics divergence from the reference's
  rebuilt-every-frame grid), overflow delta (the reference's
  drop-past-K=6 counter — engaged semantics, not an error), watchdog
  events, per-window ms.
- dilute/mid sizes are expected stale == 0.0 exactly (occ_max < cap,
  nothing ever refused) — that LOCKS the reference-exact claim.
- 4M runs cap6 (tuned) AND cap7: if cap6 creeps (dynamic occupancy
  exceeding storage) and cap7 holds stale ~0, cap7 is the
  storage-true 4M config and its timing is the honest number.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs4m_storage.py > /tmp/probe_gs4m.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs4m.jsonl", "a", buffering=1)


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
from gpu_physics_engine_tpu.core.tuned import GS_TUNED  # noqa: E402


def gs_cfg(n, cap, match):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=8,
                     tiled_uniform_radius=True, tiled_match=match)


def curve_point(name, n, cap, windows=3, chunk=32):
    try:
        _, match = GS_TUNED(n)
        eng = TiledEngine(gs_cfg(n, cap, match), seed=0, chunk=chunk)
        best = float("inf")
        for w in range(windows):
            of0 = int(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(240)
            stale = float(eng._stale_frac(eng.state)) * 100.0
            ms = (time.perf_counter() - t0) / 240 * 1e3
            if w:  # window 0 swallows the sweep/step compiles
                best = min(best, ms)
            log(stage="window", name=name, w=w, stale_pct=round(stale, 4),
                overflow_delta=int(eng.state.overflow_count) - of0,
                wd_events=eng.watchdog_events, ms=round(ms, 3))
        log(stage="curve", name=name, n=n, cap=cap, ms=round(best, 3),
            wd_events=eng.watchdog_events)
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])


curve_point("gs_100k", 100_000, 3, chunk=64)
curve_point("gs_256k", 256_000, 4, chunk=64)
curve_point("gs_512k", 512_000, 4, chunk=64)
curve_point("gs_756k", 756_000, 4, chunk=64)
curve_point("gs_1m", 1_048_576, 4, chunk=64)
curve_point("gs_2m", 2_000_000, 5, chunk=32)
curve_point("gs_3m", 3_000_000, 6, chunk=16)
# 4M: tuned cap6 (5 windows to show the creep trajectory) then cap7
curve_point("gs_4m_cap6", 4_194_304, 6, windows=5, chunk=16)
curve_point("gs_4m_cap7", 4_194_304, 7, windows=5, chunk=16)
log(stage="done")
