"""Newton's-third-law sweep (SimConfig.tiled_newton): hardware step time
vs the standard 9-offset sweep at the production geometries.

The Newton sweep evaluates each cross-tile pair once (5*cap^2 candidate
evaluations instead of 9*cap^2) on a kernel the roofline analysis puts at
~70% of VPU peak (PERF.md) — expected win ~1.5-1.9x on the sweep if the
scatter-back pattern lowers well in Mosaic.  Measures uniform-radius
(bench parity) at the tuned 4M and 1M picks, plus a small-N hardware
correctness cross-check (interpret-mode agreement is already tested;
this catches Mosaic lowering bugs).

Run AFTER the round-2 runbook finishes (one TPU process at a time):
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_newton.py > /tmp/probe_newton.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_newton.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import numpy as np  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.core.tuned import TUNED_TILE_GEOMETRY  # noqa: E402

# --- hardware correctness cross-check at small N -------------------------
try:
    outs = {}
    for newton in (False, True):
        cfg = SimConfig(max_particles=65_536, initial_particles=65_536,
                        pipeline="tiled", tile_cap=6, tile_multiplier=3.3,
                        tiled_uniform_radius=True, tiled_newton=newton)
        eng = TiledEngine(cfg, seed=0, chunk=8)
        # short window on purpose: the two sweeps differ in f32
        # accumulation ORDER, and contact dynamics amplify the ulp seeds
        # chaotically — 8 steps keeps a REAL kernel inside the 1e-2 gate
        # (the CPU engine test needs 1e-3 after 3 steps at 256 bodies)
        # while a Mosaic lowering bug still explodes or diverges pids
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[newton] = (pid[order], np.asarray(s.x).ravel()[order],
                        np.asarray(s.y).ravel()[order])
        del eng
    same_pids = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    ok = same_pids and dx < 1e-2 and dy < 1e-2  # 32 steps of compounding
    log(stage="xcheck", n=65_536, same_pids=same_pids,
        dx=round(dx, 6), dy=round(dy, 6), ok=ok)
except Exception:
    ok = False
    log(stage="error", where="xcheck", err=traceback.format_exc()[-400:])

# --- production-geometry timings ------------------------------------------
SETTLE, WINDOW = 480, 480

for n in (4_194_304, 1_048_576):
    mult, cap, chunk, match, iv = TUNED_TILE_GEOMETRY[n]
    for newton in (False, True):
        try:
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=cap,
                            tile_multiplier=mult, tiled_match=match,
                            tiled_relocate_interval=iv,
                            tiled_uniform_radius=True,
                            tiled_newton=newton)
            eng = TiledEngine(cfg, seed=0, chunk=chunk)
            eng.run(SETTLE)
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / n * 100.0) * iv
            log(stage="step", n=n, newton=newton, ms=round(ms, 3),
                deferred_population_pct=round(defer, 3))
            del eng
        except Exception:
            log(stage="error", n=n, newton=newton,
                err=traceback.format_exc()[-400:])

log(stage="done", xcheck_ok=ok)
